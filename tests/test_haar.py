import jax
import jax.numpy as jnp
import numpy as np

from wavemamba_tpu.ops.haar import dwt2, iwt2, iwt2_cat


def test_roundtrip_exact():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 12, 5))
    ll, hl, lh, hh = dwt2(x)
    rec = iwt2(ll, hl, lh, hh)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), rtol=0, atol=1e-6)


def test_cat_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 3))
    ll, hl, lh, hh = dwt2(x)
    rec = iwt2_cat(jnp.concatenate([ll, hl, lh, hh], axis=-1))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), rtol=0, atol=1e-6)


def test_subband_values_constant_image():
    x = jnp.full((1, 4, 4, 1), 3.0)
    ll, hl, lh, hh = dwt2(x)
    # 4 * (3/2) = 6 in LL; details vanish.
    np.testing.assert_allclose(np.asarray(ll), 6.0)
    np.testing.assert_allclose(np.asarray(hl), 0.0)
    np.testing.assert_allclose(np.asarray(lh), 0.0)
    np.testing.assert_allclose(np.asarray(hh), 0.0)


def test_matches_reference_dwt():
    """Compare against the reference torch dwt_init/iwt_init (test oracle)."""
    from tests import torch_oracle as oracle
    import pytest

    if not oracle.reference_available():
        pytest.skip("reference repo not mounted")
    import torch

    ref = oracle.load_reference_arch()
    x = np.random.RandomState(0).randn(2, 6, 8, 10).astype(np.float32)  # NCHW
    tll, thl, tlh, thh = ref.dwt_init(torch.from_numpy(x))
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    ll, hl, lh, hh = dwt2(x_nhwc)
    for mine, theirs in [(ll, tll), (hl, thl), (lh, tlh), (hh, thh)]:
        np.testing.assert_allclose(
            np.transpose(np.asarray(mine), (0, 3, 1, 2)), theirs.numpy(), atol=1e-6
        )
    # inverse parity
    trec = ref.iwt_init(torch.cat([tll, thl, tlh, thh], dim=1)).numpy()
    rec = iwt2_cat(jnp.concatenate([ll, hl, lh, hh], axis=-1))
    np.testing.assert_allclose(np.transpose(np.asarray(rec), (0, 3, 1, 2)), trec, atol=1e-6)


def test_dwt2_conv_matches_slicing():
    """MXU-conv formulation of the Haar DWT == the parity-slicing reference
    (used by reduced-precision paths; see ops/haar.py:dwt2_conv)."""
    import numpy as np
    from wavemamba_tpu.ops.haar import dwt2, dwt2_conv

    x = jnp.asarray(np.random.RandomState(3).rand(2, 24, 16, 7), jnp.float32)
    for a, b in zip(dwt2(x), dwt2_conv(x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_ps_down_fused_matches_unshuffle():
    import numpy as np
    import jax
    from wavemamba_tpu.models.wavemamba import _ps_down
    from wavemamba_tpu.ops.nn import conv2d, init_conv2d, pixel_unshuffle

    x = jnp.asarray(np.random.RandomState(4).rand(1, 32, 24, 3), jnp.float32)
    for r in (2, 4, 8):
        p = init_conv2d(jax.random.PRNGKey(r), 1, 1, 3 * r * r, 16)
        a = conv2d(p, pixel_unshuffle(x, r))
        b = _ps_down(p, x, r)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
