import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavemamba_tpu.ops.arch_util import flow_warp, trunc_normal
from wavemamba_tpu.ops.diffjpeg import diff_jpeg
from wavemamba_tpu.utils.img_process_util import filter2d, usm_sharp


def test_diffjpeg_quality_monotone_and_close_to_cv2():
    rs = np.random.RandomState(0)
    img = rs.rand(1, 64, 64, 3).astype(np.float32)
    out95 = np.asarray(diff_jpeg(jnp.asarray(img), 95))
    out10 = np.asarray(diff_jpeg(jnp.asarray(img), 10))
    err95 = np.abs(out95 - img).mean()
    err10 = np.abs(out10 - img).mean()
    assert err95 < err10  # lower quality distorts more
    # vs real cv2 JPEG at quality 50
    u8 = (img[0, :, :, ::-1] * 255).round().astype(np.uint8)  # BGR for cv2
    ok, enc = cv2.imencode(".jpg", u8, [cv2.IMWRITE_JPEG_QUALITY, 50])
    dec = cv2.imdecode(enc, cv2.IMREAD_COLOR)[:, :, ::-1].astype(np.float32) / 255.0
    ours = np.asarray(diff_jpeg(jnp.asarray(img), 50))[0]
    # both should be similar distortions of the source
    assert np.abs(ours - dec).mean() < 0.9 * np.abs(img[0] - dec).mean() + 0.02


def test_diffjpeg_differentiable():
    rs = np.random.RandomState(1)
    img = jnp.asarray(rs.rand(1, 16, 16, 3), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(diff_jpeg(x, 50) ** 2))(img)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_flow_warp_identity_and_shift():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.rand(1, 8, 10, 2), jnp.float32)
    zero = jnp.zeros((1, 8, 10, 2))
    np.testing.assert_allclose(np.asarray(flow_warp(x, zero)), np.asarray(x), atol=1e-6)
    # flow dx=+1 samples from the right neighbour
    dx = zero.at[..., 0].set(1.0)
    out = np.asarray(flow_warp(x, dx))
    np.testing.assert_allclose(out[:, :, :-1], np.asarray(x)[:, :, 1:], atol=1e-6)


def test_filter2d_matches_cv2():
    rs = np.random.RandomState(3)
    img = rs.rand(6, 7, 3).astype(np.float32)
    k = rs.rand(5, 5).astype(np.float32)
    k /= k.sum()
    ours = np.asarray(filter2d(jnp.asarray(img[None]), jnp.asarray(k)))[0]
    ref = cv2.filter2D(img, -1, k, borderType=cv2.BORDER_CONSTANT)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_usm_sharp_runs():
    rs = np.random.RandomState(4)
    img = rs.rand(32, 32, 3).astype(np.float32)
    out = usm_sharp(img)
    assert out.shape == img.shape
    assert np.isfinite(out).all()


def test_trunc_normal_bounds():
    x = trunc_normal(jax.random.PRNGKey(0), (10000,), std=0.5)
    assert float(x.min()) >= -2.0 and float(x.max()) <= 2.0
    assert abs(float(x.mean())) < 0.05


def test_tiled_apply_identity():
    from wavemamba_tpu.models.tiling import tiled_apply

    rs = np.random.RandomState(5)
    img = rs.rand(1, 100, 130, 3).astype(np.float32)
    out = tiled_apply(lambda x: x, img, tile_size=48, tile_pad=8, pad_multiple=8)
    np.testing.assert_allclose(out, img, atol=1e-7)


def test_tiled_apply_matches_whole_for_local_op():
    """A conv-like local op (3x3 blur) must be seam-free under tiling."""
    from wavemamba_tpu.models.tiling import tiled_apply

    k = jnp.ones((3, 3, 1, 3), jnp.float32) / 9.0

    def blur(x):
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn, feature_group_count=3
        )

    rs = np.random.RandomState(6)
    img = rs.rand(1, 64, 80, 3).astype(np.float32)
    whole = np.asarray(blur(jnp.asarray(img)))
    tiled = tiled_apply(lambda x: np.asarray(blur(jnp.asarray(x))), img,
                        tile_size=32, tile_pad=4, pad_multiple=4)
    # interior matches exactly; borders differ only where the whole-image
    # conv saw zero-padding but tiles saw reflected context
    np.testing.assert_allclose(tiled[:, 2:-2, 2:-2], whole[:, 2:-2, 2:-2], atol=1e-6)


def test_conv1x1_dot_lowering_matches():
    """Reduced-precision 1x1 convs lower to a token matmul (ops/nn.py);
    must match the conv lowering to bf16 rounding."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from wavemamba_tpu.ops.nn import conv2d, init_conv2d

    x = jnp.asarray(np.random.RandomState(1).rand(2, 8, 10, 16), jnp.float32)
    p = init_conv2d(jax.random.PRNGKey(2), 1, 1, 16, 24)
    ref = conv2d(p, x)  # float32: conv lowering (bit-parity path)
    out = conv2d(p, x.astype(jnp.bfloat16)).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.02)
    # strided/grouped/3x3 cases keep the conv path
    p3 = init_conv2d(jax.random.PRNGKey(3), 3, 3, 16, 16, groups=16)
    y = conv2d(p3, x.astype(jnp.bfloat16), padding=1, groups=16)
    assert y.shape == x.shape


@pytest.mark.slow  # compile-heavy; full tier
def test_conv1x1_as_conv_region_policy_matches():
    """`WaveMambaConfig.conv1x1_as_conv` re-expresses a region's 1x1 convs in
    conv layout (layout experiment, scripts/tpu_1x1_sweep.py) — the model
    output must be identical to the matmul lowering."""
    import jax
    import jax.numpy as jnp

    from wavemamba_tpu.models.wavemamba import (
        WaveMambaConfig,
        init_wavemamba,
        wavemamba_apply,
    )

    cfg0 = WaveMambaConfig.fast_xla()
    cfg1 = WaveMambaConfig.fast_xla(conv1x1_as_conv=("ffn", "hfe"))
    p = init_wavemamba(jax.random.PRNGKey(0), cfg0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
    y0 = wavemamba_apply(p, cfg0, x)
    y1 = wavemamba_apply(p, cfg1, x)
    assert float(jnp.max(jnp.abs(y0 - y1))) < 2e-2
