"""Fused conv-chain Pallas kernels (interpret mode) vs the XLA composition
they replace — every chain wrapper, odd sizes (halo/tiling edges), and the
model-level equivalence of the conv_impl='fused' path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full tier: pytest -m ""

from wavemamba_tpu.experimental import conv_fused as cf
from wavemamba_tpu.ops.nn import conv2d, gelu, init_conv2d, silu


def _x(shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(*shape), jnp.float32)


TOL = dict(rtol=2e-2, atol=2e-2)  # bf16 MXU dots inside the kernel


@pytest.mark.parametrize("hw", [(16, 128), (17, 130), (40, 48), (8, 8)])
def test_ffn_chain(hw):
    from wavemamba_tpu.models.wavemamba import ffn_apply, init_ffn

    h, w = hw
    p = init_ffn(jax.random.PRNGKey(0), 8)
    x = _x((1, h, w, 8))
    ref = ffn_apply(p, x)
    got = cf.ffn_chain(p, x, )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **TOL)


def test_qkv_chain():
    p = {
        "qkv": init_conv2d(jax.random.PRNGKey(0), 1, 1, 8, 24),
        "qkv_dwconv": init_conv2d(jax.random.PRNGKey(1), 3, 3, 24, 24, groups=24),
    }
    x = _x((2, 20, 24, 8))
    ref = conv2d(p["qkv_dwconv"], conv2d(p["qkv"], x), padding=1, groups=24)
    got = cf.qkv_chain(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **TOL)


def test_paconv_chain():
    from wavemamba_tpu.models.wavemamba import init_paconv, paconv_apply

    p = init_paconv(jax.random.PRNGKey(0), 16)
    x = _x((1, 24, 40, 16))
    ref = paconv_apply(p, x)
    got = cf.paconv_chain(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **TOL)


def test_ff_in_out_chains():
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    c = 8
    pin = [init_conv2d(k1, 1, 1, c, c), init_conv2d(k2, 3, 3, c, c, groups=c)]
    pout = [init_conv2d(k3, 3, 3, c, c, groups=c), init_conv2d(k4, 1, 1, c, c)]
    x = _x((1, 12, 20, c))
    ref_in = conv2d(pin[1], conv2d(pin[0], x), padding=1, groups=c)
    np.testing.assert_allclose(
        np.asarray(cf.ff_in_chain(pin, x)), np.asarray(ref_in), **TOL
    )
    ref_out = conv2d(pout[1], gelu(conv2d(pout[0], x, padding=1, groups=c)))
    np.testing.assert_allclose(
        np.asarray(cf.ff_out_chain(pout, x)), np.asarray(ref_out), **TOL
    )


def test_restormer_chain():
    from wavemamba_tpu.models.wavemamba import (
        feed_forward_restormer_apply,
        init_feed_forward_restormer,
    )

    p = init_feed_forward_restormer(jax.random.PRNGKey(0), 8)
    x = _x((1, 16, 16, 8))
    ref = feed_forward_restormer_apply(p, x)
    got = cf.restormer_chain(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **TOL)


def test_dw_act_and_dense():
    c = 8
    pdw = init_conv2d(jax.random.PRNGKey(0), 3, 3, c, c, groups=c)
    x = _x((1, 10, 30, c))
    ref = silu(conv2d(pdw, x, padding=1, groups=c))
    np.testing.assert_allclose(
        np.asarray(cf.dw_act(pdw, x, "silu")), np.asarray(ref), **TOL
    )
    pd = init_conv2d(jax.random.PRNGKey(1), 3, 3, c, 2 * c)
    ref = conv2d(pd, x, padding=1)
    np.testing.assert_allclose(
        np.asarray(cf.dense3x3(pd, x)), np.asarray(ref), **TOL
    )


def test_lfss_ffn_block_fused():
    """The fully-fused LFSS second half-block (LN + ffn + scaled residual
    in one kernel) matches the composed ops."""
    from wavemamba_tpu.models.wavemamba import ffn_apply, init_ffn
    from wavemamba_tpu.ops.nn import init_layer_norm, layer_norm

    c = 8
    p_ln = init_layer_norm(c)
    p_ln = {"g": p_ln["g"] + 0.3, "b": p_ln["b"] - 0.1}  # non-trivial LN
    p_ffn = init_ffn(jax.random.PRNGKey(1), c)
    skip = jnp.asarray(np.random.RandomState(7).rand(c), jnp.float32)
    x = _x((1, 21, 37, c), seed=9)
    ref = x * skip + ffn_apply(p_ffn, layer_norm(p_ln, x, eps=1e-5))
    got = cf.lfss_ffn_block(p_ln, p_ffn, skip, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **TOL)


def test_ln_folding_in_qkv_chain():
    from wavemamba_tpu.ops.nn import init_layer_norm, layer_norm

    c = 8
    p = {
        "qkv": init_conv2d(jax.random.PRNGKey(0), 1, 1, c, 3 * c),
        "qkv_dwconv": init_conv2d(jax.random.PRNGKey(1), 3, 3, 3 * c, 3 * c,
                                  groups=3 * c),
    }
    p_ln = init_layer_norm(c)
    x = _x((1, 20, 24, c), seed=2)
    ref = conv2d(p["qkv_dwconv"], conv2d(p["qkv"], layer_norm(p_ln, x, eps=1e-6)),
                 padding=1, groups=3 * c)
    got = cf.qkv_chain(p, x, ln=(p_ln["g"], p_ln["b"], 1e-6))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **TOL)


def test_band_vs_tile_kernels_agree():
    """The row-band kernel (default) and the 2-D tile kernel implement the
    same chain semantics — exercised on the halo-2 PAConv chain whose
    border masking is the trickiest case."""
    from wavemamba_tpu.models.wavemamba import init_paconv, paconv_apply

    p = init_paconv(jax.random.PRNGKey(2), 16)
    x = _x((1, 21, 37, 16), seed=3)
    ref = np.asarray(paconv_apply(p, x))
    band = np.asarray(cf.paconv_chain(p, x, band_h=8))
    tile = np.asarray(cf.paconv_chain(p, x, band_h=None))
    np.testing.assert_allclose(band, ref, **TOL)
    np.testing.assert_allclose(tile, ref, **TOL)
    np.testing.assert_allclose(band, tile, rtol=1e-5, atol=1e-5)


def test_tile_path_still_available():
    c = 8
    pdw = init_conv2d(jax.random.PRNGKey(5), 3, 3, c, c, groups=c)
    x = _x((1, 10, 30, c), seed=4)
    ref = silu(conv2d(pdw, x, padding=1, groups=c))
    got = cf.dw_act(pdw, x, "silu", band_h=None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **TOL)


def test_model_conv_impl_fused_matches_xla():
    """Full WaveMamba forward: conv_impl='fused' vs the XLA bf16 path."""
    from wavemamba_tpu.models.wavemamba import (
        WaveMambaConfig,
        init_wavemamba,
        wavemamba_apply,
    )

    base = dict(wf=8, n_l_blocks=(1, 1, 1), n_h_blocks=(1, 1, 1),
                scan_chunk=16, compute_dtype="bfloat16",
                scan_impl="chunked", scan_dtype="bfloat16")
    cfg_x = WaveMambaConfig(**base)
    cfg_f = WaveMambaConfig(conv_impl="fused", **base)
    params = init_wavemamba(jax.random.PRNGKey(0), cfg_x)
    x = _x((1, 40, 48, 3))
    y_x = np.asarray(wavemamba_apply(params, cfg_x, x), np.float32)
    y_f = np.asarray(wavemamba_apply(params, cfg_f, x), np.float32)
    # Both are bf16 pipelines with different-but-equivalent lowerings.
    np.testing.assert_allclose(y_f, y_x, rtol=0.06, atol=0.06)
