"""Minimal NHWC neural-net primitives over explicit parameter pytrees.

Parameters are plain dicts: convs/linears are ``{"w": ..., "b": ...}``
(bias key absent when the layer has none), norms are ``{"g": ..., "b": ...}``.
Conv kernels are HWIO (TPU-native); the checkpoint converter transposes the
reference's OIHW/`(out,in)` layouts (see `convert/torch_import.py`).

Everything is a pure function; XLA fuses the elementwise pre/post-ops into
the surrounding convolutions/matmuls.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax


def dot_precision(x):
    """Matmul/conv precision policy: float32 inputs use HIGHEST (bit-parity
    with the reference; XLA's default f32 path on CPU/TPU is reduced
    precision), while bf16 inputs use DEFAULT so the MXU runs native bf16
    instead of being upconverted."""
    return (
        lax.Precision.DEFAULT
        if x.dtype in (jnp.bfloat16, jnp.float16)
        else lax.Precision.HIGHEST
    )


def gelu(x):
    """Exact (erf) GELU — torch's F.gelu default, NOT jax's tanh approx."""
    return jax.nn.gelu(x, approximate=False)


def silu(x):
    return jax.nn.silu(x)


def conv2d(params, x, stride=1, padding="SAME", groups=1, as_conv=False):
    """NHWC conv. params['w']: (kh, kw, in/groups, out)."""
    w = params["w"]
    # 1x1/stride-1/ungrouped convs lower to a token matmul in reduced
    # precision: XLA's TPU conv path carries a fixed per-call spatial cost
    # (~0.7 ms at 540p regardless of channel width — measured 13x slower
    # than the equivalent dot). float32 keeps the conv lowering so the
    # bit-parity path is untouched. `as_conv=True` opts a call site out of
    # the matmul lowering (same math): 1x1s sandwiched between depthwise
    # convs can be cheaper in conv layout because XLA keeps the whole chain
    # in its conv tiling instead of relaying token<->conv around each op.
    if (
        not as_conv
        and w.shape[0] == 1 and w.shape[1] == 1 and stride == 1 and groups == 1
        and x.dtype != jnp.float32
        and (padding in ("SAME", "VALID") or padding == 0)
    ):
        b, h, wd, c = x.shape
        y = jnp.matmul(
            x.reshape(b, h * wd, c), w[0, 0].astype(x.dtype),
            precision=dot_precision(x),
        ).reshape(b, h, wd, -1)
        if "b" in params:
            y = y + params["b"].astype(y.dtype)
        return y
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=dn, feature_group_count=groups,
        precision=dot_precision(x),
    )
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y


def linear(params, x):
    """params['w']: (in, out); x: (..., in)."""
    y = jnp.matmul(x, params["w"].astype(x.dtype), precision=dot_precision(x))
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y


def layer_norm(params, x, eps=1e-5):
    """LayerNorm over the last axis, fp32 statistics."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * lax.rsqrt(var + eps)
    y = y * params["g"].astype(jnp.float32) + params["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def prelu(params, x):
    """PReLU with a single shared slope (torch nn.PReLU() default)."""
    a = params["a"].astype(x.dtype)
    return jnp.where(x >= 0, x, a * x)


def l2_normalize(x, axis=-1, eps=1e-12):
    """torch F.normalize(p=2): x / max(||x||_2, eps)."""
    n = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


def pixel_unshuffle(x, r):
    """NHWC space-to-depth matching torch PixelUnshuffle channel order.

    torch (NCHW): out channel index = c * r*r + (i * r + j) for row offset i,
    col offset j. We reproduce that exact ordering in NHWC.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, H/r, W/r, C, r, r)
    return x.reshape(b, h // r, w // r, c * r * r)


def pixel_shuffle(x, r):
    """Inverse of pixel_unshuffle (torch PixelShuffle channel order)."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, H, r, W, r, C)
    return x.reshape(b, h * r, w * r, c)


# ---------------------------------------------------------------------------
# Initializers (match torch defaults used by the reference).


def _fan_in_uniform(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init_conv2d(key, kh, kw, cin, cout, groups=1, bias=True, dtype=jnp.float32):
    """torch nn.Conv2d default init (kaiming_uniform a=sqrt(5) == U(+-1/sqrt(fan_in)))."""
    k1, k2 = jax.random.split(key)
    fan_in = (cin // groups) * kh * kw
    p = {"w": _fan_in_uniform(k1, (kh, kw, cin // groups, cout), fan_in, dtype)}
    if bias:
        p["b"] = _fan_in_uniform(k2, (cout,), fan_in, dtype)
    return p


def init_linear(key, cin, cout, bias=True, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    p = {"w": _fan_in_uniform(k1, (cin, cout), cin, dtype)}
    if bias:
        p["b"] = _fan_in_uniform(k2, (cout,), cin, dtype)
    return p


def init_layer_norm(c, dtype=jnp.float32):
    return {"g": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}
