"""Generic architecture helpers (`basicsr/archs/arch_util.py`), NHWC/JAX.

  * default_init_weights (:17)  -> scaled kaiming-normal re-init of a pytree
  * make_layer (:47)            -> stack of identical blocks (init + apply)
  * ResidualBlockNoBN (:63)     -> conv-relu-conv residual block
  * Upsample (:94)              -> pixelshuffle upsampler (2^n / 3x)
  * flow_warp (:116)            -> bilinear warp by optical flow
  * pixel_unshuffle (:189)      -> in ops/nn.py
  * trunc_normal_ (:208-270)    -> truncated normal init
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from wavemamba_tpu.ops.nn import conv2d, init_conv2d, pixel_shuffle


def trunc_normal(key, shape, mean=0.0, std=1.0, a=-2.0, b=2.0, dtype=jnp.float32):
    """Truncated normal via inverse-CDF (timm/reference semantics)."""
    lo = math.erf((a - mean) / (std * math.sqrt(2.0)))
    hi = math.erf((b - mean) / (std * math.sqrt(2.0)))
    u = jax.random.uniform(key, shape, dtype, lo, hi)
    x = jax.scipy.special.erfinv(u)
    return jnp.clip(mean + std * math.sqrt(2.0) * x, a, b)


def default_init_weights(key, params, scale=1.0):
    """Re-init conv/linear weights kaiming-normal * scale, zero biases —
    applied to a params pytree (the reference mutates modules in place)."""

    def visit(key, node):
        if isinstance(node, dict) and "w" in node:
            key, sub = jax.random.split(key)
            w = node["w"]
            fan_in = int(jnp.prod(jnp.asarray(w.shape[:-1])))
            std = math.sqrt(2.0 / fan_in)
            out = dict(node)
            out["w"] = jax.random.normal(sub, w.shape, w.dtype) * std * scale
            if "b" in node:
                out["b"] = jnp.zeros_like(node["b"])
            return key, out
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                key, out[k] = visit(key, v)
            return key, out
        if isinstance(node, list):
            out = []
            for v in node:
                key, r = visit(key, v)
                out.append(r)
            return key, out
        return key, node

    return visit(key, params)[1]


def init_residual_block_no_bn(key, num_feat=64, res_scale=1.0):
    k1, k2 = jax.random.split(key)
    p = {
        "conv1": init_conv2d(k1, 3, 3, num_feat, num_feat),
        "conv2": init_conv2d(k2, 3, 3, num_feat, num_feat),
    }
    return default_init_weights(key, p, scale=0.1), res_scale


def residual_block_no_bn_apply(p, x, res_scale=1.0):
    y = conv2d(p["conv2"], jax.nn.relu(conv2d(p["conv1"], x, padding=1)), padding=1)
    return x + y * res_scale


def make_layer(init_fn, apply_fn, num_blocks):
    """(init, apply) pair for `num_blocks` stacked identical blocks."""

    def init(key, *a, **k):
        return [init_fn(jax.random.fold_in(key, i), *a, **k) for i in range(num_blocks)]

    def apply(params, x, *a, **k):
        for p in params:
            x = apply_fn(p, x, *a, **k)
        return x

    return init, apply


def init_upsample(key, scale, num_feat):
    """PixelShuffle upsampler for scale 2^n or 3 (`arch_util.py:94-113`)."""
    convs = []
    if (scale & (scale - 1)) == 0:  # power of 2
        for i in range(int(math.log2(scale))):
            key, k = jax.random.split(key)
            convs.append(("ps2", init_conv2d(k, 3, 3, num_feat, 4 * num_feat)))
    elif scale == 3:
        key, k = jax.random.split(key)
        convs.append(("ps3", init_conv2d(k, 3, 3, num_feat, 9 * num_feat)))
    else:
        raise ValueError(f"scale {scale} is not supported. Supported scales: 2^n and 3.")
    return convs


def upsample_apply(params, x):
    for kind, p in params:
        x = conv2d(p, x, padding=1)
        x = pixel_shuffle(x, 2 if kind == "ps2" else 3)
    return x


def flow_warp(x, flow, interp_mode="bilinear", align_corners=True):
    """Warp NHWC image by flow (B, H, W, 2) in (dx, dy) pixel offsets
    (`arch_util.py:116-186` semantics, zeros padding)."""
    b, h, w, c = x.shape
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=flow.dtype), jnp.arange(w, dtype=flow.dtype),
                          indexing="ij")
    sx = gx[None] + flow[..., 0]
    sy = gy[None] + flow[..., 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    x1 = x0 + 1
    y1 = y0 + 1
    wx = sx - x0
    wy = sy - y0

    def gather(yy, xx):
        valid = (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
        yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        g = jax.vmap(lambda img, yi, xi: img[yi, xi])(x, yi, xi)
        return g * valid[..., None].astype(x.dtype)

    if interp_mode == "nearest":
        return gather(jnp.round(sy), jnp.round(sx))
    out = (
        gather(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
        + gather(y0, x1) * (wx * (1 - wy))[..., None]
        + gather(y1, x0) * ((1 - wx) * wy)[..., None]
        + gather(y1, x1) * (wx * wy)[..., None]
    )
    return out
