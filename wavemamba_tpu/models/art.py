"""ART — sparse/dense window-attention restoration transformer.

TPU-native NHWC re-implementation of the reference's secondary architecture
(`basicsr/archs/art_arch.py`): each TransformerBlock runs BOTH dense
window attention (GxG tiles) and sparse interval attention (I-strided
grids) with shared weights + dynamic position bias, fuses them with a 1x1
conv, then an MLP (`art_arch.py:161-320`). Net = conv stem + PixelUnshuffle
-> n_blocks -> conv + PixelShuffle with a global residual
(`art_arch.py:472-497`); ART wrapper registered like WaveMamba
(`art_arch.py:522-664`). The reference's unused STransformerBlock variant
(:322) is intentionally not reproduced.

Param pytrees mirror the torch module names so `convert/torch_import.py`
works unchanged (Sequential indices stay as string keys: to_feat['0'], ...).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from wavemamba_tpu.ops.nn import (
    conv2d,
    gelu,
    init_conv2d,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
    pixel_shuffle,
    pixel_unshuffle,
)

NEG_INF = -1000000.0


@dataclasses.dataclass(frozen=True)
class ARTConfig:
    dim: int = 48
    n_blocks: int = 8
    num_heads: int = 6
    window_size: int = 8
    interval: int = 16
    mlp_ratio: float = 2.0
    upscaling_factor: int = 4

    @property
    def out_dim(self) -> int:
        return self.upscaling_factor * self.dim


# --------------------------------------------------------------------------
# Dynamic position bias (`art_arch.py:34-66`).


def init_dynamic_pos_bias(key, dim, num_heads):
    pos_dim = dim // 4
    ks = jax.random.split(key, 4)

    def stage(k, cin, cout):
        return {"0": init_layer_norm(cin), "2": init_linear(k, cin, cout)}

    return {
        "pos_proj": init_linear(ks[0], 2, pos_dim),
        "pos1": stage(ks[1], pos_dim, pos_dim),
        "pos2": stage(ks[2], pos_dim, pos_dim),
        "pos3": stage(ks[3], pos_dim, num_heads),
    }


def dynamic_pos_bias_apply(p, biases):
    x = linear(p["pos_proj"], biases)
    for name in ("pos1", "pos2", "pos3"):
        x = linear(p[name]["2"], jax.nn.relu(layer_norm(p[name]["0"], x, eps=1e-5)))
    return x


def _relative_bias(p_pos, gh, gw, num_heads):
    """(heads, N, N) dynamic relative position bias for a gh x gw group."""
    bh = np.arange(1 - gh, gh)
    bw = np.arange(1 - gw, gw)
    biases = np.stack(np.meshgrid(bh, bw, indexing="ij")).reshape(2, -1).T  # ((2gh-1)(2gw-1), 2)
    ch, cw = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    coords = np.stack([ch, cw]).reshape(2, -1)  # (2, N)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += gh - 1
    rel[:, :, 1] += gw - 1
    rel[:, :, 0] *= 2 * gw - 1
    idx = rel.sum(-1).reshape(-1)  # (N*N,)
    pos = dynamic_pos_bias_apply(p_pos, jnp.asarray(biases, jnp.float32))  # (M, heads)
    bias = pos[jnp.asarray(idx)].reshape(gh * gw, gh * gw, num_heads)
    return bias.transpose(2, 0, 1)


# --------------------------------------------------------------------------
# Window attention (`art_arch.py:69-158`).


def init_attention(key, dim, num_heads):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "pos": init_dynamic_pos_bias(k1, dim // 4, num_heads),
        "qkv": init_linear(k2, dim, 3 * dim, bias=True),
        "proj": init_linear(k3, dim, dim),
    }


def attention_apply(p, x, gh, gw, num_heads, mask=None):
    """x: (B_, N, C) grouped tokens; mask: (nP, N, N) additive or None."""
    b_, n, c = x.shape
    hd = c // num_heads
    qkv = linear(p["qkv"], x).reshape(b_, n, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = q * (hd**-0.5)
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, precision="highest")
    attn = attn + _relative_bias(p["pos"], gh, gw, num_heads)[None]
    if mask is not None:
        np_ = mask.shape[0]
        attn = attn.reshape(b_ // np_, np_, num_heads, n, n) + mask[None, :, None]
        attn = attn.reshape(b_, num_heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v, precision="highest")
    out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
    return linear(p["proj"], out)


# --------------------------------------------------------------------------
# Transformer block: dense + sparse attention, fused (`art_arch.py:161-320`).


def init_transformer_block(key, cfg: ARTConfig):
    c = cfg.out_dim
    ks = jax.random.split(key, 5)
    return {
        "norm1": init_layer_norm(c),
        "attn": init_attention(ks[0], c, cfg.num_heads),
        "fusion": init_conv2d(ks[1], 1, 1, 2 * c, c),
        "norm2": init_layer_norm(c),
        "mlp": {
            "fc1": init_linear(ks[2], c, int(c * cfg.mlp_ratio)),
            "fc2": init_linear(ks[3], int(c * cfg.mlp_ratio), c),
        },
    }


def _pad_mask(x, size):
    """Pad NHWC to a multiple of `size`; returns padded x, pad mask (-1 in pad)."""
    b, h, w, c = x.shape
    pad_b = (-h) % size
    pad_r = (-w) % size
    xp = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    mask = np.zeros((1, h + pad_b, w + pad_r, 1), np.float32)
    if pad_b:
        mask[:, -pad_b:, :, :] = -1
    if pad_r:
        mask[:, :, -pad_r:, :] = -1
    return xp, mask, pad_b, pad_r


def _attn_mask(group_mask, n_groups, n_tokens):
    m = jnp.asarray(group_mask.reshape(n_groups, 1, n_tokens))
    return jnp.where(m < 0, NEG_INF, 0.0) * jnp.ones((1, n_tokens, 1))


def transformer_block_apply(p, cfg: ARTConfig, x):
    """x: (B, H, W, C) -> same."""
    b, h, w, c = x.shape
    window = min(cfg.window_size, h, w)
    heads = cfg.num_heads
    shortcut = x
    xn = layer_norm(p["norm1"], x, eps=1e-5)

    # --- dense window attention ---
    g = window
    xd, md, pad_b, pad_r = _pad_mask(xn, g)
    hd_, wd_ = xd.shape[1], xd.shape[2]
    npd = (hd_ // g) * (wd_ // g)
    xd = xd.reshape(b, hd_ // g, g, wd_ // g, g, c).transpose(0, 1, 3, 2, 4, 5)
    xd = xd.reshape(b * npd, g * g, c)
    attn_mask = None
    if pad_b or pad_r:
        md_g = md.reshape(1, hd_ // g, g, wd_ // g, g, 1).transpose(0, 1, 3, 2, 4, 5)
        attn_mask = _attn_mask(md_g.reshape(npd, g * g), npd, g * g)
    xd = attention_apply(p["attn"], xd, g, g, heads, attn_mask)
    xd = xd.reshape(b, hd_ // g, wd_ // g, g, g, c).transpose(0, 1, 3, 2, 4, 5)
    xd = xd.reshape(b, hd_, wd_, c)[:, :h, :w, :]

    # --- sparse interval attention ---
    i = cfg.interval
    xs, ms, pad_b2, pad_r2 = _pad_mask(xn, i)
    hs, ws = xs.shape[1], xs.shape[2]
    gh, gw = hs // i, ws // i
    nps = i * i
    xs = xs.reshape(b, gh, i, gw, i, c).transpose(0, 2, 4, 1, 3, 5)
    xs = xs.reshape(b * nps, gh * gw, c)
    attn_mask2 = None
    if pad_b2 or pad_r2:
        ms_g = ms.reshape(1, gh, i, gw, i, 1).transpose(0, 2, 4, 1, 3, 5)
        attn_mask2 = _attn_mask(ms_g.reshape(nps, gh * gw), nps, gh * gw)
    xs = attention_apply(p["attn"], xs, gh, gw, heads, attn_mask2)
    xs = xs.reshape(b, i, i, gh, gw, c).transpose(0, 3, 1, 4, 2, 5)
    xs = xs.reshape(b, hs, ws, c)[:, :h, :w, :]

    fused = conv2d(p["fusion"], jnp.concatenate([xd, xs], axis=-1))
    # Reference quirk (`art_arch.py:306-307`): the fusion output is NCHW and
    # gets `.view(B, H*W, C)`-ed WITHOUT a permute — a raw memory
    # reinterpretation that scrambles channels across tokens. Trained
    # checkpoints bake this in, so reproduce it bit-exactly: NHWC -> NCHW
    # buffer order -> read back as (HW, C) tokens -> token grid.
    scrambled = fused.transpose(0, 3, 1, 2).reshape(b, h * w, c)
    x = shortcut.reshape(b, h * w, c) + scrambled
    y = layer_norm(p["norm2"], x, eps=1e-5)
    y = linear(p["mlp"]["fc2"], gelu(linear(p["mlp"]["fc1"], y)))
    return (x + y).reshape(b, h, w, c)


# --------------------------------------------------------------------------
# Net + ART wrapper (`art_arch.py:472-497, 522-664`).


def init_art(key, cfg: ARTConfig):
    ks = jax.random.split(key, cfg.n_blocks + 2)
    net = {
        "to_feat": {"0": init_conv2d(ks[0], 3, 3, 3, cfg.dim // cfg.upscaling_factor)},
        "feats": [init_transformer_block(ks[2 + i], cfg) for i in range(cfg.n_blocks)],
        "to_img": {"0": init_conv2d(ks[1], 3, 3, cfg.out_dim,
                                    3 * cfg.upscaling_factor**2)},
    }
    return {"restoration_network": net}


def art_apply(params, cfg: ARTConfig, x):
    """x: (B, H, W, 3), H/W multiples of upscaling_factor."""
    p = params["restoration_network"]
    u = cfg.upscaling_factor
    y = conv2d(p["to_feat"]["0"], x, padding=1)
    y = pixel_unshuffle(y, u)
    y0 = y
    for blk in p["feats"]:
        y = transformer_block_apply(blk, cfg, y)
    y = y + y0
    y = conv2d(p["to_img"]["0"], y, padding=1)
    return pixel_shuffle(y, u)
