"""Differentiable JPEG (`basicsr/utils/diffjpeg.py:26-515`), NHWC/JAX.

Compress-decompress round trip with differentiable rounding
(x - sin(2*pi*x)/(2*pi)), standard luma/chroma quant tables scaled by JPEG
quality, 2x chroma subsampling, 8x8 DCT as matmuls (MXU-friendly).

diff_jpeg(x, quality): x (B, H, W, 3) RGB in [0, 1], H/W multiples of 16.
"""

from __future__ import annotations

import itertools

import numpy as np

import jax.numpy as jnp

_Y_TABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    np.float32,
)
_C_TABLE = np.full((8, 8), 99, np.float32)
_C_TABLE[:4, :4] = np.array(
    [[17, 18, 24, 47], [18, 21, 26, 66], [24, 26, 56, 99], [47, 66, 99, 99]]
)

# 8x8 DCT basis: dct[u, v, x, y]
_DCT = np.zeros((8, 8, 8, 8), np.float32)
for x, y, u, v in itertools.product(range(8), repeat=4):
    _DCT[u, v, x, y] = np.cos((2 * x + 1) * u * np.pi / 16) * np.cos(
        (2 * y + 1) * v * np.pi / 16
    )
_ALPHA = np.array([1.0 / np.sqrt(2)] + [1.0] * 7, np.float32)
_SCALE = np.outer(_ALPHA, _ALPHA) * 0.25


def _quality_factor(quality):
    quality = jnp.asarray(quality, jnp.float32)
    return jnp.where(quality < 50, 5000.0 / quality, 200.0 - quality * 2.0) / 100.0


def _diff_round(x):
    return jnp.round(x) + (x - jnp.round(x)) ** 3


def _blocks(x):  # (B, H, W) -> (B, nb, 8, 8)
    b, h, w = x.shape
    x = x.reshape(b, h // 8, 8, w // 8, 8).transpose(0, 1, 3, 2, 4)
    return x.reshape(b, -1, 8, 8)


def _unblocks(x, h, w):  # (B, nb, 8, 8) -> (B, H, W)
    b = x.shape[0]
    x = x.reshape(b, h // 8, w // 8, 8, 8).transpose(0, 1, 3, 2, 4)
    return x.reshape(b, h, w)


def _dct8(blocks):
    return jnp.einsum("bnxy,uvxy->bnuv", blocks - 128.0, jnp.asarray(_DCT),
                      precision="highest") * jnp.asarray(_SCALE)


def _idct8(coefs):
    coefs = coefs * jnp.asarray(_SCALE) * 4.0  # fold alpha back symmetrically
    return jnp.einsum("bnuv,uvxy->bnxy", coefs, jnp.asarray(_DCT),
                      precision="highest") * 0.25 + 128.0


def _rgb_to_ycbcr(x):  # [0,255]
    m = jnp.asarray(
        [[0.299, 0.587, 0.114], [-0.168736, -0.331264, 0.5], [0.5, -0.418688, -0.081312]],
        jnp.float32,
    )
    y = x @ m.T + jnp.asarray([0.0, 128.0, 128.0])
    return y


def _ycbcr_to_rgb(x):
    m = jnp.asarray(
        [[1.0, 0.0, 1.402], [1.0, -0.344136, -0.714136], [1.0, 1.772, 0.0]], jnp.float32
    )
    return (x - jnp.asarray([0.0, 128.0, 128.0])) @ m.T


def diff_jpeg(x, quality=80):
    """Differentiable JPEG round trip. x: (B, H, W, 3) RGB [0, 1]."""
    b, h, w, _ = x.shape
    assert h % 16 == 0 and w % 16 == 0, "H, W must be multiples of 16"
    factor = _quality_factor(quality)
    ycc = _rgb_to_ycbcr(x * 255.0)
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]

    # chroma 2x subsample (mean pooling, like the reference's avg_pool)
    def down(c):
        return c.reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    def up(c):
        return jnp.repeat(jnp.repeat(c, 2, axis=1), 2, axis=2)

    cb_d, cr_d = down(cb), down(cr)

    yq = jnp.asarray(_Y_TABLE) * factor
    cq = jnp.asarray(_C_TABLE) * factor
    yq = jnp.clip(jnp.round(yq), 1, 255)
    cq = jnp.clip(jnp.round(cq), 1, 255)

    def channel(cdata, table, hh, ww):
        coefs = _dct8(_blocks(cdata))
        qd = _diff_round(coefs / table)
        return _unblocks(_idct8(qd * table), hh, ww)

    y2 = channel(y, yq, h, w)
    cb2 = up(channel(cb_d, cq, h // 2, w // 2))
    cr2 = up(channel(cr_d, cq, h // 2, w // 2))
    out = _ycbcr_to_rgb(jnp.stack([y2, cb2, cr2], axis=-1)) / 255.0
    return jnp.clip(out, 0.0, 1.0)
