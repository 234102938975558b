"""Haar DWT / inverse DWT as pure reshape/slice arithmetic (NHWC).

Semantics match the reference's strided-slice Haar transform
(`basicsr/archs/wavemamba_arch.py:97-130`): each 2x2 block
``[[p00, p01], [p10, p11]]`` (rows, cols) contributes, with ``xi = p/2``:

    LL =  x1 + x2 + x3 + x4
    HL = -x1 - x2 + x3 + x4
    LH = -x1 + x2 - x3 + x4
    HH =  x1 - x2 - x3 + x4

where x1 = p[even row, even col], x2 = p[odd row, even col],
x3 = p[even row, odd col], x4 = p[odd row, odd col].

The inverse writes the interleaved pixels back; ``iwt2(dwt2(x))`` is exact
for even spatial dims (up to float round-off: the transform is +-1/2
butterflies). Unlike the reference (which allocates a zeros buffer per call,
`wavemamba_arch.py:122`), the inverse here is a single reshape — XLA fuses
both transforms into neighbouring ops with no scatter.

All functions take/return NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dwt2(x: jnp.ndarray):
    """Haar DWT. x: (B, H, W, C) with even H, W.

    Returns (LL, HL, LH, HH), each (B, H//2, W//2, C).
    """
    b, h, w, c = x.shape
    # (B, H/2, 2, W/2, 2, C): axis 2 = row parity, axis 4 = col parity.
    x = x.reshape(b, h // 2, 2, w // 2, 2, c) * 0.5
    x1 = x[:, :, 0, :, 0, :]  # even row, even col
    x2 = x[:, :, 1, :, 0, :]  # odd  row, even col
    x3 = x[:, :, 0, :, 1, :]  # even row, odd  col
    x4 = x[:, :, 1, :, 1, :]  # odd  row, odd  col
    ll = x1 + x2 + x3 + x4
    hl = -x1 - x2 + x3 + x4
    lh = -x1 + x2 - x3 + x4
    hh = x1 - x2 - x3 + x4
    return ll, hl, lh, hh


def iwt2(ll: jnp.ndarray, hl: jnp.ndarray, lh: jnp.ndarray, hh: jnp.ndarray) -> jnp.ndarray:
    """Inverse Haar DWT. Each subband (B, h, w, C) -> (B, 2h, 2w, C)."""
    b, h, w, c = ll.shape
    x1 = ll * 0.5
    x2 = hl * 0.5
    x3 = lh * 0.5
    x4 = hh * 0.5
    p00 = x1 - x2 - x3 + x4  # even row, even col
    p10 = x1 - x2 + x3 - x4  # odd  row, even col
    p01 = x1 + x2 - x3 - x4  # even row, odd  col
    p11 = x1 + x2 + x3 + x4  # odd  row, odd  col
    # Stack to (B, h, 2, w, 2, C) with [row parity, col parity] axes.
    rows_even = jnp.stack([p00, p01], axis=3)  # (B, h, w, 2, C)
    rows_odd = jnp.stack([p10, p11], axis=3)
    out = jnp.stack([rows_even, rows_odd], axis=2)  # (B, h, 2, w, 2, C)
    return out.reshape(b, 2 * h, 2 * w, c)


def dwt2_conv(x: jnp.ndarray):
    """Haar DWT as ONE dense 2x2/stride-2 conv on the MXU.

    Mathematically identical to `dwt2` (same ±0.5 sums), but the
    parity-strided slicing there lowers to stride-2 gathers that run ~20x
    above the HBM bound on TPU (measured 6.6 ms for 1080p x 32ch vs ~0.3 ms
    memory-bound); a dense conv with a constant-folded sparse kernel is one
    MXU pass with the subbands emitted in contiguous channel blocks.
    Use in reduced-precision paths; `dwt2` stays the bit-parity reference.

    x: (B, H, W, C) even H, W -> (LL, HL, LH, HH), each (B, H/2, W/2, C).
    """
    b, h, w, c = x.shape
    # Signs at patch position (row parity dy, col parity dx) per subband;
    # x1..x4 of `dwt2` are (dy,dx) = (0,0), (1,0), (0,1), (1,1). Columns
    # here are ordered (0,0), (0,1), (1,0), (1,1) = (x1, x3, x2, x4) so a
    # plain reshape to (ky, kx) lands each sign at its kernel tap.
    signs = jnp.asarray(
        #  x1    x3    x2    x4
        [[+1.0, +1.0, +1.0, +1.0],   # LL =  x1 + x2 + x3 + x4
         [-1.0, +1.0, -1.0, +1.0],   # HL = -x1 - x2 + x3 + x4
         [-1.0, -1.0, +1.0, +1.0],   # LH = -x1 + x2 - x3 + x4
         [+1.0, -1.0, -1.0, +1.0]],  # HH =  x1 - x2 - x3 + x4
        x.dtype,
    ) * 0.5
    eye = jnp.eye(c, dtype=x.dtype)
    # w[ky, kx, cin, cout] with cout = subband * C + cin (contiguous
    # subband blocks — the output slices below are free).
    kern = jnp.einsum("sp,ij->psij", signs, eye)  # (4, 4, C, C)
    kern = kern.transpose(0, 2, 1, 3).reshape(2, 2, c, 4 * c)
    dn = jax.lax.conv_dimension_numbers(x.shape, kern.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, kern, (2, 2), "VALID", dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST,
    )
    return y[..., :c], y[..., c:2*c], y[..., 2*c:3*c], y[..., 3*c:]


def iwt2_cat(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse DWT from channel-concatenated subbands [LL|HL|LH|HH].

    x: (B, h, w, 4C) -> (B, 2h, 2w, C). Mirrors `iwt_init`
    (`wavemamba_arch.py:113-130`) which consumes a 4C channel stack.
    """
    c = x.shape[-1] // 4
    return iwt2(x[..., :c], x[..., c : 2 * c], x[..., 2 * c : 3 * c], x[..., 3 * c :])
