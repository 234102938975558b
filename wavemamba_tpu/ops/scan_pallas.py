"""Pallas TPU kernel for the selective scan (S6 linear recurrence).

Replaces the reference's external CUDA kernel
(`mamba_ssm.ops.selective_scan_interface.selective_scan_fn`, invoked at
`basicsr/archs/wavemamba_arch.py:465-471`; SURVEY.md §2.9 #1) with a
TPU-native chunked design:

  * The grid is (G, num_chunks): G = B*K independent scan streams, chunks
    sequential. The recurrent state h (N, D) lives in a VMEM scratch that
    persists across grid steps (TPU grids execute sequentially), so HBM
    traffic is exactly: read chunk inputs once, write y once.
  * Inside a chunk of T tokens the recurrence is evaluated work-efficiently
    in two passes over R = T/S subsegments of length S:
      pass 1: S unrolled steps compute each subsegment's transition
              (prod a, accumulated b) vectorized over (R, N, D);
      combine: a log-depth (Hillis-Steele) scan over the R subsegment
              transitions yields each subsegment's entering state;
      pass 2: S unrolled steps recompute a_i, b_i and emit y, now with the
              correct entering states — O(T) work, O(S + log R) depth.
  * delta-softplus, the B*u outer product, and the D*u skip connection are
    fused into the kernel; everything is float32 (parity with the
    reference's fp32 scan, `wavemamba_arch.py:457-463`).

Layouts (wrapper `selective_scan_pallas` repacks from the public API):
  u, delta : (G, Lp, D)     Bs, Cs : (G, Lp, N)
  A        : (G, N, D)      D_skip, bias : (G, 1, D)
  y        : (G, Lp, D)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_down(x, s, fill):
    """x: (R, N, D) -> prepend `s` fill-rows, drop the last `s`."""
    if s == 0:
        return x
    pad = jnp.full((s,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[:-s]], axis=0)


def _scan_kernel(u_ref, dr_ref, b_ref, c_ref, a_ref, dsk_ref, bias_ref, y_ref, h_ref,
                 *, sub: int):
    c_idx = pl.program_id(1)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    u = u_ref[0]  # (T, D)
    da = jax.nn.softplus(dr_ref[0] + bias_ref[0])  # (T, D)
    A = a_ref[0]  # (N, D)
    Bm = b_ref[0]  # (T, N)
    Cm = c_ref[0]  # (T, N)

    T, D = u.shape
    N = A.shape[0]
    S = sub
    R = T // S
    u4 = u.reshape(R, S, D)
    da4 = da.reshape(R, S, D)
    B4 = Bm.reshape(R, S, N)
    C4 = Cm.reshape(R, S, N)

    def step_ab(i):
        dai = da4[:, i, :][:, None, :]  # (R, 1, D)
        ai = jnp.exp(dai * A[None])  # (R, N, D)
        bi = (dai * u4[:, i, :][:, None, :]) * B4[:, i, :][:, :, None]
        return ai, bi

    # Pass 1: per-subsegment transition.
    pa = None
    pb = None
    for i in range(S):
        ai, bi = step_ab(i)
        if i == 0:
            pa, pb = ai, bi
        else:
            pa = pa * ai
            pb = ai * pb + bi

    # Log-depth inclusive scan over the R subsegment transitions.
    sa, sb = pa, pb
    s = 1
    while s < R:
        sa_sh = _shift_down(sa, s, 1.0)
        sb_sh = _shift_down(sb, s, 0.0)
        sb = sb + sa * sb_sh
        sa = sa * sa_sh
        s *= 2

    h0 = h_ref[...]  # (N, D) carry from previous chunk
    # Entering state per subsegment = exclusive prefix applied to h0.
    ex_a = _shift_down(sa, 1, 1.0)
    ex_b = _shift_down(sb, 1, 0.0)
    H = ex_a * h0[None] + ex_b  # (R, N, D)
    h_ref[...] = sa[R - 1] * h0 + sb[R - 1]

    # Pass 2: recompute a_i, b_i with true entering states, emit y.
    dsk = dsk_ref[0]  # (1, D)
    h = H
    ys = []
    for i in range(S):
        ai, bi = step_ab(i)
        h = ai * h + bi
        yi = jnp.sum(h * C4[:, i, :][:, :, None], axis=1)  # (R, D)
        ys.append(yi + dsk * u4[:, i, :])
    y = jnp.stack(ys, axis=1).reshape(T, D)
    y_ref[0] = y


@functools.partial(jax.jit, static_argnames=("chunk", "sub", "interpret"))
def selective_scan_pallas(u, delta, A, Bs, Cs, D_skip, delta_bias,
                          chunk=512, sub=8, interpret=False):
    """Public-layout wrapper; see `ops/scan.py` for layout docs."""
    B, K, L, D = u.shape
    N = A.shape[-1]
    G = B * K
    f32 = jnp.float32

    pad = (-L) % chunk
    Lp = L + pad

    def pack_ld(x):  # (B,K,L,F) -> (G,Lp,F), zero-padded
        x = x.astype(f32).reshape(G, L, x.shape[-1])
        return jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x

    u_g = pack_ld(u)
    dr_g = pack_ld(delta)
    b_g = pack_ld(Bs)
    c_g = pack_ld(Cs)
    # A (K,D,N) -> per-stream (G,N,D); D_skip/bias (K,D) -> (G,1,D).
    a_g = jnp.broadcast_to(
        A.astype(f32).transpose(0, 2, 1)[None], (B, K, N, D)
    ).reshape(G, N, D)
    dsk_g = jnp.broadcast_to(D_skip.astype(f32)[None, :, None, :], (B, K, 1, D)).reshape(G, 1, D)
    bias_g = jnp.broadcast_to(
        delta_bias.astype(f32)[None, :, None, :], (B, K, 1, D)
    ).reshape(G, 1, D)

    nc = Lp // chunk
    grid = (G, nc)
    ld_spec = pl.BlockSpec((1, chunk, D), lambda g, c: (g, c, 0), memory_space=pltpu.VMEM)
    ln_spec = pl.BlockSpec((1, chunk, N), lambda g, c: (g, c, 0), memory_space=pltpu.VMEM)
    a_spec = pl.BlockSpec((1, N, D), lambda g, c: (g, 0, 0), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, 1, D), lambda g, c: (g, 0, 0), memory_space=pltpu.VMEM)

    y = pl.pallas_call(
        functools.partial(_scan_kernel, sub=sub),
        grid=grid,
        in_specs=[ld_spec, ld_spec, ln_spec, ln_spec, a_spec, v_spec, v_spec],
        out_specs=ld_spec,
        out_shape=jax.ShapeDtypeStruct((G, Lp, D), f32),
        scratch_shapes=[pltpu.VMEM((N, D), f32)],
        interpret=interpret,
    )(u_g, dr_g, b_g, c_g, a_g, dsk_g, bias_g)

    y = y.reshape(B, K, Lp, D)
    return y[:, :, :L] if pad else y
