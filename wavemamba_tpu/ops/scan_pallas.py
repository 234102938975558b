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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _resolve_interpret(interpret):
    """interpret=None means auto: compile with Mosaic on TPU backends, run
    the kernel in interpret mode elsewhere (CPU CI, the smoke's own tests).
    Resolved at trace time (interpret is a static jit argument)."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _shift_down(x, s, fill):
    """x: (R, N, D) -> prepend `s` fill-rows, drop the last `s`."""
    if s == 0:
        return x
    pad = jnp.full((s,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[:-s]], axis=0)


def _scan_kernel(u_ref, dr_ref, b_ref, c_ref, a_ref, dsk_ref, bias_ref, y_ref,
                 carry_ref, h_ref, *, sub: int):
    c_idx = pl.program_id(1)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    # Save the chunk-ENTRY state (residual for the backward kernel).
    carry_ref[0, 0] = h_ref[...]

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


@functools.partial(
    jax.jit, static_argnames=("chunk", "sub", "interpret", "return_carries")
)
def selective_scan_pallas(u, delta, A, Bs, Cs, D_skip, delta_bias,
                          chunk=512, sub=8, interpret=None,
                          return_carries=False):
    """Public-layout wrapper; see `ops/scan.py` for layout docs."""
    interpret = _resolve_interpret(interpret)
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
    cr_spec = pl.BlockSpec((1, 1, N, D), lambda g, c: (g, c, 0, 0), memory_space=pltpu.VMEM)

    y, carries = pl.pallas_call(
        functools.partial(_scan_kernel, sub=sub),
        grid=grid,
        in_specs=[ld_spec, ld_spec, ln_spec, ln_spec, a_spec, v_spec, v_spec],
        out_specs=(ld_spec, cr_spec),
        out_shape=(
            jax.ShapeDtypeStruct((G, Lp, D), f32),
            jax.ShapeDtypeStruct((G, nc, N, D), f32),
        ),
        scratch_shapes=[pltpu.VMEM((N, D), f32)],
        interpret=interpret,
    )(u_g, dr_g, b_g, c_g, a_g, dsk_g, bias_g)

    y = y.reshape(B, K, Lp, D)
    out = y[:, :, :L] if pad else y
    if return_carries:
        return out, carries
    return out


# ---------------------------------------------------------------------------
# Backward kernel: gradient of the recurrence as a REVERSE linear scan.
#
#   g_t := dL/dh_t = C_t (x) dy_t + a_{t+1} * g_{t+1}
#   du_t  = da_t * sum_n g_t B_t[n] + D_skip * dy_t
#   dda_t = sum_n (g_t h_{t-1} a_t A)[n] + (sum_n g_t B_t[n]) u_t
#   ddr_t = dda_t * sigmoid(dr_t + bias);  dbias = sum_t ddr_t
#   dB_t[n] = sum_d g_t da_t u_t;  dC_t[n] = sum_d dy_t h_t
#   dA += sum_t g_t h_{t-1} a_t da_t;  dD_skip = sum_t dy_t u_t
#
# Chunks are processed in reverse grid order; the forward kernel's saved
# chunk-entry carries supply h at each chunk boundary, and a VMEM scratch
# carries a_first*g_first back to the previous (earlier) chunk.


def _linscan_values(coef, inp, init, sub, reverse=False):
    """Two-pass subsegment linear scan over axis 0 of (T, N, D) values.

    forward (reverse=False): h_t = coef_t * h_{t-1} + inp_t, h_{-1} = init.
    reverse (reverse=True):  h_t = coef_t * h_{t+1} + inp_t, h_{T}  = init.

    The reverse mode is written with shifted concatenations instead of array
    flips — Mosaic has no `rev` lowering.
    """
    T, N, D = inp.shape
    S = sub
    R = T // S
    c4 = coef.reshape(R, S, N, D)
    i4 = inp.reshape(R, S, N, D)
    order = range(S) if not reverse else range(S - 1, -1, -1)
    first = 0 if not reverse else S - 1

    pa = c4[:, first]
    pb = i4[:, first]
    for i in order:
        if i == first:
            continue
        pa = pa * c4[:, i]
        pb = c4[:, i] * pb + i4[:, i]
    sa, sb = pa, pb
    s = 1
    while s < R:
        ones = jnp.ones((s, N, D), sa.dtype)
        zeros = jnp.zeros((s, N, D), sb.dtype)
        if not reverse:  # combine with earlier subsegments (shift down)
            sa_sh = jnp.concatenate([ones, sa[:-s]], axis=0)
            sb_sh = jnp.concatenate([zeros, sb[:-s]], axis=0)
        else:  # combine with later subsegments (shift up)
            sa_sh = jnp.concatenate([sa[s:], ones], axis=0)
            sb_sh = jnp.concatenate([sb[s:], zeros], axis=0)
        sb = sb + sa * sb_sh
        sa = sa * sa_sh
        s *= 2
    if not reverse:
        ex_a = jnp.concatenate([jnp.ones((1, N, D), sa.dtype), sa[:-1]], axis=0)
        ex_b = jnp.concatenate([jnp.zeros((1, N, D), sb.dtype), sb[:-1]], axis=0)
    else:
        ex_a = jnp.concatenate([sa[1:], jnp.ones((1, N, D), sa.dtype)], axis=0)
        ex_b = jnp.concatenate([sb[1:], jnp.zeros((1, N, D), sb.dtype)], axis=0)
    h = ex_a * init[None] + ex_b
    hs = [None] * S
    for i in order:
        h = c4[:, i] * h + i4[:, i]
        hs[i] = h
    return jnp.stack(hs, axis=1).reshape(T, N, D)


def _scan_bwd_kernel(u_ref, dr_ref, b_ref, c_ref, dy_ref, hin_ref, a_ref,
                     dsk_ref, bias_ref,
                     du_ref, ddr_ref, db_ref, dc_ref, dA_ref, ddsk_ref,
                     dbias_ref, gcar_ref, *, sub: int):
    c_idx = pl.program_id(1)

    @pl.when(c_idx == 0)
    def _():
        gcar_ref[...] = jnp.zeros_like(gcar_ref)
        dA_ref[...] = jnp.zeros_like(dA_ref)
        ddsk_ref[...] = jnp.zeros_like(ddsk_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    u = u_ref[0]  # (T, D)
    dr = dr_ref[0]
    Bm = b_ref[0]  # (T, N)
    Cm = c_ref[0]
    dy = dy_ref[0]  # (T, D)
    h_in = hin_ref[0, 0]  # (N, D) chunk-entry state
    A = a_ref[0]  # (N, D)
    dsk = dsk_ref[0]  # (1, D)
    bias = bias_ref[0]  # (1, D)

    T, D = u.shape
    N = A.shape[0]
    z = dr + bias
    da = jax.nn.softplus(z)
    sig = jax.nn.sigmoid(z)

    # Recompute per-position a_t and forward states h_t (value arrays).
    a_all = jnp.exp(da[:, None, :] * A[None])  # (T, N, D)
    b_all = (da * u)[:, None, :] * Bm[:, :, None]
    h_all = _linscan_values(a_all, b_all, h_in, sub)  # (T, N, D)
    h_prev = jnp.concatenate([h_in[None], h_all[:-1]], axis=0)

    # Reverse scan for g: g_t = c_t * g_{t+1} + q_t with c_t = a_{t+1}
    # (the chunk-boundary coefficient is 1: the carry from the later chunk
    # arrives pre-multiplied by its own a).
    q = Cm[:, :, None] * dy[:, None, :]  # (T, N, D)
    c_shift = jnp.concatenate([a_all[1:], jnp.ones((1, N, D), a_all.dtype)], axis=0)
    g = _linscan_values(c_shift, q, gcar_ref[...], sub, reverse=True)  # (T, N, D)
    gcar_ref[...] = a_all[0] * g[0]

    common = g * h_prev * a_all  # (T, N, D)
    gB = jnp.sum(g * Bm[:, :, None], axis=1)  # (T, D)
    dda = jnp.sum(common * A[None], axis=1) + gB * u  # (T, D)

    du_ref[0] = da * gB + dsk * dy
    ddr = dda * sig
    ddr_ref[0] = ddr
    db_ref[0] = jnp.sum(g * (da * u)[:, None, :], axis=2)  # (T, N)
    dc_ref[0] = jnp.sum(dy[:, None, :] * h_all, axis=2)  # (T, N)
    dA_ref[0] = dA_ref[0] + jnp.sum(common * da[:, None, :], axis=0)
    ddsk_ref[0, 0] = ddsk_ref[0, 0] + jnp.sum(dy * u, axis=0)
    dbias_ref[0, 0] = dbias_ref[0, 0] + jnp.sum(ddr, axis=0)


@functools.partial(jax.jit, static_argnames=("chunk", "sub", "interpret"))
def selective_scan_pallas_bwd(u, delta, A, Bs, Cs, D_skip, delta_bias,
                              carries, dy, chunk=256, sub=8, interpret=None):
    """Backward pass. Inputs in public layouts + `carries` from the forward
    kernel and cotangent dy (B, K, L, D). Returns grads for
    (u, delta, A, Bs, Cs, D_skip, delta_bias)."""
    interpret = _resolve_interpret(interpret)
    B, K, L, D = u.shape
    N = A.shape[-1]
    G = B * K
    f32 = jnp.float32

    pad = (-L) % chunk
    Lp = L + pad

    def pack_ld(x):
        x = x.astype(f32).reshape(G, L, x.shape[-1])
        return jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x

    u_g = pack_ld(u)
    dr_g = pack_ld(delta)
    b_g = pack_ld(Bs)
    c_g = pack_ld(Cs)
    dy_g = pack_ld(dy)
    a_g = jnp.broadcast_to(
        A.astype(f32).transpose(0, 2, 1)[None], (B, K, N, D)
    ).reshape(G, N, D)
    dsk_g = jnp.broadcast_to(D_skip.astype(f32)[None, :, None, :], (B, K, 1, D)).reshape(G, 1, D)
    bias_g = jnp.broadcast_to(
        delta_bias.astype(f32)[None, :, None, :], (B, K, 1, D)
    ).reshape(G, 1, D)

    nc = Lp // chunk
    grid = (G, nc)
    # Chunks in REVERSE order: index maps use (nc - 1 - c).
    ld_r = pl.BlockSpec((1, chunk, D), lambda g, c: (g, nc - 1 - c, 0),
                        memory_space=pltpu.VMEM)
    ln_r = pl.BlockSpec((1, chunk, N), lambda g, c: (g, nc - 1 - c, 0),
                        memory_space=pltpu.VMEM)
    cr_r = pl.BlockSpec((1, 1, N, D), lambda g, c: (g, nc - 1 - c, 0, 0),
                        memory_space=pltpu.VMEM)
    a_spec = pl.BlockSpec((1, N, D), lambda g, c: (g, 0, 0), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, 1, D), lambda g, c: (g, 0, 0), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_scan_bwd_kernel, sub=sub),
        grid=grid,
        in_specs=[ld_r, ld_r, ln_r, ln_r, ld_r, cr_r, a_spec, v_spec, v_spec],
        out_specs=(ld_r, ld_r, ln_r, ln_r, a_spec, v_spec, v_spec),
        out_shape=(
            jax.ShapeDtypeStruct((G, Lp, D), f32),   # du
            jax.ShapeDtypeStruct((G, Lp, D), f32),   # ddelta (pre-softplus)
            jax.ShapeDtypeStruct((G, Lp, N), f32),   # dB
            jax.ShapeDtypeStruct((G, Lp, N), f32),   # dC
            jax.ShapeDtypeStruct((G, N, D), f32),    # dA (per stream)
            jax.ShapeDtypeStruct((G, 1, D), f32),    # dD_skip (per stream)
            jax.ShapeDtypeStruct((G, 1, D), f32),    # dbias (per stream)
        ),
        scratch_shapes=[pltpu.VMEM((N, D), f32)],
        interpret=interpret,
    )(u_g, dr_g, b_g, c_g, dy_g, carries, a_g, dsk_g, bias_g)

    du_g, ddr_g, db_g, dc_g, dA_g, ddsk_g, dbias_g = outs

    def unpack_ld(x, F):
        x = x[:, :L] if pad else x
        return x.reshape(B, K, L, F)

    du = unpack_ld(du_g, D).astype(u.dtype)
    ddelta = unpack_ld(ddr_g, D).astype(delta.dtype)
    dB = unpack_ld(db_g, N).astype(Bs.dtype)
    dC = unpack_ld(dc_g, N).astype(Cs.dtype)
    # Per-stream accumulators -> parameter shapes (sum over batch).
    dA = dA_g.reshape(B, K, N, D).sum(0).transpose(0, 2, 1).astype(A.dtype)
    dDsk = ddsk_g.reshape(B, K, D).sum(0).astype(D_skip.dtype)
    dbias = dbias_g.reshape(B, K, D).sum(0).astype(delta_bias.dtype)
    return du, ddelta, dA, dB, dC, dDsk, dbias


# ---------------------------------------------------------------------------
# FUSED SS2D kernel: dt/B/C projections + softplus + scan + D-skip in one
# pallas_call, BOTH directions of a pair computed simultaneously.
#
# The unfused path materializes xs/dts/Bs/Cs (4 direction copies of the
# token stream) in HBM before scanning. Here each call reads the token
# stream once per direction pair and computes everything in VMEM.
#
# Lane packing (the v5e-specific part): with D=64 channels, a
# one-direction-at-a-time kernel leaves half of every 128-lane vector
# register empty. This kernel packs the forward direction in lanes [:D]
# and the reverse direction in lanes [D:] of (Rr, N, 2D) work arrays, so
# the VPU runs at full width. The reverse direction's tokens are reversed
# on entry with an antidiagonal-permutation matmul (MXU, exact: each
# output is 1.0 * one input) and its y is un-reversed the same way — after
# that BOTH halves scan forward and the scan code is direction-uniform
# (no lax.cond, no flips; Mosaic has no `rev` lowering).
#
# Grid step (b, c): forward half processes chunk c, reverse half processes
# chunk nc-1-c (its own processing order), each chaining its own half of
# the (N, 2D) VMEM state. Per-step transitions (a_i, b_i) from pass 1 are
# kept live in VMEM and reused in pass 2 — halves the exp() count vs
# recomputing (exp dominates the VPU op budget).


def _fused_kernel(xf_ref, xr_ref, perm_ref, wx_ref, dtw_ref, bias_ref,
                  a2_ref, dsk2_ref, y0_ref, y1_ref, *rest,
                  sub, nc, dt_rank, d_state, with_carries=False):
    if with_carries:
        cr_ref, h_ref = rest
    else:
        (h_ref,) = rest
        cr_ref = None
    c_idx = pl.program_id(1)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    if cr_ref is not None:
        # chunk-ENTRY state in processing order — residual for the backward.
        cr_ref[0, 0] = h_ref[...]

    f32 = jnp.float32

    def permute(P, v):
        # Exact reversal on the MXU. A permutation only MOVES values (every
        # output element is 1.0 * one input), so it is exact in any dtype
        # that holds the values: bf16 operands take the DEFAULT single-pass
        # bf16 MXU path (~3x cheaper — the r3 anatomy sweep measured the
        # HIGHEST permutes at ~12% of kernel time); f32 operands need
        # HIGHEST, whose multi-pass recombines x exactly (verified 0.0
        # error on v5e; DEFAULT on f32 would round through bf16, 2e-3 err).
        if v.dtype == jnp.bfloat16:
            return jax.lax.dot_general(
                P.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        return jax.lax.dot_general(
            P, v, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=f32,
        )

    xf = xf_ref[0].astype(f32)  # (T, D) chunk c, token order
    P = perm_ref[...]  # (T, T) antidiagonal
    # chunk nc-1-c with tokens reversed -> this half scans forward too
    # (permute BEFORE the f32 widen: bf16 inputs ride the fast MXU path).
    xr = permute(P, xr_ref[0]).astype(f32)
    T, D = xf.shape
    N = d_state
    R = dt_rank
    A2 = a2_ref[...]  # (N, 2D)
    dsk2 = dsk2_ref[...]  # (1, 2D)

    def project(x, k):
        x_dbl = jnp.dot(x, wx_ref[k], preferred_element_type=f32)  # (T, R+2N)
        da = jax.nn.softplus(
            jnp.dot(x_dbl[:, :R], dtw_ref[k], preferred_element_type=f32)
            + bias_ref[k]
        )  # (T, D)
        return da, x_dbl[:, R : R + N], x_dbl[:, R + N :]

    daf, Bf, Cf = project(xf, 0)
    dar, Br, Cr = project(xr, 1)

    u = jnp.concatenate([xf, xr], axis=1)  # (T, 2D)
    da = jnp.concatenate([daf, dar], axis=1)  # (T, 2D)

    # FULL-ARRAY per-token transitions in one op stream (the T*N*2D exp is
    # the kernel's inherent cost — computed exactly once), then 4-D views
    # whose per-step slices index an UNTILED dim (no strided sublane reads
    # inside the loops).
    a_all = jnp.exp(da[:, None, :] * A2[None])  # (T, N, 2D)
    dau = da * u  # (T, 2D)
    Bc = jnp.concatenate(
        [jnp.broadcast_to(Bf[:, :, None], (T, N, D)),
         jnp.broadcast_to(Br[:, :, None], (T, N, D))], axis=2)
    b_all = dau[:, None, :] * Bc  # (T, N, 2D)
    Cc = jnp.concatenate(
        [jnp.broadcast_to(Cf[:, :, None], (T, N, D)),
         jnp.broadcast_to(Cr[:, :, None], (T, N, D))], axis=2)

    S = sub
    Rr = T // S
    a4 = a_all.reshape(Rr, S, N, 2 * D)
    b4 = b_all.reshape(Rr, S, N, 2 * D)
    C4 = Cc.reshape(Rr, S, N, 2 * D)

    # Pass 1: per-subsegment aggregate transition.
    pa = a4[:, 0]
    pb = b4[:, 0]
    for i in range(1, S):
        ai = a4[:, i]
        pa = pa * ai
        pb = ai * pb + b4[:, i]

    # Log-depth inclusive scan over the Rr subsegment transitions.
    sa, sb = pa, pb
    s = 1
    while s < Rr:
        ones = jnp.ones((s, N, 2 * D), sa.dtype)
        zeros = jnp.zeros((s, N, 2 * D), sb.dtype)
        sb = sb + sa * jnp.concatenate([zeros, sb[:-s]], axis=0)
        sa = sa * jnp.concatenate([ones, sa[:-s]], axis=0)
        s *= 2

    h0 = h_ref[...]  # (N, 2D)
    ex_a = jnp.concatenate([jnp.ones((1, N, 2 * D), sa.dtype), sa[:-1]], axis=0)
    ex_b = jnp.concatenate([jnp.zeros((1, N, 2 * D), sb.dtype), sb[:-1]], axis=0)
    h = ex_a * h0[None] + ex_b  # entering state per subsegment
    h_ref[...] = sa[Rr - 1] * h0 + sb[Rr - 1]

    # Pass 2: replay the cached transitions, emit y.
    ys = []
    for i in range(S):
        h = a4[:, i] * h + b4[:, i]
        ys.append(jnp.sum(h * C4[:, i], axis=1))  # (Rr, 2D)
    # (S, Rr, 2D) -> one relayout -> (T, 2D); skip-connection added as a
    # full-array op.
    y = jnp.stack(ys, axis=0).transpose(1, 0, 2).reshape(T, 2 * D)
    y = y + dsk2 * u

    y0_ref[0] = y[:, :D].astype(y0_ref.dtype)
    # reverse half's y is in reversed token order — un-reverse on the MXU.
    # For bf16 streaming, round FIRST then permute: identical result
    # (rounding each element then moving it == moving then rounding), and
    # the permute runs single-pass bf16.
    y1 = y[:, D:].astype(y1_ref.dtype) if y1_ref.dtype == jnp.bfloat16 else y[:, D:]
    y1_ref[0] = permute(P, y1).astype(y1_ref.dtype)


# SSD-form scan core (round-4 experiment, VERDICT r3 #1) — MEASURED
# NEGATIVE RESULT, kept non-default as the record (BENCH_NOTES.md
# "Round 4: chunked-SSD"): loses 201.5 -> 218.6 ms on the weighted scan
# budget because the factorization's extra live (T, N, 2D) arrays force
# a half-size chunk under the 16 MB scoped-VMEM limit, and Mamba-2's
# true MXU contraction of N is structurally unavailable for S6's
# per-(n,d) decay. The same recurrence evaluated via the factorized
# within-segment form
#
#   h_t = G_t * (H_seg + cums_t),   G_t = exp(A * clocal_t),
#   cums_t = sum_{s<=t in segment} b_s * exp(-A * clocal_s)
#
# where clocal is the segment-local inclusive cumsum of delta. This is the
# chunked-SSD decomposition specialized to a per-(n,d) diagonal A (the S6
# parametrization WaveMamba uses): the within-segment recurrence becomes a
# plain prefix SUM of rescaled inputs, removing pass-1's 3-op transition
# chain and pass-2's 2-op state replay in favor of 1 cumsum add + the
# G/Gi rescales. Op budget per (T, N, 2D) element: ~8.3 mul/adds + 2 exp
# vs the two-pass core's ~11.25 + 1 exp (analysis in BENCH_NOTES r4).
#
# NUMERICS: exp(-A*clocal) GROWS along a segment (A<0); the early-s
# contributions it scales up are scaled back by G_t, so the f32 rounding
# this costs lands only on terms that are physically decayed by the same
# factor (the standard chunked-SSD argument). The hard limit is overflow:
# max |A| * sum(delta over a segment) must stay < ~88 (f32 exp range).
# With S=8 and the S4D init (|A|<=16) that bounds mean delta at ~0.69 per
# step — checked against trained checkpoints before enabling. Exactness
# vs the two-pass kernel is CI-tested; fidelity on trained weights gates
# any default switch.


def _fused_kernel_ssd(xf_ref, xr_ref, perm_ref, wx_ref, dtw_ref, bias_ref,
                      a2_ref, dsk2_ref, y0_ref, y1_ref, *rest,
                      sub, nc, dt_rank, d_state, with_carries=False):
    if with_carries:
        cr_ref, h_ref = rest
    else:
        (h_ref,) = rest
        cr_ref = None
    c_idx = pl.program_id(1)

    @pl.when(c_idx == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    if cr_ref is not None:
        cr_ref[0, 0] = h_ref[...]

    f32 = jnp.float32

    def permute(P, v):
        if v.dtype == jnp.bfloat16:
            return jax.lax.dot_general(
                P.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        return jax.lax.dot_general(
            P, v, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=f32,
        )

    xf = xf_ref[0].astype(f32)  # (T, D)
    P = perm_ref[...]
    xr = permute(P, xr_ref[0]).astype(f32)
    T, D = xf.shape
    N = d_state
    R = dt_rank
    A2 = a2_ref[...]  # (N, 2D)
    dsk2 = dsk2_ref[...]  # (1, 2D)

    def project(x, k):
        x_dbl = jnp.dot(x, wx_ref[k], preferred_element_type=f32)
        da = jax.nn.softplus(
            jnp.dot(x_dbl[:, :R], dtw_ref[k], preferred_element_type=f32)
            + bias_ref[k]
        )
        return da, x_dbl[:, R:R + N], x_dbl[:, R + N:]

    daf, Bf, Cf = project(xf, 0)
    dar, Br, Cr = project(xr, 1)

    u = jnp.concatenate([xf, xr], axis=1)  # (T, 2D)
    da = jnp.concatenate([daf, dar], axis=1)  # (T, 2D)
    w = da * u  # (T, 2D)

    S = sub
    Rr = T // S

    # Segment-local inclusive cumsum of delta — (T, 2D) work, negligible.
    da3 = da.reshape(Rr, S, 2 * D)
    run = da3[:, 0]
    cl = [run]
    for i in range(1, S):
        run = run + da3[:, i]
        cl.append(run)
    clocal = jnp.stack(cl, axis=1).reshape(T, 2 * D)

    m = clocal[:, None, :] * A2[None]  # (T, N, 2D), <= 0
    G = jnp.exp(m)

    Bc = jnp.concatenate(
        [jnp.broadcast_to(Bf[:, :, None], (T, N, D)),
         jnp.broadcast_to(Br[:, :, None], (T, N, D))], axis=2)
    Cc = jnp.concatenate(
        [jnp.broadcast_to(Cf[:, :, None], (T, N, D)),
         jnp.broadcast_to(Cr[:, :, None], (T, N, D))], axis=2)
    # 1/G instead of a second exp(-m): exp dominates the kernel's VPU op
    # budget (the r3 two-pass anatomy), and a divide is ~1 VPU op. Same
    # value and the same overflow bound (G underflows exactly where
    # exp(-m) overflowed); also one fewer live (T, N, 2D) array in VMEM.
    bhat = (w[:, None, :] * Bc) / G  # (T, N, 2D)

    # Within-segment prefix sum (1 add/element, one S-loop total).
    bh4 = bhat.reshape(Rr, S, N, 2 * D)
    G4 = G.reshape(Rr, S, N, 2 * D)
    C4 = Cc.reshape(Rr, S, N, 2 * D)
    acc = bh4[:, 0]
    cums = [acc]
    for i in range(1, S):
        acc = acc + bh4[:, i]
        cums.append(acc)

    # Cross-segment combine (identical Hillis-Steele as the two-pass core).
    sa = G4[:, S - 1]  # segment transition a
    sb = G4[:, S - 1] * cums[S - 1]  # segment transition b
    s = 1
    while s < Rr:
        ones = jnp.ones((s, N, 2 * D), sa.dtype)
        zeros = jnp.zeros((s, N, 2 * D), sb.dtype)
        sb = sb + sa * jnp.concatenate([zeros, sb[:-s]], axis=0)
        sa = sa * jnp.concatenate([ones, sa[:-s]], axis=0)
        s *= 2

    h0 = h_ref[...]  # (N, 2D)
    ex_a = jnp.concatenate([jnp.ones((1, N, 2 * D), sa.dtype), sa[:-1]], axis=0)
    ex_b = jnp.concatenate([jnp.zeros((1, N, 2 * D), sb.dtype), sb[:-1]], axis=0)
    H = ex_a * h0[None] + ex_b  # segment-entry states (Rr, N, 2D)
    h_ref[...] = sa[Rr - 1] * h0 + sb[Rr - 1]

    # Emission: h_t = G_t * (H + cums_t); y_t = sum_n C_t h_t.
    ys = []
    for i in range(S):
        hi = G4[:, i] * (H + cums[i])
        ys.append(jnp.sum(hi * C4[:, i], axis=1))  # (Rr, 2D)
    y = jnp.stack(ys, axis=0).transpose(1, 0, 2).reshape(T, 2 * D)
    y = y + dsk2 * u

    y0_ref[0] = y[:, :D].astype(y0_ref.dtype)
    y1 = y[:, D:].astype(y1_ref.dtype) if y1_ref.dtype == jnp.bfloat16 else y[:, D:]
    y1_ref[0] = permute(P, y1).astype(y1_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("chunk", "sub", "interpret", "return_carries", "out_dtype",
                     "variant"),
)
def ss2d_scan_fused(x_tokens, wx, dtw, bias, A, dsk, chunk=512, sub=8,
                    interpret=None, return_carries=False,
                    out_dtype=None, variant="twopass"):
    """Fused projection+scan for ONE direction pair.

    x_tokens: (B, L, D) token stream (row-major or transposed, per pair).
    wx: (2, D, R+2N) stacked projection weights for [forward, reverse];
    dtw: (2, R, D); bias/dsk: (2, D); A: (2, N, D) (negative).
    Returns y: (B, 2, L, D) — forward-scan and reverse-scan outputs, both
    in original token order. With return_carries=True also returns the
    chunk-entry states (B, 2, nc, N, D) in PROCESSING order (residuals for
    the fused backward kernel). out_dtype (default float32) selects the
    dtype y is STREAMED to HBM in — bf16 halves the write traffic and the
    read traffic of every downstream consumer (sum/transpose/LayerNorm);
    the scan state and all in-kernel math stay float32.
    """
    interpret = _resolve_interpret(interpret)
    y_dtype = jnp.dtype(out_dtype) if out_dtype is not None else jnp.float32
    B, L, D = x_tokens.shape
    _, N, _ = A.shape  # (2, N, D)
    Rk = dtw.shape[1]
    f32 = jnp.float32

    pad = (-L) % chunk
    Lp = L + pad
    x_p = jnp.pad(x_tokens, ((0, 0), (0, pad), (0, 0))) if pad else x_tokens
    nc = Lp // chunk
    grid = (B, nc)

    # Antidiagonal permutation: P @ x reverses tokens within a chunk
    # (exact on the MXU — every output element is 1.0 * one input).
    perm = jnp.asarray(np.eye(chunk, dtype=np.float32)[::-1])
    A2 = jnp.concatenate([A[0], A[1]], axis=-1).astype(f32)  # (N, 2D)
    dsk2 = jnp.concatenate([dsk[0], dsk[1]], axis=-1).astype(f32)[None]  # (1, 2D)

    xf_spec = pl.BlockSpec((1, chunk, D), lambda b, c: (b, c, 0),
                           memory_space=pltpu.VMEM)
    xr_spec = pl.BlockSpec((1, chunk, D), lambda b, c: (b, nc - 1 - c, 0),
                           memory_space=pltpu.VMEM)
    perm_spec = pl.BlockSpec((chunk, chunk), lambda b, c: (0, 0),
                             memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda b, c: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    y0_spec = pl.BlockSpec((1, chunk, D), lambda b, c: (b, c, 0),
                           memory_space=pltpu.VMEM)
    y1_spec = pl.BlockSpec((1, chunk, D), lambda b, c: (b, nc - 1 - c, 0),
                           memory_space=pltpu.VMEM)

    wx_f = wx.astype(f32)
    dtw_f = dtw.astype(f32)
    bias_f = bias.astype(f32)[:, None, :]  # (2, 1, D)

    out_specs = (y0_spec, y1_spec)
    out_shape = (
        jax.ShapeDtypeStruct((B, Lp, D), y_dtype),
        jax.ShapeDtypeStruct((B, Lp, D), y_dtype),
    )
    if return_carries:
        cr_spec = pl.BlockSpec((1, 1, N, 2 * D), lambda b, c: (b, c, 0, 0),
                               memory_space=pltpu.VMEM)
        out_specs = out_specs + (cr_spec,)
        out_shape = out_shape + (jax.ShapeDtypeStruct((B, nc, N, 2 * D), f32),)

    kernel_fn = {"twopass": _fused_kernel, "ssd": _fused_kernel_ssd}[variant]
    out = pl.pallas_call(
        functools.partial(kernel_fn, sub=sub, nc=nc, dt_rank=Rk, d_state=N,
                          with_carries=return_carries),
        grid=grid,
        in_specs=[xf_spec, xr_spec, perm_spec, full(wx_f), full(dtw_f),
                  full(bias_f), full(A2), full(dsk2)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((N, 2 * D), f32)],
        interpret=interpret,
    )(x_p, x_p, perm, wx_f, dtw_f, bias_f, A2, dsk2)

    y = jnp.stack(out[:2], axis=1)  # (B, 2, Lp, D)
    y = y[:, :, :L] if pad else y
    if return_carries:
        # (B, nc, N, 2D) -> the per-direction layout the backward expects.
        cr = out[2]
        carries = jnp.stack([cr[..., :D], cr[..., D:]], axis=1)
        return y, carries
    return y


# ---------------------------------------------------------------------------
# FUSED backward kernel: gradients of projections + scan + D-skip in one
# pallas_call. Where the unfused backward writes du/ddelta/dB/dC (4 L-sized
# arrays) and leaves the projection backward to XLA matmuls over
# HBM-materialized xs/dts, this kernel re-projects each chunk in VMEM and
# emits ONLY dx (1 L-sized array per direction) plus per-stream weight
# accumulators — the training-time analogue of the fused forward's
# read-x-once property.
#
# Direction handling mirrors the fused forward kernel exactly: BOTH
# directions of the pair are processed in one grid step, the forward member
# in lanes [:D] and the reverse member in lanes [D:] of (T, N, 2D) work
# arrays (full 128-lane VPU width at D=64). The reverse member's tokens and
# cotangents are reversed on entry with the antidiagonal-permutation matmul
# (exact on the MXU), after which both members are in their own processing
# order and the whole gradient computation is direction-uniform: the
# forward-state recompute is a forward in-chunk scan and the g-recurrence a
# reverse in-chunk scan for both. No lax.cond (whose two live branches
# doubled the VMEM footprint of the previous version and capped chunk at
# 128), no array flips (Mosaic has no `rev` lowering).
#
# The backward sweeps processing chunks in REVERSE order (the g-carry flows
# from later to earlier processing chunks), i.e. grid step cb handles
# processing chunk cbp = nc-1-cb: actual chunk cbp for the forward member,
# actual chunk cb (reversed tokens) for the reverse member — the fused
# forward's index maps composed with cb -> nc-1-cb.


def _fused_bwd_kernel(xf_ref, xr_ref, dyf_ref, dyr_ref, hin_ref, perm_ref,
                      wx_ref, dtw_ref, bias_ref, a2_ref, dsk2_ref,
                      dx0_ref, dx1_ref, dwr_ref, dwB_ref, dwC_ref, ddtw_ref,
                      dbias_ref, dA_ref, ddsk_ref, gcar_ref,
                      *, sub, nc, dt_rank, d_state):
    cb = pl.program_id(1)

    @pl.when(cb == 0)
    def _():
        gcar_ref[...] = jnp.zeros_like(gcar_ref)
        dwr_ref[...] = jnp.zeros_like(dwr_ref)
        dwB_ref[...] = jnp.zeros_like(dwB_ref)
        dwC_ref[...] = jnp.zeros_like(dwC_ref)
        ddtw_ref[...] = jnp.zeros_like(ddtw_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)
        dA_ref[...] = jnp.zeros_like(dA_ref)
        ddsk_ref[...] = jnp.zeros_like(ddsk_ref)

    f32 = jnp.float32
    P = perm_ref[...]  # (T, T) antidiagonal

    def permute(Pm, v):
        # Exact reversal on the MXU (see the forward kernel's note: bf16
        # operands ride the single-pass bf16 path exactly).
        if v.dtype == jnp.bfloat16:
            return jax.lax.dot_general(
                Pm.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        return jax.lax.dot_general(
            Pm, v, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=f32,
        )

    xf = xf_ref[0].astype(f32)              # (T, D) processing order
    xr = permute(P, xr_ref[0]).astype(f32)  # (T, D) processing order
    dyf = dyf_ref[0, 0].astype(f32)
    dyr = permute(P, dyr_ref[0, 0]).astype(f32)
    h_in = jnp.concatenate([hin_ref[0, 0, 0], hin_ref[0, 1, 0]], axis=1)  # (N, 2D)
    A2 = a2_ref[...]    # (N, 2D)
    dsk2 = dsk2_ref[...]  # (1, 2D)

    T, D = xf.shape
    N = d_state
    R = dt_rank

    # Recompute projections (MXU) exactly as the forward kernel.
    def project(x, k):
        x_dbl = jnp.dot(x, wx_ref[k], preferred_element_type=f32)  # (T, R+2N)
        z = (jnp.dot(x_dbl[:, :R], dtw_ref[k], preferred_element_type=f32)
             + bias_ref[k])  # (T, D)
        return x_dbl[:, :R], x_dbl[:, R:R + N], x_dbl[:, R + N:], z

    xrf, Bf, Cf, zf = project(xf, 0)
    xrr, Br, Cr, zr = project(xr, 1)
    z = jnp.concatenate([zf, zr], axis=1)  # (T, 2D)
    da = jax.nn.softplus(z)
    sig = jax.nn.sigmoid(z)
    u = jnp.concatenate([xf, xr], axis=1)  # (T, 2D)

    a_all = jnp.exp(da[:, None, :] * A2[None])  # (T, N, 2D)
    dau = da * u  # (T, 2D)
    Bc = jnp.concatenate(
        [jnp.broadcast_to(Bf[:, :, None], (T, N, D)),
         jnp.broadcast_to(Br[:, :, None], (T, N, D))], axis=2)
    Cc = jnp.concatenate(
        [jnp.broadcast_to(Cf[:, :, None], (T, N, D)),
         jnp.broadcast_to(Cr[:, :, None], (T, N, D))], axis=2)
    b_all = dau[:, None, :] * Bc  # (T, N, 2D)
    dy2 = jnp.concatenate([dyf, dyr], axis=1)  # (T, 2D)
    q = Cc * dy2[:, None, :]  # (T, N, 2D)

    # Forward-state recompute + gradient recurrence, direction-uniform.
    h_all = _linscan_values(a_all, b_all, h_in, sub)  # (T, N, 2D)
    # g_t = a_{t+1} g_{t+1} + q_t; the carry from the later processing chunk
    # arrives pre-multiplied by its own a (hence the trailing ones row).
    ones1 = jnp.ones((1, N, 2 * D), a_all.dtype)
    c_shift = jnp.concatenate([a_all[1:], ones1], axis=0)
    g = _linscan_values(c_shift, q, gcar_ref[...], sub, reverse=True)
    gcar_ref[...] = a_all[0] * g[0]

    gdau = g * dau[:, None, :]  # (T, N, 2D)
    # g * h_prev * a_all without materializing the shifted h_prev:
    # a_t h_{t-1} = h_t - b_t and g*b = g*dau*Bc = gdau*Bc (gdau is needed
    # for dB anyway) — one fewer live (T, N, 2D) array in VMEM, which is
    # what caps the training chunk size.
    common = g * h_all - gdau * Bc  # (T, N, 2D)
    gB = jnp.sum(g * Bc, axis=1)  # (T, 2D)
    dda = jnp.sum(common * A2[None], axis=1) + gB * u  # (T, 2D)
    ddr = dda * sig  # grad wrt z (= dt_lin and bias)
    du_scan = da * gB + dsk2 * dy2  # (T, 2D) scan-input path
    hdy = dy2[:, None, :] * h_all  # (T, N, 2D)
    dB_f = jnp.sum(gdau[:, :, :D], axis=2)  # (T, N)
    dB_r = jnp.sum(gdau[:, :, D:], axis=2)
    dC_f = jnp.sum(hdy[:, :, :D], axis=2)
    dC_r = jnp.sum(hdy[:, :, D:], axis=2)

    # Projection backward (all MXU, in VMEM) — per direction, then the
    # reverse member's dx is un-reversed on the way out.
    def dx_dir(k, ddr_k, dB_k, dC_k, du_k):
        dxr = jnp.dot(ddr_k, dtw_ref[k].T, preferred_element_type=f32)  # (T, R)
        wxk = wx_ref[k]
        dx = (
            jnp.dot(dxr, wxk[:, :R].T, preferred_element_type=f32)
            + jnp.dot(dB_k, wxk[:, R:R + N].T, preferred_element_type=f32)
            + jnp.dot(dC_k, wxk[:, R + N:].T, preferred_element_type=f32)
            + du_k
        )
        return dxr, dx

    dxr_f, dx_f = dx_dir(0, ddr[:, :D], dB_f, dC_f, du_scan[:, :D])
    dxr_r, dx_r = dx_dir(1, ddr[:, D:], dB_r, dC_r, du_scan[:, D:])
    dx0_ref[0] = dx_f.astype(dx0_ref.dtype)
    # round-then-permute == permute-then-round (pure data movement)
    dx_r1 = dx_r.astype(dx1_ref.dtype) if dx1_ref.dtype == jnp.bfloat16 else dx_r
    dx1_ref[0] = permute(P, dx_r1).astype(dx1_ref.dtype)

    # Per-batch weight accumulators (blocks revisit across the cb sweep).
    dwr_ref[0, 0] = dwr_ref[0, 0] + jnp.dot(xf.T, dxr_f, preferred_element_type=f32)
    dwr_ref[0, 1] = dwr_ref[0, 1] + jnp.dot(xr.T, dxr_r, preferred_element_type=f32)
    dwB_ref[0, 0] = dwB_ref[0, 0] + jnp.dot(xf.T, dB_f, preferred_element_type=f32)
    dwB_ref[0, 1] = dwB_ref[0, 1] + jnp.dot(xr.T, dB_r, preferred_element_type=f32)
    dwC_ref[0, 0] = dwC_ref[0, 0] + jnp.dot(xf.T, dC_f, preferred_element_type=f32)
    dwC_ref[0, 1] = dwC_ref[0, 1] + jnp.dot(xr.T, dC_r, preferred_element_type=f32)
    ddtw_ref[0, 0] = ddtw_ref[0, 0] + jnp.dot(xrf.T, ddr[:, :D], preferred_element_type=f32)
    ddtw_ref[0, 1] = ddtw_ref[0, 1] + jnp.dot(xrr.T, ddr[:, D:], preferred_element_type=f32)
    dbias_ref[0, 0] = dbias_ref[0, 0] + jnp.sum(ddr, axis=0)  # (2D,) packed
    dA_ref[0] = dA_ref[0] + jnp.sum(common * da[:, None, :], axis=0)  # (N, 2D)
    ddsk_ref[0, 0] = ddsk_ref[0, 0] + jnp.sum(dy2 * u, axis=0)  # (2D,) packed


@functools.partial(jax.jit, static_argnames=("chunk", "sub", "interpret"))
def ss2d_scan_fused_bwd(x_tokens, wx, dtw, bias, A, dsk, carries, dy,
                        chunk=256, sub=8, interpret=None):
    """Backward of `ss2d_scan_fused`. dy: (B, 2, L, D) cotangent.

    Returns (dx, dwx, ddtw, dbias, dA, ddsk) with dx summed over the two
    directions ((B, L, D), in x_tokens.dtype) and per-direction weight
    grads in the forward's layouts."""
    interpret = _resolve_interpret(interpret)
    B, L, D = x_tokens.shape
    _, N, _ = A.shape
    Rk = dtw.shape[1]
    f32 = jnp.float32

    pad = (-L) % chunk
    Lp = L + pad
    x_p = jnp.pad(x_tokens, ((0, 0), (0, pad), (0, 0))) if pad else x_tokens
    dy_p = (
        jnp.pad(dy.astype(f32), ((0, 0), (0, 0), (0, pad), (0, 0))) if pad
        else dy.astype(f32)
    )
    nc = Lp // chunk
    grid = (B, nc)

    # Grid step cb handles processing chunk cbp = nc-1-cb (reverse sweep):
    # the forward member's tokens live in actual chunk cbp, the reverse
    # member's in actual chunk nc-1-cbp = cb (reversed in-kernel).
    perm = jnp.asarray(np.eye(chunk, dtype=np.float32)[::-1])
    xf_spec = pl.BlockSpec((1, chunk, D), lambda b, cb: (b, nc - 1 - cb, 0),
                           memory_space=pltpu.VMEM)
    xr_spec = pl.BlockSpec((1, chunk, D), lambda b, cb: (b, cb, 0),
                           memory_space=pltpu.VMEM)
    dyf_spec = pl.BlockSpec((1, 1, chunk, D),
                            lambda b, cb: (b, 0, nc - 1 - cb, 0),
                            memory_space=pltpu.VMEM)
    dyr_spec = pl.BlockSpec((1, 1, chunk, D), lambda b, cb: (b, 1, cb, 0),
                            memory_space=pltpu.VMEM)
    dx0_spec = pl.BlockSpec((1, chunk, D), lambda b, cb: (b, nc - 1 - cb, 0),
                            memory_space=pltpu.VMEM)
    dx1_spec = pl.BlockSpec((1, chunk, D), lambda b, cb: (b, cb, 0),
                            memory_space=pltpu.VMEM)
    cr_spec = pl.BlockSpec((1, 2, 1, N, D),
                           lambda b, cb: (b, 0, nc - 1 - cb, 0, 0),
                           memory_space=pltpu.VMEM)
    perm_spec = pl.BlockSpec((chunk, chunk), lambda b, cb: (0, 0),
                             memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda b, cb: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    # Per-batch accumulators — cb ignored, so the block stays resident in
    # VMEM across the whole reverse chunk sweep.
    acc = lambda shape: pl.BlockSpec((1,) + shape,
                                     lambda b, cb: (b,) + (0,) * len(shape),
                                     memory_space=pltpu.VMEM)

    wx_f = wx.astype(f32)
    dtw_f = dtw.astype(f32)
    bias_f = bias.astype(f32)[:, None, :]  # (2, 1, D)
    A2 = jnp.concatenate([A[0], A[1]], axis=-1).astype(f32)  # (N, 2D)
    dsk2 = jnp.concatenate([dsk[0], dsk[1]], axis=-1).astype(f32)[None]  # (1, 2D)

    outs = pl.pallas_call(
        functools.partial(_fused_bwd_kernel, sub=sub, nc=nc, dt_rank=Rk,
                          d_state=N),
        grid=grid,
        in_specs=[xf_spec, xr_spec, dyf_spec, dyr_spec, cr_spec, perm_spec,
                  full(wx_f), full(dtw_f), full(bias_f), full(A2), full(dsk2)],
        out_specs=(dx0_spec, dx1_spec, acc((2, D, Rk)), acc((2, D, N)),
                   acc((2, D, N)), acc((2, Rk, D)), acc((1, 2 * D)),
                   acc((N, 2 * D)), acc((1, 2 * D))),
        out_shape=(
            jax.ShapeDtypeStruct((B, Lp, D), x_tokens.dtype),  # dx fwd dir
            jax.ShapeDtypeStruct((B, Lp, D), x_tokens.dtype),  # dx rev dir
            jax.ShapeDtypeStruct((B, 2, D, Rk), f32),
            jax.ShapeDtypeStruct((B, 2, D, N), f32),
            jax.ShapeDtypeStruct((B, 2, D, N), f32),
            jax.ShapeDtypeStruct((B, 2, Rk, D), f32),
            jax.ShapeDtypeStruct((B, 1, 2 * D), f32),
            jax.ShapeDtypeStruct((B, N, 2 * D), f32),
            jax.ShapeDtypeStruct((B, 1, 2 * D), f32),
        ),
        scratch_shapes=[pltpu.VMEM((N, 2 * D), f32)],
        interpret=interpret,
    )(x_p, x_p, dy_p, dy_p, carries, perm, wx_f, dtw_f, bias_f, A2, dsk2)

    dx0, dx1, dwr, dwB, dwC, ddtw, dbias, dA, ddsk = outs
    dx = (dx0 + dx1)[:, :L].astype(x_tokens.dtype)
    dwx = jnp.concatenate([dwr, dwB, dwC], axis=-1).sum(0).astype(wx.dtype)
    dbias2 = dbias.sum(0)[0]  # (2D,) packed
    dA2 = dA.sum(0)  # (N, 2D) packed
    ddsk2 = ddsk.sum(0)[0]  # (2D,) packed
    return (
        dx,
        dwx,                                  # (2, D, R+2N)
        ddtw.sum(0).astype(dtw.dtype),        # (2, R, D)
        jnp.stack([dbias2[:D], dbias2[D:]]).astype(bias.dtype),  # (2, D)
        jnp.stack([dA2[:, :D], dA2[:, D:]]).astype(A.dtype),     # (2, N, D)
        jnp.stack([ddsk2[:D], ddsk2[D:]]).astype(dsk.dtype),     # (2, D)
    )


# Differentiable entry point: primal = the inference kernel (no residuals);
# under AD the forward also emits chunk-entry carries and the backward is
# the fused kernel above.
@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def ss2d_scan_fused_diff(x_tokens, wx, dtw, bias, A, dsk, chunk=256, sub=8,
                         interpret=None, out_dtype=None):
    return ss2d_scan_fused(x_tokens, wx, dtw, bias, A, dsk, chunk=chunk,
                           sub=sub, interpret=interpret, out_dtype=out_dtype)


def _fused_diff_fwd(x_tokens, wx, dtw, bias, A, dsk, chunk, sub, interpret,
                    out_dtype):
    from jax.ad_checkpoint import checkpoint_name

    y, carries = ss2d_scan_fused(
        x_tokens, wx, dtw, bias, A, dsk, chunk=chunk, sub=sub,
        interpret=interpret, return_carries=True, out_dtype=out_dtype,
    )
    # Name the kernel outputs and residuals so a checkpoint policy
    # (save_only_these_names("ss2d_scan"), models/wavemamba._maybe_remat)
    # can SAVE them across the block remat: without this the block
    # recompute re-runs the scan forward a second time in the backward
    # pass (~116 ms/step at batch-8 512^2 — measured, BENCH_NOTES r3).
    y = checkpoint_name(y, "ss2d_scan")
    carries = checkpoint_name(carries, "ss2d_scan")
    x_saved = checkpoint_name(x_tokens, "ss2d_scan")
    return y, (x_saved, wx, dtw, bias, A, dsk, carries)


def _fused_diff_bwd(chunk, sub, interpret, out_dtype, res, dy):
    x_tokens, wx, dtw, bias, A, dsk, carries = res
    return ss2d_scan_fused_bwd(
        x_tokens, wx, dtw, bias, A, dsk, carries, dy, chunk=chunk, sub=sub,
        interpret=interpret,
    )


ss2d_scan_fused_diff.defvjp(_fused_diff_fwd, _fused_diff_bwd)
