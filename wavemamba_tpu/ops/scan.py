"""Selective-scan (Mamba S6 recurrence) — TPU-native implementations.

Semantics match `mamba_ssm`'s ``selective_scan_fn`` as invoked by the
reference SS2D (`basicsr/archs/wavemamba_arch.py:465-471`): with
``da_t = softplus(delta_t + delta_bias)`` (``delta_softplus=True``),

    h_t = exp(da_t * A) * h_{t-1} + da_t * B_t * u_t        (h: (D, N))
    y_t = sum_n C_t[n] * h_t[:, n] + D_skip * u_t           (y: (D,))

with variable (input-dependent) B_t, C_t shared across the D channels of a
direction group, and h_0 = 0. All state math is float32 regardless of input
dtype (the reference upcasts at `wavemamba_arch.py:457-463`).

Public layouts (K = number of direction groups, 4 for SS2D):
    u, delta        : (B, K, L, D)
    A               : (K, D, N)   (already negative: A = -exp(A_log))
    Bs, Cs          : (B, K, L, N)
    D_skip, delta_bias : (K, D)
    returns y       : (B, K, L, D)

Four implementations behind one dispatcher:
  * ``ref``     — step-by-step `lax.scan`; exact, O(L) sequential. Test anchor.
  * ``chunked`` — `lax.scan` over chunks, two-pass work-efficient inside each
                  chunk; differentiable, rematerialized per chunk. Default
                  (bit-parity) implementation.
  * ``par``     — fully parallel (no sequential chunk loop): subsegment
                  transitions + log-depth combine + replay. Fastest XLA
                  variant on TPU; used by `WaveMambaConfig.fast()`.
  * ``pallas``  — fused Pallas TPU kernel pair (forward + reverse-scan
                  backward, see `scan_pallas.py`) behind a custom VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _combine(left, right):
    """Associative combine for h_t = a_t * h_{t-1} + b_t."""
    a1, b1 = left
    a2, b2 = right
    return a2 * a1, a2 * b1 + b2


def selective_scan_ref(u, delta, A, Bs, Cs, D_skip, delta_bias):
    """Sequential reference. Shapes as module docstring. Small L only."""
    u = u.astype(jnp.float32)
    da = jax.nn.softplus(delta.astype(jnp.float32) + delta_bias[None, :, None, :])
    A = A.astype(jnp.float32)
    Bs = Bs.astype(jnp.float32)
    Cs = Cs.astype(jnp.float32)

    def step(h, inp):
        # h: (B, K, D, N)
        u_t, da_t, b_t, c_t = inp  # (B,K,D), (B,K,D), (B,K,N), (B,K,N)
        a = jnp.exp(da_t[..., None] * A[None])  # (B,K,D,N)
        b = (da_t * u_t)[..., None] * b_t[..., None, :]
        h = a * h + b
        y = jnp.einsum("bkdn,bkn->bkd", h, c_t, precision="highest")
        return h, y

    B, K, L, D = u.shape
    N = A.shape[-1]
    h0 = jnp.zeros((B, K, D, N), jnp.float32)
    xs = (
        jnp.moveaxis(u, 2, 0),
        jnp.moveaxis(da, 2, 0),
        jnp.moveaxis(Bs, 2, 0),
        jnp.moveaxis(Cs, 2, 0),
    )
    _, ys = jax.lax.scan(step, h0, xs)
    y = jnp.moveaxis(ys, 0, 2)  # (B,K,L,D)
    return y + D_skip[None, :, None, :] * u


def _chunk_body(h0, u, da, bmat, cmat, A, D_skip):
    """One chunk: u,da (T,D); bmat,cmat (T,N); h0 (D,N). fp32 in/out.

    Work-efficient two-pass evaluation (same structure as the Pallas kernel
    in scan_pallas.py): the chunk is split into R subsegments of S steps.
    Pass 1 runs S unrolled steps vectorized over (R, N, D) to get each
    subsegment's transition; a log-depth combine over R yields entering
    states; pass 2 recomputes and emits y. Compared to a naive
    `associative_scan` over (T, D, N) (log T full-size passes), HBM traffic
    drops ~4x — the dominant cost of the scan on TPU.
    """
    T, D = u.shape
    N = A.shape[-1]
    S = 8 if T % 8 == 0 else 1
    R = T // S
    u4 = u.reshape(R, S, D)
    da4 = da.reshape(R, S, D)
    b4 = bmat.reshape(R, S, N)
    c4 = cmat.reshape(R, S, N)

    def step_ab(i):
        dai = da4[:, i, :][:, None, :]  # (R, 1, D)
        ai = jnp.exp(dai * A.transpose(1, 0)[None])  # (R, N, D)
        bi = (dai * u4[:, i, :][:, None, :]) * b4[:, i, :][:, :, None]
        return ai, bi

    pa, pb = step_ab(0)
    for i in range(1, S):
        ai, bi = step_ab(i)
        pa = pa * ai
        pb = ai * pb + bi

    # Inclusive scan over the R subsegment transitions (small arrays).
    sa, sb = pa, pb
    s = 1
    while s < R:
        ident = jnp.ones((s, N, D), sa.dtype)
        zero = jnp.zeros((s, N, D), sb.dtype)
        sa_sh = jnp.concatenate([ident, sa[:-s]], axis=0)
        sb_sh = jnp.concatenate([zero, sb[:-s]], axis=0)
        sb = sb + sa * sb_sh
        sa = sa * sa_sh
        s *= 2

    h0_nd = h0.transpose(1, 0)  # (N, D)
    ex_a = jnp.concatenate([jnp.ones((1, N, D), sa.dtype), sa[:-1]], axis=0)
    ex_b = jnp.concatenate([jnp.zeros((1, N, D), sb.dtype), sb[:-1]], axis=0)
    H = ex_a * h0_nd[None] + ex_b  # entering state per subsegment (R, N, D)
    h_last = sa[R - 1] * h0_nd + sb[R - 1]

    h = H
    ys = []
    for i in range(S):
        ai, bi = step_ab(i)
        h = ai * h + bi
        yi = jnp.einsum("rnd,rn->rd", h, c4[:, i, :],
                        precision="highest" if h.dtype == jnp.float32 else "default")
        ys.append(yi + D_skip[None, :] * u4[:, i, :])
    y = jnp.stack(ys, axis=1).reshape(T, D)
    return h_last.transpose(1, 0), y


def selective_scan_chunked(u, delta, A, Bs, Cs, D_skip, delta_bias, chunk=256,
                           scan_dtype=jnp.float32, h0=None, return_final=False):
    """Chunked scan: sequential over chunks, parallel (log-depth) inside.

    h0: optional entry state (B, K, D, N) — used by the sequence-sharded
    mesh scan, which corrects each shard's local scan with the carry from
    the shard before it. return_final=True also returns the exit state."""
    B, K, L, D = u.shape
    N = A.shape[-1]
    f = scan_dtype
    da = jax.nn.softplus(delta.astype(jnp.float32) + delta_bias[None, :, None, :]).astype(f)
    u = u.astype(f)
    Bs = Bs.astype(f)
    Cs = Cs.astype(f)
    A = A.astype(f)
    D_skip = D_skip.astype(f)

    pad = (-L) % chunk
    if pad:
        # Padded steps are identity transitions: u=0 -> b=0; da=0 -> a=1.
        u = jnp.pad(u, ((0, 0), (0, 0), (0, pad), (0, 0)))
        da = jnp.pad(da, ((0, 0), (0, 0), (0, pad), (0, 0)))
        Bs = jnp.pad(Bs, ((0, 0), (0, 0), (0, pad), (0, 0)))
        Cs = jnp.pad(Cs, ((0, 0), (0, 0), (0, pad), (0, 0)))
    Lp = L + pad
    nc = Lp // chunk

    def to_chunks(x):  # (B,K,Lp,F) -> (nc, B, K, T, F)
        return jnp.moveaxis(x.reshape(B, K, nc, chunk, x.shape[-1]), 2, 0)

    body = jax.checkpoint(
        jax.vmap(jax.vmap(_chunk_body, in_axes=(0, 0, 0, 0, 0, 0, 0)),
                 in_axes=(0, 0, 0, 0, 0, None, None)),
        static_argnums=(),
    )

    def scan_step(h, inp):
        cu, cda, cb, cc = inp
        h, y = body(h, cu, cda, cb, cc, A, D_skip)
        return h, y

    if h0 is None:
        h0 = jnp.zeros((B, K, D, N), f)
    else:
        h0 = h0.astype(f)
    h_last, ys = jax.lax.scan(
        scan_step, h0, (to_chunks(u), to_chunks(da), to_chunks(Bs), to_chunks(Cs))
    )
    # ys: (nc, B, K, T, D) -> (B, K, Lp, D)
    # Output stays in scan_dtype; callers cast (avoids a full-size f32
    # round trip in bf16 mode).
    y = jnp.moveaxis(ys, 0, 2).reshape(B, K, Lp, D)
    y = y[:, :, :L]
    if return_final:
        return y, h_last
    return y


def selective_scan_par(u, delta, A, Bs, Cs, D_skip, delta_bias, sub=16,
                       scan_dtype=jnp.float32):
    """Fully-parallel scan: NO sequential chunk loop.

    The sequence is split into R = L/sub subsegments of `sub` steps. Phase A
    computes every subsegment's transition with `sub` unrolled steps
    vectorized over (B, K, R, N, D); phase B is a log-depth doubling scan
    over the R transitions; phase C replays the `sub` steps with the correct
    entering states and emits y. Sequential depth is 2*sub + log2(R) LARGE
    ops — on TPU this is bandwidth-bound instead of latency-bound, which
    makes it ~4x faster than the lax.scan-over-chunks variant at small L
    (dispatch overhead) and equal at large L.

    `scan_dtype` controls the working arrays (bf16 halves HBM traffic; the
    reference semantics are fp32 — keep float32 for bit-parity).
    """
    B, K, L, D = u.shape
    N = A.shape[-1]
    f = scan_dtype
    da = jax.nn.softplus(delta.astype(jnp.float32) + delta_bias[None, :, None, :])
    u = u.astype(f)
    da = da.astype(f)
    Bs = Bs.astype(f)
    Cs = Cs.astype(f)
    At = A.astype(f).transpose(0, 2, 1)  # (K, N, D)

    S = sub
    pad = (-L) % S
    if pad:
        u = jnp.pad(u, ((0, 0), (0, 0), (0, pad), (0, 0)))
        da = jnp.pad(da, ((0, 0), (0, 0), (0, pad), (0, 0)))
        Bs = jnp.pad(Bs, ((0, 0), (0, 0), (0, pad), (0, 0)))
        Cs = jnp.pad(Cs, ((0, 0), (0, 0), (0, pad), (0, 0)))
    Lp = L + pad
    R = Lp // S
    u5 = u.reshape(B, K, R, S, D)
    da5 = da.reshape(B, K, R, S, D)
    b5 = Bs.reshape(B, K, R, S, N)
    c5 = Cs.reshape(B, K, R, S, N)

    # LAYOUT NOTE (measured on v5e): keep the working arrays 5-D
    # (B, K, R, N, D). With N=16/D=64 the (N, D) minor dims tile as
    # (16 sublanes, 64->128 lanes): 2x lane padding, but every broadcast
    # below fuses into its consumer. A flat (B, K, R, N*D) layout packs
    # lanes perfectly but the tile/repeat+reshape boundaries block XLA
    # fusion and materialize full-size copies per step — measured ~30%
    # slower end to end.
    def step_ab(i):
        dai = da5[:, :, :, i, :][:, :, :, None, :]  # (B,K,R,1,D)
        ai = jnp.exp(dai * At[None, :, None])  # (B,K,R,N,D)
        bi = (dai * u5[:, :, :, i, :][:, :, :, None, :]) * b5[:, :, :, i, :][..., None]
        return ai, bi

    # Phase A: subsegment transitions.
    pa, pb = step_ab(0)
    for i in range(1, S):
        ai, bi = step_ab(i)
        pa = pa * ai
        pb = ai * pb + bi

    # Phase B: doubling scan over R (axis 2). Global h0 = 0, so only the
    # b-part of the exclusive prefix matters for entering states.
    sa, sb = pa, pb
    s = 1
    while s < R:
        pad_a = jnp.ones((B, K, s, N, D), f)
        pad_b = jnp.zeros((B, K, s, N, D), f)
        sa_sh = jnp.concatenate([pad_a, sa[:, :, :-s]], axis=2)
        sb_sh = jnp.concatenate([pad_b, sb[:, :, :-s]], axis=2)
        sb = sb + sa * sb_sh
        sa = sa * sa_sh
        s *= 2
    H = jnp.concatenate([jnp.zeros((B, K, 1, N, D), f), sb[:, :, :-1]], axis=2)

    # Phase C: replay with entering states, emit y.
    h = H
    ys = []
    for i in range(S):
        ai, bi = step_ab(i)
        h = ai * h + bi
        yi = jnp.einsum("bkrnd,bkrn->bkrd", h, c5[:, :, :, i, :],
                        precision="highest" if h.dtype == jnp.float32 else "default")
        ys.append(yi + D_skip.astype(f)[None, :, None, :] * u5[:, :, :, i, :])
    y = jnp.stack(ys, axis=3).reshape(B, K, Lp, D)  # stays in scan_dtype
    return y[:, :, :L] if pad else y


def selective_scan(u, delta, A, Bs, Cs, D_skip, delta_bias, impl="chunked",
                   chunk=256, sub=16, scan_dtype=jnp.float32):
    """Dispatch to an implementation. See module docstring for layouts."""
    if impl == "ref":
        return selective_scan_ref(u, delta, A, Bs, Cs, D_skip, delta_bias)
    if impl == "chunked":
        return selective_scan_chunked(u, delta, A, Bs, Cs, D_skip, delta_bias,
                                      chunk=chunk, scan_dtype=scan_dtype)
    if impl == "par":
        return selective_scan_par(u, delta, A, Bs, Cs, D_skip, delta_bias,
                                  sub=sub, scan_dtype=scan_dtype)
    if impl == "pallas":
        return _scan_pallas_diff(u, delta, A, Bs, Cs, D_skip, delta_bias)
    raise ValueError(f"unknown selective_scan impl: {impl!r}")


# Pallas forward + Pallas backward (reverse-scan kernel). The forward saves
# the chunk-entry carries as residuals; the backward recomputes per-chunk
# states from them and runs the gradient recurrence in reverse
# (see scan_pallas.py `_scan_bwd_kernel`).
@jax.custom_vjp
def _scan_pallas_diff(u, delta, A, Bs, Cs, D_skip, delta_bias):
    from wavemamba_tpu.ops.scan_pallas import selective_scan_pallas

    return selective_scan_pallas(u, delta, A, Bs, Cs, D_skip, delta_bias, chunk=256)


def _scan_pallas_fwd(u, delta, A, Bs, Cs, D_skip, delta_bias):
    from wavemamba_tpu.ops.scan_pallas import selective_scan_pallas

    y, carries = selective_scan_pallas(
        u, delta, A, Bs, Cs, D_skip, delta_bias, chunk=256, return_carries=True
    )
    return y, (u, delta, A, Bs, Cs, D_skip, delta_bias, carries)


def _scan_pallas_bwd(res, dy):
    from wavemamba_tpu.ops.scan_pallas import selective_scan_pallas_bwd

    u, delta, A, Bs, Cs, D_skip, delta_bias, carries = res
    return selective_scan_pallas_bwd(
        u, delta, A, Bs, Cs, D_skip, delta_bias, carries, dy, chunk=256
    )


_scan_pallas_diff.defvjp(_scan_pallas_fwd, _scan_pallas_bwd)
