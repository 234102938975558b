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

Three implementations behind one dispatcher:
  * ``ref``     — step-by-step `lax.scan`; exact, O(L) sequential. Test anchor.
  * ``chunked`` — `lax.scan` over chunks with a log-depth associative scan
                  inside each chunk; differentiable, rematerialized per chunk.
                  Default for training and CPU.
  * ``pallas``  — fused Pallas TPU kernel (see `scan_pallas.py`); forward is
                  the kernel, backward replays the chunked impl via custom VJP.
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
    """One chunk: u,da (T,D); bmat,cmat (T,N); h0 (D,N). fp32 in/out."""
    a = jnp.exp(da[:, :, None] * A[None])  # (T, D, N)
    b = (da * u)[:, :, None] * bmat[:, None, :]  # (T, D, N)
    a_cum, b_cum = jax.lax.associative_scan(_combine, (a, b), axis=0)
    h = a_cum * h0[None] + b_cum  # (T, D, N)
    y = jnp.einsum("tdn,tn->td", h, cmat, precision="highest") + D_skip[None, :] * u
    return h[-1], y


def selective_scan_chunked(u, delta, A, Bs, Cs, D_skip, delta_bias, chunk=256):
    """Chunked scan: sequential over chunks, parallel (log-depth) inside."""
    B, K, L, D = u.shape
    N = A.shape[-1]
    u = u.astype(jnp.float32)
    da = jax.nn.softplus(delta.astype(jnp.float32) + delta_bias[None, :, None, :])
    Bs = Bs.astype(jnp.float32)
    Cs = Cs.astype(jnp.float32)
    A = A.astype(jnp.float32)

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

    h0 = jnp.zeros((B, K, D, N), jnp.float32)
    _, ys = jax.lax.scan(scan_step, h0, (to_chunks(u), to_chunks(da), to_chunks(Bs), to_chunks(Cs)))
    # ys: (nc, B, K, T, D) -> (B, K, Lp, D)
    y = jnp.moveaxis(ys, 0, 2).reshape(B, K, Lp, D)
    return y[:, :, :L]


def selective_scan(u, delta, A, Bs, Cs, D_skip, delta_bias, impl="chunked", chunk=256):
    """Dispatch to an implementation. See module docstring for layouts."""
    if impl == "ref":
        return selective_scan_ref(u, delta, A, Bs, Cs, D_skip, delta_bias)
    if impl == "chunked":
        return selective_scan_chunked(u, delta, A, Bs, Cs, D_skip, delta_bias, chunk=chunk)
    if impl == "pallas":
        return _scan_pallas_diff(u, delta, A, Bs, Cs, D_skip, delta_bias)
    raise ValueError(f"unknown selective_scan impl: {impl!r}")


# Pallas forward with a differentiable fallback backward: the VJP replays the
# chunked implementation (numerically identical recurrence) and
# differentiates it. Gives kernel-speed forward everywhere; a dedicated
# backward kernel can swap in behind the same interface.
@jax.custom_vjp
def _scan_pallas_diff(u, delta, A, Bs, Cs, D_skip, delta_bias):
    from wavemamba_tpu.ops.scan_pallas import selective_scan_pallas

    return selective_scan_pallas(u, delta, A, Bs, Cs, D_skip, delta_bias)


def _scan_pallas_fwd(u, delta, A, Bs, Cs, D_skip, delta_bias):
    return _scan_pallas_diff(u, delta, A, Bs, Cs, D_skip, delta_bias), (
        u, delta, A, Bs, Cs, D_skip, delta_bias,
    )


def _scan_pallas_bwd(res, g):
    _, vjp = jax.vjp(selective_scan_chunked, *res)
    return vjp(g)


_scan_pallas_diff.defvjp(_scan_pallas_fwd, _scan_pallas_bwd)
