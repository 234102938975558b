"""Sequence-sharded selective scan over a device mesh.

The recurrence h_t = a_t h_{t-1} + b_t looks serial, but segments compose
associatively, so the token axis L can be sharded across chips (SURVEY §5
long-context extension; the reference is single-GPU and has no counterpart
— its only >GPU-memory path, `test_tile`, crashes as shipped).

Mesh-level two-pass (mirrors the in-chunk two-pass of ops/scan.py at a
coarser level):

  pass 1  every shard scans its local segment with h0 = 0, producing the
          local outputs, its exit state h_seg, and its aggregate decay
          a_seg = exp((sum_t da_t) * A) — (B, K, D, N) scalars-per-state,
          ~KB-sized regardless of L.
  gather  one all_gather of (a_seg, h_seg) over the mesh axis (ICI; tiny).
  prefix  each shard combines the transitions of the shards before it into
          its true entry state h0_i (O(n) elementwise ops on tiny arrays).
  pass 2  every shard re-scans its segment from h0_i.

2x local compute, perfectly parallel: n shards give ~n/2 end-to-end
speedup for L too large for one chip. Exact (same math as the global
scan; fp reassociation only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from wavemamba_tpu.ops.scan import selective_scan_chunked


def selective_scan_seq_sharded(u, delta, A, Bs, Cs, D_skip, delta_bias,
                               mesh, axis="data", chunk=256,
                               scan_dtype=jnp.float32):
    """Public-layout selective scan with L sharded over `mesh[axis]`.

    u, delta: (B, K, L, D); Bs, Cs: (B, K, L, N); A: (K, D, N);
    D_skip, delta_bias: (K, D). L must divide by the axis size.
    """
    n = mesh.shape[axis]
    B, K, L, D = u.shape
    if L % n:
        raise ValueError(f"L={L} must divide by mesh axis size {n}")

    seq = P(None, None, axis, None)
    rep = P()

    def local(u_s, dlt_s, A_, Bs_s, Cs_s, Dk_, bias_):
        Bl, Kl = u_s.shape[0], u_s.shape[1]
        Dl, Nl = u_s.shape[-1], A_.shape[-1]
        # zero entry state, marked varying over the mesh axis so the
        # lax.scan carry type matches its (varying) inputs.
        zero_h = jax.lax.pcast(
            jnp.zeros((Bl, Kl, Dl, Nl), scan_dtype), (axis,), to="varying"
        )
        # pass 1: local scan from zero + segment transition.
        _, h_seg = selective_scan_chunked(
            u_s, dlt_s, A_, Bs_s, Cs_s, Dk_, bias_, chunk=chunk,
            scan_dtype=scan_dtype, return_final=True, h0=zero_h,
        )
        da_sum = jax.nn.softplus(
            dlt_s.astype(jnp.float32) + bias_[None, :, None, :]
        ).sum(axis=2)  # (B, K, D)
        a_seg = jnp.exp(da_sum[..., None] * A_[None].astype(jnp.float32))

        idx = lax.axis_index(axis)
        a_all = lax.all_gather(a_seg, axis)  # (n, B, K, D, N)
        h_all = lax.all_gather(h_seg.astype(jnp.float32), axis)

        # exclusive prefix: h0_i = sum_{j<i} (prod_{j<k<i} a_k) h_j
        carry = jnp.zeros_like(h_all[0])
        h0 = jnp.zeros_like(h_all[0])
        for j in range(n):
            h0 = jnp.where(idx == j, carry, h0)
            carry = a_all[j] * carry + h_all[j]

        # pass 2: re-scan from the true entry state.
        return selective_scan_chunked(
            u_s, dlt_s, A_, Bs_s, Cs_s, Dk_, bias_, chunk=chunk,
            scan_dtype=scan_dtype, h0=h0.astype(scan_dtype),
        )

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(seq, seq, rep, seq, seq, rep, rep),
        out_specs=seq,
    )
    out_sharding = NamedSharding(mesh, seq)
    args = [
        jax.device_put(u, out_sharding),
        jax.device_put(delta, out_sharding),
        jax.device_put(A, NamedSharding(mesh, rep)),
        jax.device_put(Bs, out_sharding),
        jax.device_put(Cs, out_sharding),
        jax.device_put(D_skip, NamedSharding(mesh, rep)),
        jax.device_put(delta_bias, NamedSharding(mesh, rep)),
    ]
    return fn(*args)
