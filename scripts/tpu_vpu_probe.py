"""VPU/MXU throughput probes at the scan kernel's shapes (VERDICT r3 #1).

The r3 profile pinned `ss2d_scan_fused` at ~0.79 effective f32 Tops
(12.7 Gop per L=518k pair-call / 16.16 ms) and called that "near f32 VPU
peak". Before attempting (or declaring impossible) the chunked-SSD/MXU
reformulation, this probe measures what a Pallas kernel can ACTUALLY
sustain on this v5e for each op pattern the kernel uses:

  * flat      — K fused multiply-adds on a (T, 128) f32 block: the
                upper bound for any elementwise reformulation.
  * shaped    — the same MACs issued the way the scan kernel issues them:
                an S-step python loop over per-step slices of a
                (R, S, N, 2D)-reshaped array (pass-1's access pattern).
  * exp       — K exp() calls chained on (T, 128): transcendental
                throughput (r3 anatomy said exp is ~free; quantify).
  * nsum      — the y-emission pattern: multiply by C and reduce over
                the N=16 axis of an (R, N, 2D) array.
  * mxu_seg   — the SSD candidate's within-segment prefix as ONE
                (S, S) x (S, R*N*2D) matmul incl. the in-kernel
                transpose to S-major layout (measures whether the
                relayout eats the MXU win).

Each probe reports sustained Gop/s (1 op = 1 multiply or add; an FMA
counts as 2). Run ON the real chip (axon), one process at a time:

    python scripts/tpu_vpu_probe.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, N, D2 = 512, 16, 128  # chunk tokens, states, packed lanes (2*D)
S = 8
R = T // S
GRID = 128  # blocks per timing run


def _time_call(fn, *args, iters=3):
    out = fn(*args)
    fence = float(jnp.sum(out[0, :1, :1]))  # compile+warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        fence = float(jnp.sum(out[0, :1, :1]))
        ts.append(time.perf_counter() - t0)
    del fence
    return float(np.median(ts))


def probe_flat(K=48):
    """K FMAs on (T, N*D2) f32 — peak elementwise throughput."""

    def kernel(x_ref, a_ref, o_ref):
        y = x_ref[...]
        a = a_ref[...]
        for _ in range(K):
            y = y * a + x_ref[...]
        o_ref[...] = y

    shape = (T, N * D2)
    x = jnp.asarray(np.random.default_rng(0).random((GRID, *shape), np.float32), jnp.float32)
    a = jnp.asarray(np.random.default_rng(0).random(shape, np.float32) * 0.5 + 0.5, jnp.float32)

    spec = pl.BlockSpec((1, *shape), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec(shape, lambda g: (0, 0), memory_space=pltpu.VMEM)
    f = jax.jit(
        lambda x, a: pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[spec, aspec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        )(x, a)
    )
    dt = _time_call(f, x, a)
    ops = GRID * T * N * D2 * K * 2
    return ops / dt / 1e9, dt


def probe_shaped(K=6):
    """pass-1's structure: K repeats of an S-step loop of mul+muladd on
    per-step slices of a (R, S, N, D2) view (3 ops per element per K)."""

    def kernel(x_ref, o_ref):
        x4 = x_ref[0].reshape(R, S, N, D2)
        pa = x4[:, 0]
        pb = x4[:, 0]
        for _ in range(K):
            for i in range(1, S):
                ai = x4[:, i]
                pa = pa * ai
                pb = ai * pb + x4[:, i]
        o_ref[0] = (pa + pb).reshape(1, T, N * D2)[0]

    shape = (T, N * D2)
    x = jnp.asarray(np.random.default_rng(0).random((GRID, *shape), np.float32) * 0.01 + 0.99, jnp.float32)
    spec = pl.BlockSpec((1, *shape), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    f = jax.jit(
        lambda x: pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        )(x)
    )
    dt = _time_call(f, x)
    ops = GRID * R * (S - 1) * N * D2 * K * 3
    return ops / dt / 1e9, dt


def probe_exp(K=16):
    """K chained exp(y * a) — transcendental throughput (counted 1 op/exp
    + 1 mul)."""

    def kernel(x_ref, a_ref, o_ref):
        y = x_ref[...]
        a = a_ref[...]
        for _ in range(K):
            y = jnp.exp(y * a)
        o_ref[...] = y

    shape = (T, N * D2)
    x = jnp.asarray(np.random.default_rng(0).random((GRID, *shape), np.float32) * -0.5, jnp.float32)
    a = jnp.asarray(np.random.default_rng(0).random(shape, np.float32) * -0.5, jnp.float32)
    spec = pl.BlockSpec((1, *shape), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec(shape, lambda g: (0, 0), memory_space=pltpu.VMEM)
    f = jax.jit(
        lambda x, a: pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[spec, aspec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        )(x, a)
    )
    dt = _time_call(f, x, a)
    ops = GRID * T * N * D2 * K * 2
    return ops / dt / 1e9, dt


def probe_nsum(K=24):
    """y-emission pattern: K repeats of sum over N of (R, N, D2) * C."""

    def kernel(x_ref, c_ref, o_ref):
        x3 = x_ref[0].reshape(R * S, N, D2)
        c = c_ref[...].reshape(R * S, N, 1)
        acc = jnp.zeros((R * S, D2), jnp.float32)
        for k in range(K):
            acc = acc + jnp.sum(x3 * (c + float(k)), axis=1)
        o_ref[0] = jnp.broadcast_to(acc[:, None, :], (T, N, D2)).reshape(
            T, N * D2
        )

    shape = (T, N * D2)
    x = jnp.asarray(np.random.default_rng(0).random((GRID, *shape), np.float32), jnp.float32)
    c = jnp.asarray(np.random.default_rng(0).random((T, N), np.float32), jnp.float32)
    spec = pl.BlockSpec((1, *shape), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((T, N), lambda g: (0, 0), memory_space=pltpu.VMEM)
    f = jax.jit(
        lambda x, c: pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[spec, cspec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        )(x, c)
    )
    dt = _time_call(f, x, c)
    ops = GRID * T * N * D2 * K * 2  # mul + add-into-reduction
    return ops / dt / 1e9, dt


def probe_mxu_seg():
    """SSD candidate: within-segment inclusive prefix over s as ONE
    (S, S) x (S, R*N*D2) triangular matmul, incl. the transpose of the
    (R, S) major dims to S-major and back."""

    tri = jnp.asarray(np.tril(np.ones((S, S), np.float32)))

    def kernel(x_ref, tri_ref, o_ref):
        x4 = x_ref[0].reshape(R, S, N * D2)
        xs = x4.transpose(1, 0, 2).reshape(S, R * N * D2)
        cum = jax.lax.dot_general(
            tri_ref[...], xs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = (
            cum.reshape(S, R, N * D2).transpose(1, 0, 2).reshape(T, N * D2)
        )

    shape = (T, N * D2)
    x = jnp.asarray(np.random.default_rng(0).random((GRID, *shape), np.float32), jnp.float32)
    spec = pl.BlockSpec((1, *shape), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((S, S), lambda g: (0, 0), memory_space=pltpu.VMEM)
    f = jax.jit(
        lambda x, t: pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[spec, tspec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        )(x, tri)
    )
    dt = _time_call(f, x, tri)
    # equivalent elementwise work replaced: 1 add per element (a sequential
    # in-segment cumsum); report the rate of THAT to compare directly.
    ops = GRID * T * N * D2
    return ops / dt / 1e9, dt


def main():
    print("devices:", jax.devices(), flush=True)
    for name, fn in [
        ("flat FMA", probe_flat),
        ("shaped pass-1", probe_shaped),
        ("exp chain", probe_exp),
        ("N-sum emit", probe_nsum),
        ("mxu seg-prefix (eff. add-rate)", probe_mxu_seg),
    ]:
        try:
            gops, dt = fn()
            print(f"{name:32s} {gops:9.1f} Gop/s   ({dt*1e3:7.2f} ms/call)",
                  flush=True)
        except Exception as e:
            print(f"{name:32s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
