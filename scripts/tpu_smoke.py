"""On-hardware Pallas kernel smoke test.

CI runs the kernels in interpret mode only (Mosaic does not compile
through the remote-compile tunnel used by CPU test machines), so a Mosaic
lowering regression would otherwise ship silently. Run this at the start
of every real-TPU session (takes ~2 min of compiles, seconds of compute):

    python scripts/tpu_smoke.py

Checks, each against the XLA reference implementation:
  * unfused forward kernel (selective_scan_pallas)
  * unfused backward kernel through the custom VJP (impl='pallas')
  * combined-lane fused pair kernel (ss2d_scan_fused), incl. the
    antidiagonal-permutation reversal exactness
  * fused VJP backward kernel (ss2d_scan_fused_diff grads)
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from wavemamba_tpu.ops.scan import selective_scan
    from wavemamba_tpu.ops.scan_pallas import (
        selective_scan_pallas,
        ss2d_scan_fused,
        ss2d_scan_fused_diff,
    )

    print("devices:", jax.devices(), flush=True)
    rs = np.random.RandomState(0)
    B, K, L, D, N, R = 1, 4, 1024, 64, 16, 2
    u = jnp.asarray(rs.rand(B, K, L, D), jnp.float32) * 0.5
    dt = jnp.asarray(rs.rand(B, K, L, D), jnp.float32) * 0.5
    A = -jnp.exp(jnp.asarray(rs.rand(K, D, N), jnp.float32))
    Bs = jnp.asarray(rs.rand(B, K, L, N), jnp.float32) * 0.3
    Cs = jnp.asarray(rs.rand(B, K, L, N), jnp.float32) * 0.3
    Dsk = jnp.asarray(rs.rand(K, D), jnp.float32)
    bias = jnp.asarray(rs.rand(K, D), jnp.float32) * 0.1

    y_ref = selective_scan(u, dt, A, Bs, Cs, Dsk, bias, impl="ref")
    y_pal = selective_scan_pallas(u, dt, A, Bs, Cs, Dsk, bias, chunk=256, sub=8)
    err = float(jnp.max(jnp.abs(y_ref - y_pal)))
    print(f"unfused fwd kernel: max err {err:.2e}")
    assert err < 5e-4, err

    def loss(impl):
        def f(u, dt, A):
            y = selective_scan(u, dt, A, Bs, Cs, Dsk, bias, impl=impl)
            return jnp.sum(y * y)
        return f

    g_pal = jax.grad(loss("pallas"), argnums=(0, 1, 2))(u, dt, A)
    g_ref = jax.grad(loss("ref"), argnums=(0, 1, 2))(u, dt, A)
    for gp, gr, nm in zip(g_pal, g_ref, ("du", "ddt", "dA")):
        rel = float(jnp.max(jnp.abs(gp - gr)) / (jnp.max(jnp.abs(gr)) + 1e-9))
        print(f"unfused bwd kernel {nm}: rel err {rel:.2e}")
        assert rel < 5e-3, (nm, rel)

    # fused pair kernel + its VJP
    x = jnp.asarray(rs.rand(1, 4096, D), jnp.float32) * 0.5
    wx = jnp.asarray(rs.rand(2, D, R + 2 * N), jnp.float32) * 0.1
    dtw = jnp.asarray(rs.rand(2, R, D), jnp.float32) * 0.1
    A2 = -jnp.exp(jnp.asarray(rs.rand(2, N, D), jnp.float32))
    ds2 = jnp.asarray(rs.rand(2, D), jnp.float32)
    b2 = jnp.asarray(rs.rand(2, D), jnp.float32) * 0.1

    def pair_ref(x, wx, dtw, bias2, A2, ds2):
        xd = jnp.einsum("bld,kdc->bklc", x, wx)
        dts = jnp.einsum("bklr,krd->bkld", xd[..., :R], dtw)
        Bs2, Cs2 = xd[..., R:R + N], xd[..., R + N:]
        u2 = jnp.stack([x, x[:, ::-1]], 1)
        dts = jnp.stack([dts[:, 0], dts[:, 1, ::-1]], 1)
        Bs2 = jnp.stack([Bs2[:, 0], Bs2[:, 1, ::-1]], 1)
        Cs2 = jnp.stack([Cs2[:, 0], Cs2[:, 1, ::-1]], 1)
        y = selective_scan(u2, dts, A2.transpose(0, 2, 1), Bs2, Cs2, ds2,
                           bias2, impl="ref")
        return jnp.stack([y[:, 0], y[:, 1, ::-1]], 1)

    y_f = ss2d_scan_fused(x, wx, dtw, b2, A2, ds2, chunk=256, sub=8)
    y_r = pair_ref(x, wx, dtw, b2, A2, ds2)
    err = float(jnp.max(jnp.abs(y_f - y_r)))
    print(f"fused pair kernel: max err {err:.2e}")
    assert err < 5e-4, err

    # bf16 y streaming (fast() default): round-then-permute must equal the
    # f32 y rounded elementwise — a permutation only moves values, so the
    # single-pass bf16 MXU path is exact. Also rides the bf16 input-permute.
    y16 = ss2d_scan_fused(x.astype(jnp.bfloat16), wx, dtw, b2, A2, ds2,
                          chunk=256, sub=8, out_dtype=jnp.bfloat16)
    y32 = ss2d_scan_fused(x.astype(jnp.bfloat16), wx, dtw, b2, A2, ds2,
                          chunk=256, sub=8)
    derr = float(jnp.max(jnp.abs(
        y32.astype(jnp.bfloat16).astype(jnp.float32) -
        y16.astype(jnp.float32))))
    print(f"fused pair bf16-y round-then-permute identity: max|d| {derr:.1e}")
    assert derr == 0.0, derr

    dy = jnp.asarray(rs.rand(1, 2, 4096, D), jnp.float32)

    def lp(*a):
        # interpret=None -> auto: Mosaic on TPU, interpret on CPU (lets the
        # CPU suite regression-test these exact checks, tests/test_tpu_smoke.py)
        return jnp.sum(ss2d_scan_fused_diff(*a, 128, 8, None) * dy)

    def lr(*a):
        return jnp.sum(pair_ref(*a) * dy)

    gp = jax.grad(lp, argnums=tuple(range(6)))(x, wx, dtw, b2, A2, ds2)
    gr = jax.grad(lr, argnums=tuple(range(6)))(x, wx, dtw, b2, A2, ds2)
    for a, b, nm in zip(gp, gr, ("dx", "dwx", "ddtw", "dbias", "dA", "ddsk")):
        rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-12))
        print(f"fused bwd kernel {nm}: rel err {rel:.2e}")
        assert rel < 5e-3, (nm, rel)

    print("TPU SMOKE OK")


if __name__ == "__main__":
    main()
