"""Sweep the 1x1-conv lowering policy per region on the real chip.

The r3 device profile attributes ~38 ms @1080p to layout relayout copies
(conv-layout <-> token-matmul-layout ping-pong). The matmul lowering of 1x1
convs is 13x faster per op, but 1x1s adjacent to depthwise convs force a
round trip out of XLA's conv tiling; `WaveMambaConfig.conv1x1_as_conv`
re-expresses those sites as convs so the chain stays in one layout.

Usage (tunnel rules: background, no timeout):
    python scripts/tpu_1x1_sweep.py > /tmp/sweep1x1.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wavemamba_tpu.models.wavemamba import (
    WaveMambaConfig,
    init_wavemamba,
    wavemamba_apply,
)

VARIANTS = [(), ("ffn",), ("hfe",), ("ffn", "hfe")]


def bench_variant(sites, reps=3, K=10):
    cfg = WaveMambaConfig.fast(conv1x1_as_conv=sites)
    params = init_wavemamba(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def fwd(p, x):
        y = wavemamba_apply(p, cfg, x)
        # Return full y alongside the fence slice (exactly bench.py's
        # program shape) so XLA cannot dead-code-eliminate tail-of-network
        # work that doesn't feed the tiny reduction (ADVICE r3).
        return y, jnp.sum(y[..., :1, :1, :])

    x = jnp.asarray(np.random.RandomState(0).rand(1, 1080, 1920, 3), jnp.float32)
    float(fwd(params, x)[1])  # compile
    float(fwd(params, x)[1])  # warmup
    # Steady-state pipelined methodology (bench.py): K frames in flight,
    # one fence — converges to device truth, so ~5 ms layout differences
    # are visible above the ~25 ms tunnel RTT jitter of per-iter sync.
    ts = []
    for _ in range(reps):
        float(fwd(params, x)[1])  # drain the queue
        t0 = time.perf_counter()
        fences = [fwd(params, x)[1] for _ in range(K)]
        float(fences[-1])
        ts.append((time.perf_counter() - t0) / K)
    return float(np.median(ts))


def main():
    print("devices:", jax.devices(), flush=True)
    for sites in VARIANTS:
        t = bench_variant(sites)
        print(f"conv1x1_as_conv={sites!r:18} 1080p median {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
