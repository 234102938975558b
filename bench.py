"""Headline benchmark: WaveMamba (shipped config) 1080p single-image
inference latency on one TPU chip.

Baseline: the reference reports 0.402 s for a 1920x1080 forward on a CUDA
GPU (`ACMMM2024Rebuttal_revised1.pdf` Table 2; BASELINE.md). vs_baseline is
baseline_seconds / our_seconds (>1 means faster than the reference GPU).

Methodology (steady-state): dispatch K frames back-to-back and fence once
on the last frame's in-program reduction, divide by K. JAX dispatch is
async, so the device executes the queue serially while the host dispatches
ahead — per-frame time converges to the true device latency (202 ms
measured vs 201 ms from the jax.profiler device trace, BENCH_NOTES.md).
A per-iteration sync fence instead adds one tunnel dispatch+fence RTT
(~25 ms, a sandbox artifact of the tunneled `axon` platform — absent on
any real TPU host) to every frame; that number is still printed on stderr
for comparability with rounds 1-2, which used the sync methodology.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_1080P_S = 0.402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wavemamba_tpu.models.wavemamba import (
        WaveMambaConfig,
        init_wavemamba,
        wavemamba_apply,
    )

    mode = os.environ.get("WM_MODE", "fast")
    if mode == "fast":  # Pallas kernel + bf16 convs
        cfg = WaveMambaConfig.fast()
    elif mode == "fast_xla":  # no Pallas (portable)
        cfg = WaveMambaConfig.fast_xla()
    else:  # 'parity': full fp32, bit-parity with the reference
        cfg = WaveMambaConfig()
    params = init_wavemamba(jax.random.PRNGKey(0), cfg)
    # The fence-sum lives INSIDE the jitted program: on the tunneled axon
    # platform block_until_ready() returns before execution finishes, so a
    # host transfer of a device reduction is the only reliable fence. Fusing
    # the reduction into the forward saves one dispatch round-trip per
    # measurement (the scalar transfer is the fence).
    def make_fwd(cfg):
        def _fwd(p, x):
            y = wavemamba_apply(p, cfg, x)
            # Tiny-slice reduction: transferring any output awaits the whole
            # executable, so this fences full execution at negligible cost.
            return y, jnp.sum(y[..., :1, :1, :])

        return jax.jit(_fwd)

    fwd = make_fwd(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 1080, 1920, 3), jnp.float32)

    def run_sync():
        return float(fwd(params, x)[1])

    try:
        run_sync()  # compile
    except Exception as e:
        # The scan_chunk=512 compile occasionally fails TRANSIENTLY through
        # the remote-compile service (observed 2026-08-18: JaxRuntimeError on
        # the first attempt, identical program compiled clean on retry), so
        # retry the same chunk once before degrading to 256.
        if mode != "fast" or getattr(cfg, "scan_chunk", None) == 256:
            raise
        print(f"# chunk={cfg.scan_chunk} compile failed ({type(e).__name__}); "
              "retrying same chunk once", file=sys.stderr)
        try:
            fwd = make_fwd(cfg)  # fresh jit cache entry forces a recompile
            run_sync()
        except Exception as e2:
            print(f"# chunk={cfg.scan_chunk} retry failed "
                  f"({type(e2).__name__}); degrading to chunk=256",
                  file=sys.stderr)
            cfg = WaveMambaConfig.fast(scan_chunk=256)
            fwd = make_fwd(cfg)
            run_sync()
    run_sync()  # warmup

    # Legacy per-iteration sync number (rounds 1-2 methodology): stderr only.
    sync_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_sync()
        sync_times.append(time.perf_counter() - t0)
    print(f"# sync-fenced per-iter: {np.median(sync_times):.5f} s "
          "(includes ~25 ms/iter tunnel RTT)", file=sys.stderr)

    # Steady-state: K frames in flight, one fence on the last.
    K = 10
    times = []
    for _ in range(3):
        run_sync()  # drain the queue so t0 starts from an idle device
        t0 = time.perf_counter()
        fences = [fwd(params, x)[1] for _ in range(K)]
        float(fences[-1])  # the transfer awaits all K executions
        times.append((time.perf_counter() - t0) / K)
    latency = float(np.median(times))

    # Device-side truth (VERDICT r3 #10): capture a jax.profiler trace of a
    # few iterations and report total device op time per iter alongside the
    # host-measured value, so no future methodology change can shift the
    # headline silently. Best-effort — skipped if tracing is unavailable.
    device_ms = None
    try:
        import shutil

        tracedir = "/tmp/wm_bench_trace"
        shutil.rmtree(tracedir, ignore_errors=True)
        n_trace = 3
        with jax.profiler.trace(tracedir):
            fences = [fwd(params, x)[1] for _ in range(n_trace)]
            float(fences[-1])
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                        "scripts"))
        import trace_topops

        trace, _ = trace_topops.load_trace(tracedir)
        total = sum(e.get("dur", 0) / 1e3
                    for e in trace_topops.device_op_events(trace))
        if total > 0:
            device_ms = round(total / n_trace, 1)
    except Exception as e:  # tracing is diagnostics, never fail the bench
        print(f"# device trace unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)

    result = {
        "metric": f"wavemamba_1080p_latency({mode})",
        "value": round(latency, 5),
        "unit": "s",
        "vs_baseline": round(BASELINE_1080P_S / latency, 3),
    }
    if device_ms is not None:
        result["device_ms"] = device_ms
    print(json.dumps(result))


if __name__ == "__main__":
    main()
