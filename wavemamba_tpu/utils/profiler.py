"""Profiling / tracing hooks — the observability layer the reference lacks
(SURVEY.md §5: only wall-clock AvgTimer). Wraps jax.profiler so training
and inference can emit XLA traces viewable in TensorBoard/Perfetto."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in traces (use as context manager)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Per-step wall timing with a device fence (sums a tiny reduction to
    force completion — see bench.py note about block_until_ready on the
    tunneled platform)."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def step(self, result_fn=None):
        t0 = time.perf_counter()
        yield
        if result_fn is not None:
            result_fn()
        self.times.append(time.perf_counter() - t0)

    def summary(self):
        import numpy as np

        t = np.asarray(self.times[1:] or self.times)
        return {"mean_s": float(t.mean()), "p50_s": float(np.median(t)),
                "min_s": float(t.min()), "n": len(self.times)}
