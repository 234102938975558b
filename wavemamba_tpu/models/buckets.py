"""Static-shape bucket ladder for mixed-size folders (SURVEY §7.4).

Every distinct padded shape costs a full XLA compile (minutes through a
tunneled device), so instead of padding each image to its own
128-multiple, images are padded up to the smallest already-seen bucket
that fits with at most `max_waste` area overhead; otherwise the image's
own 128-multiple becomes a new bucket. A folder with k size clusters
compiles exactly k times.

Shared by the `inference.py` CLI (default on, `--no_bucket` restores the
reference's exact per-image padding, `inference_wavemamba.py:28-36`) and
the runner/test pipeline (`val: bucket: true`). Note: SS2D's scan is
global, so bucket padding perturbs outputs at the 1e-3 scale near
borders — hence opt-in on the pipeline path, where metric parity with
the per-image-padded reference protocol is the default.
"""

from __future__ import annotations

import numpy as np


class BucketLadder:
    def __init__(self, multiple=128, max_waste=1.35):
        self.multiple = multiple
        self.max_waste = max_waste
        self.buckets: list[tuple[int, int]] = []

    def shape_for(self, h, w):
        m = self.multiple
        H, W = -(-h // m) * m, -(-w // m) * m
        best = None
        for bh, bw in self.buckets:
            if bh >= H and bw >= W and (best is None or bh * bw < best[0] * best[1]):
                best = (bh, bw)
        if best is not None and best[0] * best[1] <= self.max_waste * H * W:
            return best
        self.buckets.append((H, W))
        return (H, W)


def pad_to_shape(x, H, W):
    """Reflect-pad (B, h, w, C) bottom/right to exactly (H, W) (numpy
    reflect re-reflects when the pad exceeds the image extent, matching
    `pad_to_multiple`'s semantics)."""
    b, h, w, c = x.shape
    ph, pw = H - h, W - w
    if ph == 0 and pw == 0:
        return x
    return np.pad(np.asarray(x), ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
