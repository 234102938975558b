"""Merge procedural datasets into one train dir via hardlinks (no extra
disk): source files keep their pixel content (manifests stay valid), names
are offset per source so they never collide.

    python scripts/merge_datasets.py --out datasets/proc_llie_bsrgan_6k4 \
        datasets/proc_llie_bsrgan_xxl datasets/proc_llie_bsrgan_xxl2

The merged dir gets its own MANIFEST.json recording the sources (each
reproducible from its own generator args) and the per-file hashes.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from dataset_manifest import write  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sources", nargs="+")
    ap.add_argument("--out", required=True)
    ap.add_argument("--split", default="train")
    args = ap.parse_args()

    for sub in ("gt", "input"):
        os.makedirs(os.path.join(args.out, args.split, sub), exist_ok=True)
    offset = 0
    for src in args.sources:
        gt_dir = os.path.join(src, args.split, "gt")
        lq_dir = os.path.join(src, args.split, "input")
        names = sorted(os.listdir(gt_dir))
        assert sorted(os.listdir(lq_dir)) == names, f"{src}: gt/input mismatch"
        for i, name in enumerate(names):
            new = f"{offset + i:05d}.png"
            for sub, d in (("gt", gt_dir), ("input", lq_dir)):
                dst = os.path.join(args.out, args.split, sub, new)
                if not os.path.exists(dst):
                    os.link(os.path.join(d, name), dst)
        print(f"{src}: {len(names)} pairs -> offsets {offset}..{offset + len(names) - 1}")
        offset += len(names)
    write(args.out,
          generator_args=None,
          note="hardlink merge of: " + ", ".join(args.sources)
               + " (each reproducible from its own MANIFEST generator_args)")


if __name__ == "__main__":
    main()
