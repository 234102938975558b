"""Aggregate a jax.profiler chrome-trace into a per-op device-time table.

Usage: python scripts/trace_topops.py <logdir-or-trace.json.gz> [n_iters]

Reads the newest `*.trace.json.gz` under the log dir, sums durations of
events on the device "XLA Ops" line, groups by a normalized op name
(fusion.123 -> fusion, with the XLA op_type kept), and prints a table of
device time per iteration. This replaces the round-2 stub-sweep
subtraction with a measured op timeline (VERDICT r2 #5).
"""

import collections
import glob
import gzip
import json
import os
import re
import sys


def load_trace(path):
    if os.path.isdir(path):
        cands = sorted(
            glob.glob(os.path.join(path, "**", "*.trace.json.gz"), recursive=True)
        )
        if not cands:
            raise FileNotFoundError(f"no trace.json.gz under {path}")
        path = cands[-1]
    return json.loads(gzip.open(path).read()), path


def device_op_events(trace):
    pids = {}
    tnames = {}
    for e in trace["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "device" in n.lower()}
    op_tids = {
        (p, t) for (p, t), n in tnames.items() if p in dev_pids and n == "XLA Ops"
    }
    for e in trace["traceEvents"]:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids:
            yield e


_SUFFIX = re.compile(r"[.\-_]?\d+$")


def normalize(name):
    """fusion.1234 -> fusion; %copy.5 -> copy; keep custom-call names."""
    name = name.split("%")[-1]
    return _SUFFIX.sub("", name)


def main(path, n_iters=1):
    trace, src = load_trace(path)
    per_op = collections.Counter()
    per_op_count = collections.Counter()
    examples = {}
    total = 0.0
    for e in device_op_events(trace):
        dur = e.get("dur", 0) / 1e3  # us -> ms
        key = normalize(e["name"])
        args = e.get("args", {})
        long_name = args.get("long_name", "")
        per_op[key] += dur
        per_op_count[key] += 1
        total += dur
        if key not in examples and long_name:
            examples[key] = long_name[:100]
    print(f"# {src}")
    print(f"# total device op time: {total:.1f} ms "
          f"({total / n_iters:.1f} ms/iter over {n_iters} iters)\n")
    print(f"{'op':<40} {'ms/iter':>9} {'calls':>7} {'%':>6}")
    for key, ms in per_op.most_common(25):
        print(f"{key:<40} {ms / n_iters:>9.2f} {per_op_count[key] // n_iters:>7} "
              f"{100 * ms / total:>5.1f}%")
    return per_op, total


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 1)
