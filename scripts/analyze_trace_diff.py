#!/usr/bin/python3
"""Compare two jax.profiler traces (chained-scan runs) op-by-op, normalized
per video, to attribute batch-size throughput regressions.

Usage: analyze_trace_diff.py <trace_dir_A> <B_A> <steps_A> <trace_dir_B> <B_B> <steps_B>
"""

import collections
import glob
import gzip
import json
import re
import sys


def load(trace_dir, B, steps):
    f = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/vm.trace.json.gz"))[0]
    with gzip.open(f) as fh:
        data = json.load(fh)
    ev = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    # per-op events live on the 'XLA Ops' thread; 'Steps'/'XLA Modules' lanes
    # carry container events that would double-count every op
    op_tids = {(e["pid"], e["tid"]) for e in ev
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e["args"].get("name") in ("XLA Ops", "Async XLA Ops")}
    dur = collections.Counter()
    for e in ev:
        if (e.get("ph") == "X" and "TPU" in str(pids.get(e.get("pid"), ""))
                and (e["pid"], e.get("tid")) in op_tids):
            name = e["name"]
            if name.startswith("jit_") or name.startswith("while"):
                continue  # containers, not ops
            # collapse instances: fusion.123 -> fusion, convolution_add_fusion.4 -> ...
            base = re.sub(r"\.\d+$", "", name)
            dur[(base, name)] += e.get("dur", 0)
    per_video = {k: v / steps / B / 1e3 for k, v in dur.items()}  # ms/video
    groups = collections.Counter()
    for (base, _), v in per_video.items():
        groups[base] += v
    return per_video, groups


def main():
    a_dir, a_B, a_steps, b_dir, b_B, b_steps = sys.argv[1:7]
    pa, ga = load(a_dir, int(a_B), int(a_steps))
    pb, gb = load(b_dir, int(b_B), int(b_steps))
    print(f"{'op group':38s} {'A ms/vid':>9s} {'B ms/vid':>9s} {'delta':>8s}")
    total_a = total_b = 0.0
    for base in sorted(set(ga) | set(gb), key=lambda k: -(gb.get(k, 0) - ga.get(k, 0))):
        va, vb = ga.get(base, 0.0), gb.get(base, 0.0)
        total_a += va
        total_b += vb
        if max(va, vb) > 0.002:
            print(f"{base:38s} {va:9.4f} {vb:9.4f} {vb - va:+8.4f}")
    print(f"{'TOTAL':38s} {total_a:9.4f} {total_b:9.4f} {total_b - total_a:+8.4f}")

    # top individual op deltas for the biggest-regressing groups
    print("\nTop individual op regressions:")
    deltas = []
    keys = set(k for k in pa) | set(k for k in pb)
    # match ops by name where possible; fall back to group-level only
    for k in keys:
        va, vb = pa.get(k, 0.0), pb.get(k, 0.0)
        deltas.append((vb - va, k, va, vb))
    for d, (base, name), va, vb in sorted(deltas, reverse=True)[:20]:
        print(f"  {name[:60]:60s} {va:8.4f} -> {vb:8.4f} ({d:+.4f})")


if __name__ == "__main__":
    main()
