"""Summarize an XLA profiler trace: top ops by total device time.

Reads the trace.json.gz Chrome-trace file a jax.profiler.trace() run writes
and aggregates complete events ("X" phase) by name within device lanes.

Usage: python benchmarks/trace_top_ops.py <trace_dir_or_json.gz> [top_n]
"""

import gzip
import json
import os
import sys
from collections import defaultdict


def find_trace(path):
    if os.path.isfile(path):
        return path
    hits = []
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith("trace.json.gz") or f.endswith("trace.json"):
                hits.append(os.path.join(root, f))
    if not hits:
        raise SystemExit(f"no trace.json(.gz) under {path}")
    return max(hits, key=os.path.getmtime)


def main():
    path = find_trace(sys.argv[1])
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data

    # process/thread names to restrict to device lanes
    pnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")

    tot = defaultdict(float)
    cnt = defaultdict(int)
    dev_total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pnames.get(e.get("pid"), "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        dur = float(e.get("dur", 0.0))
        name = e.get("name", "?")
        tot[name] += dur
        cnt[name] += 1
        dev_total += dur

    print(f"trace: {path}")
    print(f"device lanes total: {dev_total/1e3:.1f} ms across "
          f"{sum(cnt.values())} events")
    print(f"{'total ms':>10s} {'calls':>7s} {'ms/call':>9s}  name")
    for name in sorted(tot, key=tot.get, reverse=True)[:top_n]:
        print(f"{tot[name]/1e3:10.2f} {cnt[name]:7d} "
              f"{tot[name]/1e3/cnt[name]:9.3f}  {name[:90]}")


if __name__ == "__main__":
    main()
