"""Summarize an XLA profiler trace: device time by op, for the roofline.

Usage: python benchmarks/trace_summary.py /path/to/tracedir [top_n]

Finds the newest ``*.trace.json.gz`` under the directory (the perfetto
export jax.profiler.trace writes), sums the durations of device-lane
complete events by (sanitized) op name, and prints the top entries with
their share of total device time.  Host lanes (python, thunks) are skipped
by dropping events that overlap the XLA launch thread names.
"""

import collections
import glob
import gzip
import json
import os
import re
import sys


def load_trace(d):
    paths = sorted(glob.glob(os.path.join(d, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {d}")
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f), paths[-1]


def main():
    d = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    data, path = load_trace(d)
    events = data["traceEvents"] if isinstance(data, dict) else data

    # pid/tid -> lane name
    lanes = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lanes[(e.get("pid"), e.get("tid"))] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "process_name":
            lanes[(e.get("pid"), None)] = e["args"]["name"]

    def lane_of(e):
        return lanes.get((e.get("pid"), e.get("tid")), "") or lanes.get(
            (e.get("pid"), None), "")

    sums = collections.defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        lane = lane_of(e)
        # device lanes in the TPU/XLA perfetto export carry "TensorCore" /
        # "XLA Ops" / "Steps"; host lanes carry thread names like
        # "tf_Compute" or python
        if not re.search(r"TensorCore|XLA Ops|/device:|SparseCore", lane):
            continue
        if re.search(r"Steps|XLA Modules", lane):
            continue
        name = e.get("name", "?")
        name = re.sub(r"\d+", "#", name)[:90]
        dur = float(e.get("dur", 0.0))
        sums[name] += dur
        total += dur

    print(f"trace: {path}")
    print(f"total device op time: {total/1e3:.1f} ms over {len(sums)} op kinds")
    for name, dur in sorted(sums.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{dur/1e3:10.1f} ms  {100*dur/max(total,1e-9):5.1f}%  {name}")


if __name__ == "__main__":
    main()
