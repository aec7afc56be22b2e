"""One-shot TPU bench battery: every BASELINE.md config in one sitting.

Runs each benchmark as a subprocess (fresh backend handle per bench, so one
hung relay call cannot strand the whole battery), captures the final result
line, and checkpoints everything to BENCH_BATTERY.json after every step —
partial results survive a relay outage.

A relay-health probe runs first: if a trivial device reduction takes longer
than --max-probe-s (default 60 s; healthy is milliseconds warm, ~3 min cold
including tunnel dial), the battery aborts early with the probe time
recorded, instead of burning hours against a degraded relay.

Usage:  python benchmarks/bench_all.py [--out BENCH_BATTERY.json]
                                       [--max-probe-s 60] [--only k1,k2]
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (key, argv, extra env, timeout_s)
# kernel_backend="auto" (the round-4 config default) resolves to the
# streaming Pallas kernels on TPU, so unpinned steps measure what a user
# gets; dense-XLA entries pin COOPER_USE_PALLAS=0 explicitly for the A/B
STEPS = [
    ("headline_dense", [sys.executable, "bench.py"],
     {"COOPER_USE_PALLAS": "0"}, 1500),
    # default path: ALL races as streaming VMEM kernels, full-M tiles
    ("headline_dense_pallas", [sys.executable, "bench.py"],
     {"COOPER_USE_PALLAS": "1"}, 2400),
    ("scan_to_map_b64", [sys.executable, "benchmarks/bench_scan_match.py", "64"],
     {}, 1500),
    ("scan_to_map_b256", [sys.executable, "benchmarks/bench_scan_match.py",
                          "256"], {}, 2400),
    # streaming top-k kernel for the per-iteration 5-NN searches
    ("scan_to_map_b64_pallas", [sys.executable,
                                "benchmarks/bench_scan_match.py", "64"],
     {"COOPER_USE_PALLAS": "1"}, 2400),
    ("scan_to_map_b256_pallas", [sys.executable,
                                 "benchmarks/bench_scan_match.py", "256"],
     {"COOPER_USE_PALLAS": "1"}, 2400),
    ("scan_to_map_b1024_pallas", [sys.executable,
                                  "benchmarks/bench_scan_match.py", "1024"],
     {"COOPER_USE_PALLAS": "1"}, 3000),
    # device-sharded map (cube shards + all_gather surround): mapping-step
    # overhead vs the single-device map at the full map config
    ("sharded_map_tpu", [sys.executable, "benchmarks/bench_sharded_map.py",
                         "8", "both"], {"COOPER_USE_PALLAS": "1"}, 2400),
    ("pose_graph_dense_n256", [sys.executable, "benchmarks/bench_pose_graph.py",
                               "256", "dense"], {}, 1500),
    ("pose_graph_dense_n1024", [sys.executable,
                                "benchmarks/bench_pose_graph.py",
                                "1024", "dense"], {}, 1500),
    ("pose_graph_pcg_n1024", [sys.executable, "benchmarks/bench_pose_graph.py",
                              "1024", "pcg"], {}, 1500),
    ("pose_graph_pcg_n4096", [sys.executable, "benchmarks/bench_pose_graph.py",
                              "4096", "pcg"], {}, 2400),
    # reference-scale budget (<=1000 LM iters/optimize, solver_g2o.cpp:79-95):
    # amortizes the fixed per-dispatch relay overhead out of iters/s
    ("pose_graph_pcg_n1024_i100", [sys.executable,
                                   "benchmarks/bench_pose_graph.py",
                                   "1024", "pcg", "100"], {}, 1500),
    ("pose_graph_pcg_n4096_i100", [sys.executable,
                                   "benchmarks/bench_pose_graph.py",
                                   "4096", "pcg", "100"], {}, 1500),
    # 32 inner CG steps converge the outer LM identically on this graph
    # class at +31% throughput (BENCH.md config-3 note)
    ("pose_graph_pcg_n4096_i100_p32", [sys.executable,
                                       "benchmarks/bench_pose_graph.py",
                                       "4096", "pcg", "100", "32"], {}, 1500),
    ("ukf_fusion_b4096", [sys.executable, "benchmarks/bench_ukf.py", "4096",
                          "20"], {}, 2400),
    ("ukf_fusion_b512", [sys.executable, "benchmarks/bench_ukf.py", "512",
                         "10"], {}, 2400),
    # hetero batches read benchmarks/.hetero_cache_*.npz (generate once on
    # CPU: bench_hetero.load_or_build) so the chip only pays for solves
    ("hetero_b512", [sys.executable, "benchmarks/bench_hetero.py", "512"],
     {}, 2400),
    ("hetero_b4096", [sys.executable, "benchmarks/bench_hetero.py", "4096"],
     {}, 3000),
    ("hetero_b512_pallas", [sys.executable, "benchmarks/bench_hetero.py",
                            "512"], {"COOPER_USE_PALLAS": "1"}, 2400),
    ("hetero_b4096_pallas", [sys.executable, "benchmarks/bench_hetero.py",
                             "4096"], {"COOPER_USE_PALLAS": "1"}, 3000),
    # plain host chunk loop as the A/B against the self-tuning planner
    # default (BENCH.md config 5: work-normalization analysis)
    ("hetero_b512_chunk", [sys.executable, "benchmarks/bench_hetero.py",
                           "512"],
     {"COOPER_USE_PALLAS": "1", "HETERO_MODE": "chunk"}, 2400),
    # single-stream real-time budget: fused one-dispatch sweep steps vs the
    # LOAM 100 ms / 1000 ms budgets (BASELINE north star)
    ("realtime_fused", [sys.executable, "benchmarks/bench_realtime.py"],
     {"COOPER_USE_PALLAS": "1"}, 2400),
    # capacity axis: grow a single-chip map until allocation fails (the
    # measured one-chip ceiling backing the sharded-map per-device numbers)
    ("map_capacity_tpu", [sys.executable,
                          "benchmarks/bench_map_capacity.py", "tpu"],
     {}, 1500),
    # dense/pallas split kept under distinct keys so cross-round comparisons
    # compare like with like (ADVICE r3)
    ("scaling_tpu_point", [sys.executable, "benchmarks/bench_scaling.py",
                           "256"], {"COOPER_USE_PALLAS": "0"}, 1500),
    ("scaling_tpu_point_pallas", [sys.executable, "benchmarks/bench_scaling.py",
                                  "256"], {"COOPER_USE_PALLAS": "1"}, 1500),
    # full SLAM stack on the chip: demo pipeline with per-stage timers and
    # an XLA trace artifact (SURVEY §5 tracing; round-1 task 5)
    ("pipeline_tpu_demo", [sys.executable, "examples/demo_mapping.py", "20",
                           "/tmp/cooper_demo_map_tpu"],
     {"COOPER_USE_PALLAS": "0",
      "COOPER_XLA_TRACE": "bench_artifacts/xla_trace_demo"}, 2400),
    # same demo with the streaming Pallas kernels on: end-to-end on-chip
    # correctness of the kernels (the captured "ATE rmse" line must match the
    # dense run within f32 tolerance) + mapping-stage speedup
    ("pipeline_tpu_demo_pallas", [sys.executable, "examples/demo_mapping.py",
                                  "20", "/tmp/cooper_demo_map_tpu_pallas"],
     {"COOPER_USE_PALLAS": "1"}, 2400),
]


def probe(max_s: float) -> float:
    """Time one trivial varied-input device reduction in a subprocess."""
    code = (
        "import time,os,numpy as np;t0=time.time();import jax,jax.numpy as jnp;"
        "x=jnp.asarray(np.random.rand(128,128),jnp.float32);"
        "print('PROBE_S',time.time()-t0, float(x.sum())>0)"
    )
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "-c", code], cwd=ROOT,
                           capture_output=True, text=True,
                           timeout=max_s + 240)
        out = r.stdout
    except subprocess.TimeoutExpired:
        return float("inf")
    for line in out.splitlines():
        if line.startswith("PROBE_S"):
            return float(line.split()[1])
    return time.time() - t0


def run_step(key, argv, env_extra, timeout_s):
    env = dict(os.environ, **env_extra)
    t0 = time.time()
    try:
        r = subprocess.run(argv, cwd=ROOT, env=env, capture_output=True,
                           text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return {"error": f"timeout after {timeout_s}s"}
    wall = time.time() - t0
    lines = [l for l in r.stdout.strip().splitlines() if l.strip()]
    last = lines[-1] if lines else ""
    rec = {"wall_s": round(wall, 1), "exit": r.returncode}
    # accuracy lines (e.g. demo_mapping's "ATE rmse: ...") are printed before
    # the timing tail — record them so a kernel regression that flips the
    # trajectory cannot pass as exit-0 (ADVICE r3)
    ate = [l for l in lines if "ATE" in l]
    if ate:
        rec["ate_lines"] = ate
    if r.returncode != 0:
        rec["stderr_tail"] = r.stderr.strip().splitlines()[-5:]
    try:
        rec["result"] = json.loads(last)
    except (json.JSONDecodeError, ValueError):
        try:
            import ast
            rec["result"] = ast.literal_eval(last)
        except (SyntaxError, ValueError):
            rec["raw"] = lines[-6:]
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "BENCH_BATTERY.json"))
    ap.add_argument("--max-probe-s", type=float, default=60.0)
    ap.add_argument("--only", default="",
                    help="comma-separated step keys to run (default: all)")
    args = ap.parse_args()

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    print("probing relay health...", flush=True)
    p = probe(args.max_probe_s)
    results["_probe_s"] = round(p, 1) if p != float("inf") else "timeout"
    results["_probe_ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"probe: {results['_probe_s']} s", flush=True)
    if p > args.max_probe_s:
        print("relay degraded — aborting battery", flush=True)
        return 1

    only = set(args.only.split(",")) if args.only else None
    for key, argv, env_extra, timeout_s in STEPS:
        if only and key not in only:
            continue
        print(f"=== {key} ===", flush=True)
        rec = run_step(key, argv, env_extra, timeout_s)
        results[key] = rec
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
