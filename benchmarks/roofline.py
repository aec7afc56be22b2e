"""Roofline arithmetic for the two hot kernels (BASELINE north star).

Counts HBM bytes and FLOPs per solve ANALYTICALLY from the kernel structure
at the benchmark shapes, then reports achieved fractions of the measured
chip peaks for a given measured throughput.  Run with no args for the
default (headline + scan-to-map at their round-4 numbers); pass
``--peaks mm_tflops hbm_gbs`` to recompute against fresh microbenches
(bench_artifacts/r4_peaks.py).

The point of the exercise (BENCH.md "Speed of light"): neither kernel is
MXU- or HBM-bound — the correspondence races do K=3 dot products (3/128 of
an MXU pass) over VMEM-resident tiles, so the binding resource is VPU issue
on the masked-reduction passes, and the roofline states how far from THAT
ceiling the solve runs.
"""

import sys

# ---- headline odometry bench shapes (bench.py, snug capacities) -----------
B = 512
QC, MC = 256, 256          # corner query x reference (race A + race B)
QS, MS = 768, 3840         # surf query x reference (races A + B + C)
ITERS, REFRESHES = 25, 5

# ---- scan-to-map bench shapes (benchmarks/bench_scan_match.py) ------------
SM_QC, SM_MC = 256, 512
SM_QS, SM_MS = 2048, 5888
SM_ITERS = 10 + 1          # 10 GN iterations + the final diagnostics build
K_NN = 5

F32 = 4


def headline_per_solve():
    """(hbm_bytes, flops, vpu_lane_ops) for one odometry solve."""
    # --- refresh races (streaming Pallas kernels, tiles in VMEM) ---
    # HBM per race ~ queries (TQ x 3 + norms) once + reference (M x 3 +
    # norms) once per query tile (conservative: Mosaic re-DMAs the
    # invariant block per grid step); outputs 2 x Q x 4 B.
    def race_bytes(q, m, tq=256):
        tiles = -(-q // tq)
        return (q * 4 * F32) + tiles * (m * 4 * F32) + 2 * q * F32

    race_hbm = REFRESHES * (2 * race_bytes(QC, MC) + 3 * race_bytes(QS, MS))
    # distance-expansion FLOPs: ~8 flops per (q, m) pair per race
    race_flops = REFRESHES * (2 * QC * MC + 3 * QS * MS) * 8
    # VPU lane-ops: per (q, m) element — dist combine (~3), ring-mask
    # compare/select for B/C (~3), running min+argmin select (~3)
    race_vpu = REFRESHES * (2 * QC * MC * 6 + 3 * QS * MS * 9)

    # --- GN iterations (correspondence geometry frozen per refresh) ---
    # per iter: warp Q=QC+QS pts, residual vs gathered A/B/C, closed-form
    # Jacobian rows, masked 6x6 einsum reduction
    q_total = QC + QS
    gn_hbm = ITERS * (
        q_total * 4 * F32          # xyz + rel_time re-read
        + (QC * 2 + QS * 3) * 3 * F32   # A/B/C correspondence points
        + q_total * 7 * F32        # J rows + residual spill (fused upper bd)
    )
    gn_flops = ITERS * q_total * 300
    gn_vpu = ITERS * q_total * 120
    return race_hbm + gn_hbm, race_flops + gn_flops, race_vpu + gn_vpu


def scan_to_map_per_solve():
    """(hbm_bytes, flops, vpu_lane_ops) for one scan-to-map solve."""
    def knn_bytes(q, m, tq=256):
        tiles = -(-q // tq)
        return (q * 4 * F32) + tiles * (m * 4 * F32) + 2 * q * K_NN * F32

    knn_hbm = SM_ITERS * (knn_bytes(SM_QC, SM_MC) + knn_bytes(SM_QS, SM_MS))
    knn_flops = SM_ITERS * (SM_QC * SM_MC + SM_QS * SM_MS) * 8
    # top-k extraction: k rounds x ~6 elementwise passes over [TQ, TM]
    knn_vpu = SM_ITERS * (SM_QC * SM_MC + SM_QS * SM_MS) * (3 + K_NN * 6)

    # per-iteration residual build: 5-NN gathers + line/plane fits (closed
    # form eig3/adjugate per query) + Jacobian + reduction
    fit_hbm = SM_ITERS * (
        (SM_QC + SM_QS) * K_NN * 3 * F32 * 2   # neighbor component planes
        + (SM_QC + SM_QS) * 16 * F32
    )
    fit_flops = SM_ITERS * (SM_QC * 400 + SM_QS * 250)
    fit_vpu = SM_ITERS * (SM_QC + SM_QS) * 150
    return knn_hbm + fit_hbm, knn_flops + fit_flops, knn_vpu + fit_vpu


def report(name, per_solve, solves_per_s, mm_tflops, hbm_gbs, vpu_tops):
    hbm, fl, vpu = per_solve
    print(f"--- {name} ---")
    print(f"per solve: {hbm/1e6:.2f} MB HBM, {fl/1e6:.1f} MFLOP, "
          f"{vpu/1e6:.1f} M VPU lane-ops")
    bw = solves_per_s * hbm / 1e9
    fs = solves_per_s * fl / 1e12
    vs = solves_per_s * vpu / 1e12
    print(f"at {solves_per_s:.0f} solves/s: {bw:.1f} GB/s HBM "
          f"({100*bw/hbm_gbs:.1f}% of {hbm_gbs:.0f} GB/s peak), "
          f"{fs:.2f} TFLOP/s ({100*fs/mm_tflops:.2f}% of {mm_tflops:.0f} "
          f"TFLOP/s MXU peak), {vs:.2f} T lane-ops/s "
          f"({100*vs/vpu_tops:.0f}% of ~{vpu_tops:.1f} T/s VPU issue est.)")


def main():
    # defaults: measured round-4 values; override with --peaks
    mm_tflops, hbm_gbs = 197.0, 819.0       # v5e datasheet (bf16, HBM2)
    vpu_tops = 1.9                          # 8x128 lanes x ~940 MHz x 2 ALUs
    headline_sps = 1667.0    # round-4 BC-default headline (r4_chip4.log)
    sm_sps = 142.0           # round-4 padded b64 (r4_chip3.log)
    args = sys.argv[1:]
    if args and args[0] == "--peaks":
        mm_tflops, hbm_gbs = float(args[1]), float(args[2])
        if len(args) > 3:
            vpu_tops = float(args[3])
    report("headline odometry (B=512)", headline_per_solve(), headline_sps,
           mm_tflops, hbm_gbs, vpu_tops)
    report("scan-to-map (B=64)", scan_to_map_per_solve(), sm_sps,
           mm_tflops, hbm_gbs, vpu_tops)


if __name__ == "__main__":
    main()
