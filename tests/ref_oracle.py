"""Literal numpy transcription of the reference odometry solve.

A golden-parity oracle for ``LaserOdometry::scanMatch``
(/root/reference/L_SLAM/src/odometry/LaserOdometry.cpp:328-647) plus its
residual kernels (feature_utils.h:17-95) and warp (transformToStart,
LaserOdometry.cpp:135-142): per-point python loops, the exact iteration
schedule (correspondence refresh at iterCount % 5 == 0), the s=1 closed-form
Jacobian INCLUDING the port's missing-parenthesis arz quirk
(LaserOdometry.cpp:567), the -0.05 residual under-relaxation (:575), the
iteration-0 prefix-break row-zeroing degeneracy projector (:583-608), NaN
scrubbing (:622-634), and the deltaR/deltaT break (:636-644).

tests/test_parity_golden.py asserts that ``ops.odometry.odometry_solve`` with
``parity_mode=True`` reproduces this trace iteration by iteration.

Everything is float64 numpy — the oracle asserts the *dynamics*, not f32
rounding; tolerances in the test cover summation-order differences.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np


def tzyx_apply(rx, ry, rz, tx, ty, tz, p):
    """p' = Rz(rz) Ry(ry) Rx(rx) p + t  (convertTransform ->
    getTransformationTZYX, transform_utils.h:288-311)."""
    sx, cx = np.sin(rx), np.cos(rx)
    sy, cy = np.sin(ry), np.cos(ry)
    sz, cz = np.sin(rz), np.cos(rz)
    R = np.array(
        [
            [cz * cy, cz * sy * sx - sz * cx, cz * sy * cx + sz * sx],
            [sz * cy, sz * sy * sx + cz * cx, sz * sy * cx - cz * sx],
            [-sy, cy * sx, cy * cx],
        ]
    )
    return R @ p + np.array([tx, ty, tz])


def transform_to_start(x, p, s):
    """transformToStart (LaserOdometry.cpp:135-142): TZYX(s * x) p."""
    t = s * x
    return tzyx_apply(t[0], t[1], t[2], t[3], t[4], t[5], p)


# ---- correspondence walks (LaserOdometry.cpp:355-497) ----------------------
# The reference's kd-tree 1-NN is exact, so argmin over the cloud is the
# same; the B/C partner walks are literal index walks over the ring-major
# cloud with the +/-2.5-ring break conditions.


def corner_search(point_sel, ref_xyz, ref_ring):
    """(ind1, ind2): nearest corner + nearest corner on a DIFFERENT ring
    within +/-2.5 rings (LaserOdometry.cpp:358-408)."""
    d_all = np.sum((ref_xyz - point_sel) ** 2, axis=1)
    closest = int(np.argmin(d_all))
    if d_all[closest] >= 25.0:
        return -1, -1
    ring_a = int(ref_ring[closest])
    min2, ind2 = 25.0, -1
    for j in range(closest + 1, len(ref_xyz)):
        if int(ref_ring[j]) > ring_a + 2.5:
            break
        if int(ref_ring[j]) > ring_a and d_all[j] < min2:
            min2, ind2 = d_all[j], j
    for j in range(closest - 1, -1, -1):
        if int(ref_ring[j]) < ring_a - 2.5:
            break
        if int(ref_ring[j]) < ring_a and d_all[j] < min2:
            min2, ind2 = d_all[j], j
    return closest, ind2


def surf_search(point_sel, ref_xyz, ref_ring):
    """(ind1, ind2, ind3): nearest surf + same-ring partner + different-ring
    partner (LaserOdometry.cpp:421-483)."""
    d_all = np.sum((ref_xyz - point_sel) ** 2, axis=1)
    closest = int(np.argmin(d_all))
    if d_all[closest] >= 25.0:
        return -1, -1, -1
    ring_a = int(ref_ring[closest])
    min2, ind2 = 25.0, -1
    min3, ind3 = 25.0, -1
    for j in range(closest + 1, len(ref_xyz)):
        if int(ref_ring[j]) > ring_a + 2.5:
            break
        if int(ref_ring[j]) <= ring_a:
            if d_all[j] < min2:
                min2, ind2 = d_all[j], j
        else:
            if d_all[j] < min3:
                min3, ind3 = d_all[j], j
    for j in range(closest - 1, -1, -1):
        if int(ref_ring[j]) < ring_a - 2.5:
            break
        if int(ref_ring[j]) >= ring_a:
            if d_all[j] < min2:
                min2, ind2 = d_all[j], j
        else:
            if d_all[j] < min3:
                min3, ind3 = d_all[j], j
    return closest, ind2, ind3


# ---- residual kernels (feature_utils.h:17-95) -------------------------------


def corner_coefficients(A, B, X, iteration):
    """getCornerFeatureCoefficients (feature_utils.h:42-61)."""
    cr = np.cross(X - B, X - A)
    cr_norm = np.linalg.norm(cr)
    ab = np.linalg.norm(A - B)
    direction = -np.cross(cr, B - A) / (cr_norm * ab)
    distance = cr_norm / ab
    weight = 1.0
    if iteration >= 5:
        weight = 1.0 - 1.8 * abs(distance)
    coeff = direction * weight
    intensity = distance * weight
    return coeff, intensity, (weight > 0.1 and distance != 0.0)


def surf_coefficients(A, B, C, X, iteration):
    """getSurfaceFeatureCoefficients (feature_utils.h:77-95)."""
    n = np.cross(B - A, C - A)
    n = n / np.linalg.norm(n)
    signed = np.dot(X - A, n)
    if signed < 0:                       # cos < 0 flip (feature_utils.h:35-38)
        n = -n
    distance = abs(signed)
    weight = 1.0
    if iteration >= 5:
        weight = 1.0 - 1.8 * abs(distance) / np.sqrt(np.linalg.norm(X))
    coeff = n * weight
    intensity = distance * weight
    return coeff, intensity, (weight > 0.1 and distance != 0.0)


def jacobian_row(x, point, coeff):
    """The s=1 closed-form row (LaserOdometry.cpp:512-575) WITH the port's
    missing-parenthesis arz quirk: the coeff.y term of arz reads
    ``crz*sry*crx + srz*srx*pz`` — ``crz*sry*crx`` is not multiplied by pz
    (:567; identically ScanMatch.cpp:194)."""
    srx, crx = np.sin(x[0]), np.cos(x[0])
    sry, cry = np.sin(x[1]), np.cos(x[1])
    srz, crz = np.sin(x[2]), np.cos(x[2])
    px, py, pz = point
    cx, cy, cz = coeff
    arx = (
        ((crz * sry * crx + srz * srx) * py + (srz * crx - crz * sry * srx) * pz) * cx
        + ((srz * sry * crx - crz * srx) * py - (srz * sry * srx + crz * crx) * pz) * cy
        + (cry * crx * py - cry * srx * pz) * cz
    )
    ary = (
        (-crz * sry * px + crz * cry * srx * py + crz * cry * crx * pz) * cx
        + (-srz * sry * px + srz * cry * srx * py + srz * cry * crx * pz) * cy
        + (-cry * px - sry * srx * py - sry * crx * pz) * cz
    )
    arz = (
        (-srz * cry * px - (srz * sry * srx + crz * crx) * py
         + (crz * srx - srz * sry * crx) * pz) * cx
        + (crz * cry * px + (crz * sry * srx - srz * crx) * py
           + crz * sry * crx + srz * srx * pz) * cy
        + 0.0 * cz
    )
    return np.array([arx, ary, arz, cx, cy, cz])


def degeneracy_projector(AtA, threshold=10.0):
    """Iteration-0 projector (LaserOdometry.cpp:583-608): ascending
    eigenvalues, zero ROWS of the eigenvector matrix for the prefix of
    eigenvalues below threshold (break at the first large one),
    matP = matV.inverse() @ matV2."""
    evals, V = np.linalg.eigh(AtA)       # ascending, columns = eigenvectors
    V2 = V.copy()
    is_degenerate = False
    for i in range(6):
        if evals[i] < threshold:
            V2[i, :] = 0.0
            is_degenerate = True
        else:
            break
    return np.linalg.inv(V) @ V2, is_degenerate


@dataclasses.dataclass
class IterationRecord:
    iteration: int
    x: np.ndarray                # transform AFTER the update
    dx: Optional[np.ndarray]     # the applied update (None if skipped)
    n_selected: int
    is_degenerate: bool
    broke: bool                  # deltaR/deltaT convergence break


def odometry_scan_match(
    sharp_xyz, sharp_s, flat_xyz, flat_s,
    ref_corner_xyz, ref_corner_ring, ref_surf_xyz, ref_surf_ring,
    x0=None,
    max_iterations=25,
    delta_r_abort=0.1,
    delta_t_abort=0.1,
    eig_threshold=10.0,
) -> List[IterationRecord]:
    """The full scanMatch iteration loop (LaserOdometry.cpp:328-647).

    Reference clouds must be ring-major sorted (ring ascending, azimuth
    ascending within a ring) — the index walks assume it, exactly as the
    reference's ring-concatenated clouds guarantee
    (MultiScanRegistration.cpp:179-190).
    """
    x = np.zeros(6) if x0 is None else np.asarray(x0, np.float64).copy()
    n_sharp, n_flat = len(sharp_xyz), len(flat_xyz)
    corner_ind1 = np.full(n_sharp, -1, np.int64)
    corner_ind2 = np.full(n_sharp, -1, np.int64)
    surf_ind1 = np.full(n_flat, -1, np.int64)
    surf_ind2 = np.full(n_flat, -1, np.int64)
    surf_ind3 = np.full(n_flat, -1, np.int64)

    matP = np.eye(6)
    is_degenerate = False
    trace: List[IterationRecord] = []

    for it in range(max_iterations):
        rows, rhs = [], []

        for i in range(n_sharp):
            point_sel = transform_to_start(x, sharp_xyz[i], sharp_s[i])
            if it % 5 == 0:
                corner_ind1[i], corner_ind2[i] = corner_search(
                    point_sel, ref_corner_xyz, ref_corner_ring
                )
            if corner_ind2[i] >= 0:
                A = ref_corner_xyz[corner_ind1[i]]
                B = ref_corner_xyz[corner_ind2[i]]
                coeff, intensity, ok = corner_coefficients(A, B, point_sel, it)
                if ok:
                    rows.append(jacobian_row(x, sharp_xyz[i], coeff))
                    rhs.append(-0.05 * intensity)

        for i in range(n_flat):
            point_sel = transform_to_start(x, flat_xyz[i], flat_s[i])
            if it % 5 == 0:
                surf_ind1[i], surf_ind2[i], surf_ind3[i] = surf_search(
                    point_sel, ref_surf_xyz, ref_surf_ring
                )
            if surf_ind2[i] >= 0 and surf_ind3[i] >= 0:
                A = ref_surf_xyz[surf_ind1[i]]
                B = ref_surf_xyz[surf_ind2[i]]
                C = ref_surf_xyz[surf_ind3[i]]
                coeff, intensity, ok = surf_coefficients(A, B, C, point_sel, it)
                if ok:
                    rows.append(jacobian_row(x, flat_xyz[i], coeff))
                    rhs.append(-0.05 * intensity)

        n_sel = len(rows)
        if n_sel < 10:                   # pointSelNum < 10 -> continue (:501)
            trace.append(IterationRecord(it, x.copy(), None, n_sel,
                                         is_degenerate, False))
            continue

        matA = np.stack(rows)
        matB = np.asarray(rhs)
        AtA = matA.T @ matA
        AtB = matA.T @ matB
        dx = np.linalg.solve(AtA, AtB)

        if it == 0:
            matP, is_degenerate = degeneracy_projector(AtA, eig_threshold)
        if is_degenerate:
            dx = matP @ dx

        x = x + dx
        x[~np.isfinite(x)] = 0.0         # NaN scrub (:622-634)

        delta_r = np.sqrt(np.sum(np.rad2deg(dx[:3]) ** 2))
        delta_t = np.sqrt(np.sum((dx[3:] * 100.0) ** 2))
        broke = delta_r < delta_r_abort and delta_t < delta_t_abort
        trace.append(IterationRecord(it, x.copy(), dx.copy(), n_sel,
                                     is_degenerate, broke))
        if broke:
            break

    return trace


# ===========================================================================
# Scan-to-map oracle: ScanMatch::scanMatchScan
# (/root/reference/L_SLAM/src/scan_to_scan_match/ScanMatch.cpp:51-347)
# ===========================================================================


def point_to_map(x, p):
    """pointAssociateToMap (transform_utils.h:476-482): TZYX(x) p."""
    return tzyx_apply(x[0], x[1], x[2], x[3], x[4], x[5], p)


def map_knn5(point_sel, ref_xyz):
    """Exact 5-NN, ties toward the smaller index (nanoflann kd-trees return
    exact neighbors; a stable argsort reproduces the ordering)."""
    d = np.sum((ref_xyz - point_sel) ** 2, axis=1)
    idx = np.argsort(d, kind="stable")[:5]
    return idx, d[idx]


def find_line(ref_xyz, indices):
    """findLine (feature_utils.h:110-155): 5-point PCA; accept iff
    lambda_max > 5 * lambda_mid; A/B = centroid -/+ 0.1 * v_max."""
    pts = ref_xyz[np.asarray(indices)]
    centroid = pts.mean(axis=0)
    a = pts - centroid
    cov = (a.T @ a) / 5.0
    evals, evecs = np.linalg.eigh(cov)        # ascending
    if evals[2] > 5.0 * evals[1]:
        v = evecs[:, 2]
        return centroid - 0.1 * v, centroid + 0.1 * v, True
    return None, None, False


def find_plane(ref_xyz, indices, max_distance=0.2, reject_collinear=False):
    """findPlane (feature_utils.h:158-204): least-squares n.p = -1 over the
    5 neighbors, normalized, d = -n.centroid, reject if any neighbor sits
    further than max_distance from the plane.

    ``reject_collinear=True`` additionally rejects sets whose centered
    mid/max covariance eigenvalue ratio is below 0.05 — NOT reference
    behavior, but the reference's accepted fit on such a set is AMBIGUOUS
    (many planes pass the max_distance check; the normal is whatever the
    QR returns on the raw coordinates), so iteration-level parity is only
    well-defined with these sets excluded on both sides
    (ops/scan_match._build_residuals keeps the same filter)."""
    pts = ref_xyz[np.asarray(indices)]
    centroid = pts.mean(axis=0)
    if reject_collinear:
        a = pts - centroid
        evals = np.linalg.eigvalsh((a.T @ a) / len(pts))
        if evals[1] <= 0.05 * evals[2]:
            return None, False
    n, *_ = np.linalg.lstsq(pts, -np.ones(5), rcond=None)
    n = n / np.linalg.norm(n)
    d = -np.dot(n, centroid)
    dists = pts @ n + d
    if np.any(np.abs(dists) > max_distance):
        return None, False
    return np.concatenate([n, [d]]), True


def corner_coefficients_map(A, B, X):
    """Map-variant getCornerFeatureCoefficients (feature_utils.h:63-75):
    w = 1 - 0.9 |d|, accept iff w > 0.1."""
    cr = np.cross(X - B, X - A)
    cr_norm = np.linalg.norm(cr)
    ab = np.linalg.norm(A - B)
    direction = -np.cross(cr, B - A) / (cr_norm * ab)
    distance = cr_norm / ab
    weight = 1.0 - 0.9 * abs(distance)
    return direction * weight, distance * weight, weight > 0.1


def surf_coefficients_map(plane, X):
    """Map-variant getSurfaceFeatureCoefficients (feature_utils.h:97-106):
    signed distance; w = 1 - 0.9 |d| / sqrt(|X|), accept iff w > 0.1."""
    signed = np.dot(plane[:3], X) + plane[3]
    weight = 1.0 - 0.9 * abs(signed) / np.sqrt(np.linalg.norm(X))
    return plane[:3] * weight, signed * weight, weight > 0.1


@dataclasses.dataclass
class ScanMatchRecord:
    iteration: int
    x: np.ndarray                # transform AFTER the update
    dx: Optional[np.ndarray]
    n_selected: int
    line_match_count: int
    plane_match_count: int
    is_degenerate: bool
    broke: bool                  # deltaR/deltaT convergence break
    score: float                 # getScore over this iteration's coeffSel
    intensities: np.ndarray      # the coeffSel intensity column


@dataclasses.dataclass
class ScanMatchResultOracle:
    trace: List[ScanMatchRecord]
    x: np.ndarray
    converged: bool
    score: float
    percent: float
    accepted: bool               # the bool scanMatchScan returns


def scan_match_scan(
    ref_corner_xyz, ref_surf_xyz, corner_xyz, surf_xyz, x0=None,
    max_iterations=10,
    delta_r_abort=0.05,
    delta_t_abort=0.05,
    eig_threshold=100.0,
    score_threshold=800.0,
    match_percentage_threshold=0.4,
    reject_collinear=False,
) -> ScanMatchResultOracle:
    """The full scanMatchScan loop (ScanMatch.cpp:51-347).

    Per iteration: project via pointAssociateToMap, exact 5-NN gated on the
    5th distance < 5.0, findLine/findPlane fits, map-variant coefficients
    (w = 1 - 0.9|d|, surf scaled by 1/sqrt(|X|)), matB = -intensity (NO 0.05
    under-relaxation, :205), the port-typo closed-form Jacobian (:187-196),
    the iteration-0 eigen-100 row-zeroing projector (:213-235), deltaR/T
    abort at 0.05 (:252-259), and the post-convergence score/percent gate
    over the FINAL iteration's coeffSel (:263-341).  Degenerate < 50 matched
    rows break the loop (:142-145).
    """
    x = np.zeros(6) if x0 is None else np.asarray(x0, np.float64).copy()
    n_corner, n_surf = len(corner_xyz), len(surf_xyz)
    matP = np.eye(6)
    is_degenerate = False
    converged = False
    trace: List[ScanMatchRecord] = []
    line_match_count = plane_match_count = 0
    intensities: List[float] = []

    for it in range(max_iterations):
        rows, rhs = [], []
        intensities = []
        line_match_count = 0
        plane_match_count = 0

        for i in range(n_corner):
            point_sel = point_to_map(x, corner_xyz[i])
            idx, dists = map_knn5(point_sel, ref_corner_xyz)
            if dists[4] < 5.0:
                A, B, ok = find_line(ref_corner_xyz, idx)
                if ok:
                    coeff, intensity, accept = corner_coefficients_map(
                        A, B, point_sel
                    )
                    if accept:
                        rows.append(jacobian_row(x, corner_xyz[i], coeff))
                        rhs.append(-intensity)
                        intensities.append(intensity)
                    line_match_count += 1

        for i in range(n_surf):
            point_sel = point_to_map(x, surf_xyz[i])
            idx, dists = map_knn5(point_sel, ref_surf_xyz)
            if dists[4] < 5.0:
                plane, ok = find_plane(ref_surf_xyz, idx, 0.2,
                                       reject_collinear)
                if ok:
                    coeff, intensity, accept = surf_coefficients_map(
                        plane, point_sel
                    )
                    if accept:
                        rows.append(jacobian_row(x, surf_xyz[i], coeff))
                        rhs.append(-intensity)
                        intensities.append(intensity)
                    plane_match_count += 1

        n_sel = len(rows)
        score_it = float(np.sum(np.exp(-np.abs(intensities)))) if n_sel else 0.0
        if n_sel < 50:                    # laserCloudSelNum < 50 -> break (:142)
            trace.append(ScanMatchRecord(it, x.copy(), None, n_sel,
                                         line_match_count, plane_match_count,
                                         is_degenerate, False, score_it,
                                         np.asarray(intensities)))
            break

        matA = np.stack(rows)
        matB = np.asarray(rhs)
        AtA = matA.T @ matA
        AtB = matA.T @ matB
        dx = np.linalg.solve(AtA, AtB)

        if it == 0:
            matP, is_degenerate = degeneracy_projector(AtA, eig_threshold)
        if is_degenerate:
            dx = matP @ dx

        x = x + dx
        delta_r = np.sqrt(np.sum(np.rad2deg(dx[:3]) ** 2))
        delta_t = np.sqrt(np.sum((dx[3:] * 100.0) ** 2))
        broke = delta_r < delta_r_abort and delta_t < delta_t_abort
        trace.append(ScanMatchRecord(it, x.copy(), dx.copy(), n_sel,
                                     line_match_count, plane_match_count,
                                     is_degenerate, broke, score_it,
                                     np.asarray(intensities)))
        if broke:
            converged = True
            break

    # score gate (:263-341): computed only on convergence, over the LAST
    # iteration's coeffSel (built at the pre-update pose of that iteration)
    score = trace[-1].score if trace else 0.0
    match_count = line_match_count + plane_match_count
    percent = match_count / float(n_corner + n_surf)
    accepted = bool(
        converged
        and score >= score_threshold
        and percent >= match_percentage_threshold
    )
    return ScanMatchResultOracle(
        trace=trace, x=x, converged=converged, score=score,
        percent=percent, accepted=accepted,
    )


# ===========================================================================
# Feature extraction oracle (ScanRegistration::extractFeatures and helpers,
# /root/reference/L_SLAM/src/odometry/ScanRegistration.cpp:190-666)
# ===========================================================================
#
# A literal per-ring python transcription of the sequential greedy feature
# picker: setScanBuffersFor's order-dependent occlusion/blind sweep
# (:462-522), setRegionBuffersFor's curvature + stable merge sort (:420-460),
# the flat picks with markAsPicked +/-cr suppression (:267-284, :524-545),
# the edge-broken promotion (:287-303), and the descending-curvature
# pointClassify scan (:305-354, :547-666).  Labels and thresholds are the
# reference's (PointLabel enum, ScanRegistration.h:23-40).
#
# tests/test_features.py::TestFeaturesGolden compares the picked sets against
# ops/features.extract_features, asserting parity where the documented
# order-independence deviations (ops/features.py:10-22) cannot bite and
# quantifying the picked-set Jaccard where they can.

FEAT_SURF_PICKED_NEAR = 3
FEAT_EDGE_BROKEN = -2
FEAT_NEAR_BLOCK = -3
FEAT_BLIND_BLOCK = -4

FEAT_MESSY = 9
FEAT_SURFACE_FLAT = -1
FEAT_CORNER_SHARP = 1
FEAT_ONESIDE_FLAT = 5


def _cos_angle_np(a, b):
    """calcCosAngleDiff (math_utils.h:87-99)."""
    num = float(np.dot(a, b))
    den = float(np.linalg.norm(a) * np.linalg.norm(b))
    return num / den if den > 0 else 1.0


def feat_scan_buffers(pts, cr, blind_threshold):
    """setScanBuffersFor (ScanRegistration.cpp:462-522), startIdx=0,
    endIdx=n-1.  Returns the int status buffer (0 = untouched)."""
    n = len(pts)
    buf = np.zeros(n, np.int64)

    for i in range(cr):
        if _cos_angle_np(pts[i], pts[i + 1]) < blind_threshold:
            buf[i:i + cr + 1] = FEAT_BLIND_BLOCK
    for i in range(cr):
        if _cos_angle_np(pts[n - 1 - i], pts[n - 2 - i]) < blind_threshold:
            s = n - 1 - i - cr
            buf[s:s + cr + 1] = FEAT_BLIND_BLOCK

    for i in range(cr, n - 1 - cr):
        prev_p, p, nxt = pts[i - 1], pts[i], pts[i + 1]
        diff_next = float(np.sum((nxt - p) ** 2))
        if _cos_angle_np(p, nxt) < blind_threshold:
            buf[i - cr + 1:i - cr + 1 + 2 * cr] = FEAT_BLIND_BLOCK
            continue
        if diff_next > 1.0:
            depth1 = float(np.linalg.norm(p))
            depth2 = float(np.linalg.norm(nxt))
            diff_prev = float(np.sum((prev_p - p) ** 2))
            if depth1 > depth2:
                if buf[i + 1] > FEAT_NEAR_BLOCK and diff_prev / diff_next < 0.2:
                    buf[i + 1] = FEAT_EDGE_BROKEN
                buf[i - cr + 1:i - cr + 1 + cr] = FEAT_NEAR_BLOCK
            else:
                if buf[i] > FEAT_NEAR_BLOCK and diff_prev / diff_next < 0.2:
                    buf[i] = FEAT_EDGE_BROKEN
                buf[i + 1:i + 1 + cr] = FEAT_NEAR_BLOCK
    return buf


def feat_curvature(pts, sp, ep, cr):
    """setRegionBuffersFor curvature (:420-446): region-local array."""
    out = np.empty(ep - sp + 1)
    for ridx, i in enumerate(range(sp, ep + 1)):
        d = -2.0 * cr * pts[i].copy()
        for j in range(1, cr + 1):
            d += pts[i + j] + pts[i - j]
        out[ridx] = float(np.dot(d, d))
    return out


def feat_sort_indices(curv, sp):
    """Stable ascending sort by curvature -> global indices (mergeSort with
    <=, ScanRegistration.h:280-311 — stable, ties keep index order)."""
    order = np.argsort(curv, kind="stable")
    return order + sp


def feat_point_classify(pts, idx, cr, eig12=100.0, eig13=10000.0, tol=0.08):
    """pointClassify (:547-666): two one-sided PCA line fits."""

    def side(window):
        a = np.stack(window)                      # [cr+1, 3]
        centroid = a.mean(axis=0)
        d = a - centroid
        cov = (d.T @ d) / (cr + 1)
        lam, vec = np.linalg.eigh(cov)            # ascending
        if lam[2] > eig12 * lam[1] and lam[2] > eig13 * lam[0]:
            v = vec[:, 2]
            for dj in d:
                dist = np.linalg.norm(np.cross(dj, v)) / np.linalg.norm(v)
            # literal loop: breaks on first violation
                if abs(dist) > tol:
                    return False, v
            return True, v
        return False, vec[:, 2]

    line1, v1 = side([pts[idx - j] for j in range(0, cr + 1)])
    line2, v2 = side([pts[idx + j] for j in range(0, cr + 1)])

    if line1 and line2:
        diff = _cos_angle_np(v1, v2)
        if diff < np.cos(np.deg2rad(175.0)) or diff > np.cos(np.deg2rad(5.0)):
            return FEAT_SURFACE_FLAT
        if np.cos(np.deg2rad(135.0)) < diff < np.cos(np.deg2rad(45.0)):
            return FEAT_CORNER_SHARP
    if line1 or line2:
        return FEAT_ONESIDE_FLAT
    return FEAT_MESSY


@dataclasses.dataclass
class RingFeatures:
    sharp: List[int]
    less_sharp: List[int]
    flat: List[int]
    less_flat: List[int]          # pre-voxel-filter pool
    status: np.ndarray            # final _scanNeighborPicked buffer


def extract_features_ring(pts, cr=5, nreg=6, max_corner_sharp=2,
                          max_surface_flat=4, surf_thresh=0.02,
                          blind_threshold=None):
    """extractFeatures for ONE ring (:199-418), literal sequential order.

    pts: [n, 3] float64 valid points in scan order.  Returns RingFeatures of
    ring-local indices (duplicates preserved where the reference pushes the
    same point into several clouds).
    """
    if blind_threshold is None:
        blind_threshold = float(np.cos(np.deg2rad(0.5)))
    pts = [np.asarray(p, np.float64) for p in pts]
    n = len(pts)
    out = RingFeatures([], [], [], [], np.zeros(n, np.int64))
    if n - 1 <= 2 * cr:                           # skip empty scans (:205)
        return out

    buf = feat_scan_buffers(pts, cr, blind_threshold)

    for j in range(nreg):
        # integer region bounds (:248-257), startIdx=0, endIdx=n-1
        sp = (cr * (nreg - j) + (n - 1 - cr) * j) // nreg
        ep = (cr * (nreg - 1 - j) + (n - 1 - cr) * (j + 1)) // nreg - 1
        if ep <= sp:
            continue
        region_size = ep - sp + 1
        curv = feat_curvature(pts, sp, ep, cr)
        sort_idx = feat_sort_indices(curv, sp)

        # ---- flat picks: ascending curvature + markAsPicked (:267-284) ----
        surf_picked = 0
        for k in range(region_size):
            if surf_picked >= max_surface_flat:
                break
            idx = int(sort_idx[k])
            if buf[idx] != FEAT_SURF_PICKED_NEAR and curv[idx - sp] < surf_thresh:
                surf_picked += 1
                out.flat.append(idx)
                # markAsPicked (:524-545): label the +/-cr window
                buf[max(idx - cr, 0):idx + cr + 1] = FEAT_SURF_PICKED_NEAR

        # ---- less-flat pool + edge-broken promotion (:287-303) ------------
        for k in range(region_size):
            idx = sp + k
            if curv[k] < surf_thresh:
                out.less_flat.append(idx)
            if buf[idx] == FEAT_EDGE_BROKEN:
                out.sharp.append(idx)
                out.less_sharp.append(idx)

        # ---- descending-curvature classify scan (:305-354) -----------------
        corner_picked = 0
        surf_picked = 0
        for k in range(region_size - 1, -1, -1):
            idx = int(sort_idx[k])
            if curv[idx - sp] < surf_thresh:
                break
            if idx < cr or idx >= n - cr:
                continue                           # classify window OOB guard
            label = feat_point_classify(pts, idx, cr)
            if label == FEAT_SURFACE_FLAT:
                if surf_picked < max_surface_flat:
                    surf_picked += 1               # bound consumed, no push
                out.less_flat.append(idx)
            elif label == FEAT_CORNER_SHARP:
                if buf[idx] > FEAT_EDGE_BROKEN:
                    if corner_picked < max_corner_sharp:
                        corner_picked += 1
                        out.sharp.append(idx)
                    out.less_sharp.append(idx)
            elif label == FEAT_ONESIDE_FLAT:
                if surf_picked < max_surface_flat:
                    surf_picked += 1
                    out.flat.append(idx)
                out.less_flat.append(idx)

    out.status = buf
    return out


# ===========================================================================
# IMU de-warp oracle (handleIMUMessage / interpolateIMUStateFor /
# setIMUTransformFor / transformToStartIMU,
# /root/reference/L_SLAM/src/odometry/ScanRegistration.cpp:89-188)
# ===========================================================================
#
# Literal transcription of the reference's IMU integration and per-point
# de-warp: LOAM-frame accel remap + tilted-frame gravity removal (:96-99),
# rotateZXY world rotation + trapezoid-free Euler integration (:108-117),
# the stateful forward-walking interpolation with yaw wrap
# (ScanRegistration.h:151-169, :171-188), the position-shift construction
# (:150-155), and the ZXY-then-inverse-YXZ point transform (:158-169).
# Arbitrated against models/scan_registration.integrate_imu_history +
# imu_dewarp by tests/test_features.py (TestImuDewarpGolden).

def _rot_x(v, ang):
    c, s = np.cos(ang), np.sin(ang)
    y = v[1]
    return np.array([v[0], c * y - s * v[2], s * y + c * v[2]])


def _rot_y(v, ang):
    c, s = np.cos(ang), np.sin(ang)
    x = v[0]
    return np.array([c * x + s * v[2], v[1], c * v[2] - s * x])


def _rot_z(v, ang):
    c, s = np.cos(ang), np.sin(ang)
    x = v[0]
    return np.array([c * x - s * v[1], s * x + c * v[1], v[2]])


def rotate_zxy_np(v, ang_z, ang_x, ang_y):
    """rotateZXY (math_utils.h:184-205): rotZ, then rotX, then rotY."""
    return _rot_y(_rot_x(_rot_z(v, ang_z), ang_x), ang_y)


def rotate_yxz_np(v, ang_y, ang_x, ang_z):
    """rotateYXZ (math_utils.h:215-236): rotY, then rotX, then rotZ."""
    return _rot_z(_rot_x(_rot_y(v, ang_y), ang_x), ang_z)


@dataclasses.dataclass
class ImuStateOracle:
    stamp: float
    roll: float
    pitch: float
    yaw: float
    position: np.ndarray
    velocity: np.ndarray


def imu_history_oracle(stamps, acc_sensor, rpy, gravity=9.81):
    """handleIMUMessage for a message stream (:89-120).

    acc_sensor rows are raw accelerometer readings in SENSOR axis order
    (x, y, z); the reference consumes them as (y, z, x) with tilted-frame
    gravity removal (:96-99).
    """
    history = []
    for k in range(len(stamps)):
        roll, pitch, yaw = (float(rpy[k][0]), float(rpy[k][1]),
                            float(rpy[k][2]))
        acc = np.array([
            acc_sensor[k][1] - np.sin(roll) * np.cos(pitch) * gravity,
            acc_sensor[k][2] - np.cos(roll) * np.cos(pitch) * gravity,
            acc_sensor[k][0] + np.sin(pitch) * gravity,
        ])
        state = ImuStateOracle(float(stamps[k]), roll, pitch, yaw,
                               np.zeros(3), np.zeros(3))
        if history:
            acc_w = rotate_zxy_np(acc, roll, pitch, yaw)
            prev = history[-1]
            dt = state.stamp - prev.stamp
            state.position = (prev.position + prev.velocity * dt
                              + 0.5 * acc_w * dt * dt)
            state.velocity = prev.velocity + acc_w * dt
        history.append(state)
    return history


def interpolate_imu_state(history, scan_time, rel_time, imu_idx=0):
    """interpolateIMUStateFor (:171-188): forward-walking index + yaw-wrap
    interpolation (IMUState::interpolate, ScanRegistration.h:151-169).
    Returns (state, new_imu_idx)."""
    idx = imu_idx
    time_diff = scan_time - history[idx].stamp + rel_time
    while idx < len(history) - 1 and time_diff > 0:
        idx += 1
        time_diff = scan_time - history[idx].stamp + rel_time
    if idx == 0 or time_diff > 0:
        s = history[idx]
        out = ImuStateOracle(s.stamp, s.roll, s.pitch, s.yaw,
                             s.position.copy(), s.velocity.copy())
        return out, idx
    start, end = history[idx], history[idx - 1]
    ratio = -time_diff / (start.stamp - end.stamp)
    inv = 1.0 - ratio
    yaw_end = end.yaw
    if start.yaw - yaw_end > np.pi:
        yaw_end += 2 * np.pi
    elif start.yaw - yaw_end < -np.pi:
        yaw_end -= 2 * np.pi
    out = ImuStateOracle(
        0.0,
        start.roll * inv + end.roll * ratio,
        start.pitch * inv + end.pitch * ratio,
        start.yaw * inv + yaw_end * ratio,
        start.position * inv + end.position * ratio,
        start.velocity * inv + end.velocity * ratio,
    )
    return out, idx


def imu_dewarp_oracle(points, rel_times, history, scan_time,
                      sweep_start=None):
    """Per-point transformToStartIMU (:128-169), points in scan order.

    The stateful _imuIdx advances monotonically across the sweep exactly as
    the reference's member variable does (reset() seeds _imuStart at
    relTime 0, :122-133).
    """
    if sweep_start is None:
        sweep_start = scan_time
    imu_idx = 0
    imu_start, imu_idx = interpolate_imu_state(history, scan_time, 0.0,
                                               imu_idx)
    out = []
    for p, rel in zip(points, rel_times):
        cur, imu_idx = interpolate_imu_state(history, scan_time, float(rel),
                                             imu_idx)
        rel_sweep = (scan_time - sweep_start) + float(rel)
        shift = (cur.position - imu_start.position
                 - imu_start.velocity * rel_sweep)
        q = rotate_zxy_np(np.asarray(p, np.float64), cur.roll, cur.pitch,
                          cur.yaw)
        q = q + shift
        q = rotate_yxz_np(q, -imu_start.yaw, -imu_start.pitch,
                          -imu_start.roll)
        out.append(q)
    return np.stack(out)
