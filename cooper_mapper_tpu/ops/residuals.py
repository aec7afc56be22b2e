"""Point-to-line / point-to-plane residual kernels.

Vectorized re-implementations of feature_utils.h (reference
/root/reference/L_SLAM/src/util/feature_utils.h:17-204): residual distances,
oriented directions, robust down-weighting, and the 5-point line/plane fits
used by the scan-to-map solver.  All functions are batched over a leading
point dimension and return validity masks instead of C++ bool returns.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import eig3


def line_point_distance(A, B, X, eps=1e-12):
    """Distance from X to line AB and the unit direction of steepest descent.

    Matches getLinePointDistance (feature_utils.h:17-26):
    direction = -( (X-B)x(X-A) ) x (B-A) / (|(X-B)x(X-A)| * |A-B|),
    distance  = |(X-B)x(X-A)| / |A-B|.
    """
    cr = jnp.cross(X - B, X - A)
    cr_norm = jnp.linalg.norm(cr, axis=-1)
    ab = jnp.linalg.norm(A - B, axis=-1)
    denom = jnp.maximum(cr_norm * ab, eps)
    direction = -jnp.cross(cr, B - A) / denom[..., None]
    distance = cr_norm / jnp.maximum(ab, eps)
    return distance, direction


def surface_point_distance(A, B, C, X, eps=1e-12):
    """Distance from X to plane ABC; normal oriented toward X.

    Matches getSurfacePointDistance (feature_utils.h:28-40).
    """
    n = jnp.cross(B - A, C - A)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), eps)
    signed = jnp.sum((X - A) * n, axis=-1)
    n = jnp.where(signed[..., None] < 0, -n, n)
    return jnp.abs(signed), n


def corner_coeff_odometry(A, B, X, iteration, slope=1.8, weight_min=0.1):
    """Odometry corner coefficients (feature_utils.h:42-61).

    weight = 1 - slope*|d| once iteration >= 5; valid iff weight > 0.1 and
    d != 0.  Returns (direction*w [N,3], d*w [N], valid [N]).
    """
    d, direction = line_point_distance(A, B, X)
    w = jnp.where(iteration >= 5, 1.0 - slope * jnp.abs(d), 1.0)
    valid = (w > weight_min) & (d != 0.0)
    return direction * w[..., None], d * w, valid


def corner_coeff_map(A, B, X, slope=0.9, weight_min=0.1):
    """Map corner coefficients (feature_utils.h:63-75): w = 1 - 0.9|d|."""
    d, direction = line_point_distance(A, B, X)
    w = 1.0 - slope * jnp.abs(d)
    valid = w > weight_min
    return direction * w[..., None], d * w, valid


def surf_coeff_odometry(A, B, C, X, iteration, slope=1.8, weight_min=0.1, eps=1e-12):
    """Odometry surface coefficients (feature_utils.h:77-95).

    weight = 1 - slope*|d| / sqrt(|X|) after iter 5 (note: sqrt of the norm,
    not the norm — reproducing the reference exactly).
    """
    d, n = surface_point_distance(A, B, C, X)
    xnorm = jnp.sqrt(jnp.maximum(jnp.linalg.norm(X, axis=-1), eps))
    w = jnp.where(iteration >= 5, 1.0 - slope * jnp.abs(d) / xnorm, 1.0)
    valid = (w > weight_min) & (d != 0.0)
    return n * w[..., None], d * w, valid


def surf_coeff_map(plane, X, slope=0.9, weight_min=0.1, eps=1e-12):
    """Map surface coefficients from a fitted plane (feature_utils.h:97-106).

    plane: [..., 4] (a,b,c,d) with |abc|=1.  Signed distance (not abs).
    """
    signed = jnp.sum(plane[..., :3] * X, axis=-1) + plane[..., 3]
    xnorm = jnp.sqrt(jnp.maximum(jnp.linalg.norm(X, axis=-1), eps))
    w = 1.0 - slope * jnp.abs(signed) / xnorm
    valid = w > weight_min
    return plane[..., :3] * w[..., None], signed * w, valid


def fit_line(neighbors, mask=None, eig_ratio=5.0, half_length=0.1):
    """5-point PCA line fit (findLine, feature_utils.h:108-154).

    neighbors: [..., K, 3].  Returns (A, B, valid): two points 0.1 m either
    side of the centroid along the principal direction; valid iff
    lambda_max > eig_ratio * lambda_mid.
    """
    k = neighbors.shape[-2]
    centroid = jnp.mean(neighbors, axis=-2, keepdims=True)
    a = neighbors - centroid
    cov = jnp.einsum("...ki,...kj->...ij", a, a) / k
    evals, evecs = jnp.linalg.eigh(cov)
    v = evecs[..., :, 2]
    valid = evals[..., 2] > eig_ratio * evals[..., 1]
    c = centroid[..., 0, :]
    A = c - half_length * v
    B = c + half_length * v
    if mask is not None:
        valid = valid & mask
    return A, B, valid


def fit_plane(neighbors, mask=None, max_dist=0.2, planar_ratio=0.05, eps=1e-12):
    """5-point least-squares plane (findPlane, feature_utils.h:156-204).

    Solves n . p = -1 in the least-squares sense, normalizes, sets
    d = -n . centroid, and rejects if any neighbor is further than
    ``max_dist`` from the plane.  Returns (plane [..., 4], valid).

    Additionally rejects *collinear* neighbor sets (mid/max covariance
    eigenvalue ratio below ``planar_ratio``).  The reference has no such
    check; with sparse maps its LSQ fit on five points from a single scan
    ring is ill-conditioned and produces arbitrary normals that bias the
    solve toward ring alignment.  Set ``planar_ratio=0`` for strict parity.
    """
    k = neighbors.shape[-2]
    AtA = jnp.einsum("...ki,...kj->...ij", neighbors, neighbors)
    Atb = -jnp.sum(neighbors, axis=-2)
    # 3x3 solve with regularization floor for robustness
    eye = jnp.eye(3, dtype=neighbors.dtype)
    n = jnp.linalg.solve(AtA + 1e-8 * eye, Atb[..., None])[..., 0]
    norm = jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), eps)
    n = n / norm
    centroid = jnp.mean(neighbors, axis=-2)
    d = -jnp.sum(n * centroid, axis=-1)
    dist = jnp.abs(jnp.einsum("...ki,...i->...k", neighbors, n) + d[..., None])
    valid = jnp.all(dist <= max_dist, axis=-1)
    if planar_ratio > 0.0:
        a = neighbors - centroid[..., None, :]
        cov = jnp.einsum("...ki,...kj->...ij", a, a) / k
        evals = jnp.linalg.eigvalsh(cov)
        valid = valid & (evals[..., 1] > planar_ratio * evals[..., 2])
    if mask is not None:
        valid = valid & mask
    plane = jnp.concatenate([n, d[..., None]], axis=-1)
    return plane, valid


# ---------------------------------------------------------------------------
# Component-plane variants (TPU layout): identical semantics to
# fit_line/fit_plane, but the K neighbor coordinates arrive as K separate
# [...] planes per axis instead of one [..., K, 3] tensor.  A trailing
# (K, 3) lands on the TPU (sublane, lane) axes padded (8, 128) — the
# [B, Q, 5, 3] gathers were a ~1.6 GB/iteration HBM allocation in the
# scan-to-map solve — and jnp.linalg.eigh/solve over [..., 3, 3] pads
# (4, 128).  Everything below is elementwise over the planes (closed-form
# 3x3 eigen-analysis from ops/eig3.py, adjugate solve for the plane fit).
# ---------------------------------------------------------------------------


def fit_line_planes(px, py, pz, mask=None, eig_ratio=5.0, half_length=0.1):
    """fit_line on K coordinate planes (px/py/pz: lists of K [...] arrays).

    Returns (A, B, valid) with A/B stacked [..., 3] (small outputs; only the
    K-neighbor intermediates must avoid the padded layout).
    """
    k = len(px)
    mx, my, mz = sum(px) / k, sum(py) / k, sum(pz) / k
    ax = [c - mx for c in px]
    ay = [c - my for c in py]
    az = [c - mz for c in pz]
    cxx = sum(a * a for a in ax) / k
    cyy = sum(a * a for a in ay) / k
    czz = sum(a * a for a in az) / k
    cxy = sum(a * b for a, b in zip(ax, ay)) / k
    cxz = sum(a * b for a, b in zip(ax, az)) / k
    cyz = sum(a * b for a, b in zip(ay, az)) / k
    lam0, lam1, lam2 = eig3.eigvalsh3(cxx, cxy, cxz, cyy, cyz, czz)
    vx, vy, vz = eig3.principal_evec3(cxx, cxy, cxz, cyy, cyz, czz, lam2)
    valid = lam2 > eig_ratio * lam1
    h = half_length
    A = jnp.stack([mx - h * vx, my - h * vy, mz - h * vz], axis=-1)
    B = jnp.stack([mx + h * vx, my + h * vy, mz + h * vz], axis=-1)
    if mask is not None:
        valid = valid & mask
    return A, B, valid


def fit_plane_planes(px, py, pz, mask=None, max_dist=0.2, planar_ratio=0.05,
                     eps=1e-12):
    """fit_plane on K coordinate planes.  Returns (plane [..., 4], valid).

    The 3x3 normal-equation solve is the closed-form symmetric adjugate
    (Cramer) — same 1e-8 diagonal regularization as the array variant.
    """
    k = len(px)
    mx, my, mz = sum(px) / k, sum(py) / k, sum(pz) / k
    # Sherman-Morrison: the n.p = -1 LSQ solution direction equals
    # -(C + eps I)^{-1} c with C the CENTERED covariance and c the centroid
    # (AtA = K(C + c c^T), Atb = -K c; the rank-1 term only rescales by the
    # positive scalar 1 + c^T C^{-1} c).  The centered minors are at
    # point-spread scale, so the f32 adjugate has no large-coordinate
    # cancellation — solving on raw second moments (entries ~ |p|^2) loses
    # ~3 digits and measurably biased the mapping solve.
    ax = [c - mx for c in px]
    ay = [c - my for c in py]
    az = [c - mz for c in pz]
    cxx = sum(a * a for a in ax) + 1e-8
    cyy = sum(a * a for a in ay) + 1e-8
    czz = sum(a * a for a in az) + 1e-8
    cxy = sum(a * b for a, b in zip(ax, ay))
    cxz = sum(a * b for a, b in zip(ax, az))
    cyz = sum(a * b for a, b in zip(ay, az))

    adj00 = cyy * czz - cyz * cyz
    adj01 = cxz * cyz - cxy * czz
    adj02 = cxy * cyz - cyy * cxz
    adj11 = cxx * czz - cxz * cxz
    adj12 = cxy * cxz - cxx * cyz
    adj22 = cxx * cyy - cxy * cxy
    # direction only — normalization absorbs det and the rank-1 scalar
    nx = -(adj00 * mx + adj01 * my + adj02 * mz)
    ny = -(adj01 * mx + adj11 * my + adj12 * mz)
    nz = -(adj02 * mx + adj12 * my + adj22 * mz)

    norm = jnp.maximum(jnp.sqrt(nx * nx + ny * ny + nz * nz), eps)
    nx, ny, nz = nx / norm, ny / norm, nz / norm
    d = -(nx * mx + ny * my + nz * mz)

    valid = jnp.ones_like(d, dtype=bool)
    for x, y, z in zip(px, py, pz):
        dist = jnp.abs(x * nx + y * ny + z * nz + d)
        valid = valid & (dist <= max_dist)
    if planar_ratio > 0.0:
        # reuse the centered covariance sums (eigenvalue RATIOS are
        # scale-invariant, and the 1e-8 diagonal floor is negligible)
        _, lam1, lam2 = eig3.eigvalsh3(cxx, cxy, cxz, cyy, cyz, czz)
        valid = valid & (lam1 > planar_ratio * lam2)
    if mask is not None:
        valid = valid & mask
    plane = jnp.stack([nx, ny, nz, d], axis=-1)
    return plane, valid
