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
