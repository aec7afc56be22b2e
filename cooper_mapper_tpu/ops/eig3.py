"""Closed-form symmetric 3x3 eigen-analysis on component planes.

``jnp.linalg.eigh`` over a ``[..., 3, 3]`` stack forces the covariance
tensor into HBM with the trailing (3, 3) dims on the TPU (sublane, lane)
axes — padded (4, 128), a 56.9x expansion that turned the feature
classifier's 36 MB of covariances into a 2 GB allocation (measured OOM at
batch 256 sweeps).  This module computes eigenvalues and the principal
eigenvector of symmetric 3x3 matrices *elementwise over six component
planes* (cxx, cxy, cxz, cyy, cyz, czz), so every intermediate has the same
shape as one plane and XLA fuses the whole thing.

Math: Smith's trigonometric solution for the symmetric 3x3 eigenproblem
(O. K. Smith, Comm. ACM 4(4), 1961) + the cross-product method for the
eigenvector (rows of A - lambda*I span a rank-2 subspace; their pairwise
cross products all lie along the eigenvector — pick the largest for
numerical robustness).

Not autodiff-safe at degenerate spectra (arccos'(+-1) = inf — same hazard
class as so3_log, CLAUDE.md); intended for classification/fit gates, which
are not differentiated.
"""

from __future__ import annotations

import jax.numpy as jnp

_TWO_PI_3 = 2.0943951023931953  # 2*pi/3


def eigvalsh3(cxx, cxy, cxz, cyy, cyz, czz):
    """Eigenvalues (ascending) of symmetric 3x3 given component planes.

    Returns (l0, l1, l2), each shaped like the inputs.  Exact-isotropic
    matrices (p == 0) return (q, q, q).
    """
    q = (cxx + cyy + czz) / 3.0
    dxx, dyy, dzz = cxx - q, cyy - q, czz - q
    p2 = dxx * dxx + dyy * dyy + dzz * dzz + 2.0 * (
        cxy * cxy + cxz * cxz + cyz * cyz
    )
    p = jnp.sqrt(jnp.maximum(p2, 0.0) / 6.0)
    safe_p = jnp.where(p > 0.0, p, 1.0)
    # det((A - q I) / p) / 2, expanded elementwise
    bxx, byy, bzz = dxx / safe_p, dyy / safe_p, dzz / safe_p
    bxy, bxz, byz = cxy / safe_p, cxz / safe_p, cyz / safe_p
    detb = (
        bxx * (byy * bzz - byz * byz)
        - bxy * (bxy * bzz - byz * bxz)
        + bxz * (bxy * byz - byy * bxz)
    )
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    l2 = q + 2.0 * p * jnp.cos(phi)
    l0 = q + 2.0 * p * jnp.cos(phi + _TWO_PI_3)
    l1 = 3.0 * q - l2 - l0
    return l0, l1, l2


def principal_evec3(cxx, cxy, cxz, cyy, cyz, czz, lam):
    """Unit eigenvector for eigenvalue ``lam`` as component planes.

    Cross-product method: the rows of M = A - lam*I pairwise cross to
    vectors along the eigenspace; the largest cross product is kept.  For a
    (near-)isotropic M all crosses vanish — returns +x as the conventional
    direction (callers gate on eigenvalue ratios first, so the vector is
    only consumed when the spectrum is separated).
    Returns (vx, vy, vz).
    """
    m00, m11, m22 = cxx - lam, cyy - lam, czz - lam
    # rows: r0 = (m00, cxy, cxz), r1 = (cxy, m11, cyz), r2 = (cxz, cyz, m22)
    c01 = (
        cxy * cyz - cxz * m11,
        cxz * cxy - m00 * cyz,
        m00 * m11 - cxy * cxy,
    )
    c02 = (
        cxy * m22 - cxz * cyz,
        cxz * cxz - m00 * m22,
        m00 * cyz - cxy * cxz,
    )
    c12 = (
        m11 * m22 - cyz * cyz,
        cyz * cxz - cxy * m22,
        cxy * cyz - m11 * cxz,
    )
    n01 = c01[0] ** 2 + c01[1] ** 2 + c01[2] ** 2
    n02 = c02[0] ** 2 + c02[1] ** 2 + c02[2] ** 2
    n12 = c12[0] ** 2 + c12[1] ** 2 + c12[2] ** 2

    use02 = n02 >= n01
    bx = jnp.where(use02, c02[0], c01[0])
    by = jnp.where(use02, c02[1], c01[1])
    bz = jnp.where(use02, c02[2], c01[2])
    bn = jnp.where(use02, n02, n01)
    use12 = n12 >= bn
    bx = jnp.where(use12, c12[0], bx)
    by = jnp.where(use12, c12[1], by)
    bz = jnp.where(use12, c12[2], bz)
    bn = jnp.where(use12, n12, bn)

    ok = bn > 0.0
    inv = jnp.where(ok, 1.0 / jnp.sqrt(jnp.where(ok, bn, 1.0)), 0.0)
    vx = jnp.where(ok, bx * inv, 1.0)
    vy = jnp.where(ok, by * inv, 0.0)
    vz = jnp.where(ok, bz * inv, 0.0)
    return vx, vy, vz
