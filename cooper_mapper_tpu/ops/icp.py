"""Point-to-point ICP — the coarse loop-closure aligner.

Functional equivalent of the PCL ICP used by ``LoopDetector::corseMatching``
(/root/reference/L_SLAM/src/pose_graph/loop_detector.hpp:228-250): iterate
nearest-neighbor correspondences and a closed-form rigid (Kabsch/Umeyama)
update.  Runs fully on device with masked fixed-shape clouds; batched via
vmap.  The fine alignment remains ops/scan_match.scan_match_local, exactly as
in the reference's coarse->fine cascade (:166-226).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils import se3
from ..utils.cloud import Cloud
from . import neighbors


def _kabsch(src, dst, w):
    """Weighted rigid fit dst ~ R src + t.  src/dst [N,3], w [N]."""
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    mu_s = jnp.sum(src * w[:, None], 0) / wsum
    mu_d = jnp.sum(dst * w[:, None], 0) / wsum
    S = (src - mu_s).T @ ((dst - mu_d) * w[:, None])
    U, _, Vt = jnp.linalg.svd(S)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.stack([jnp.float32(1), jnp.float32(1), d]))
    R = Vt.T @ D @ U.T
    t = mu_d - R @ mu_s
    return se3.make_mat(R, t)


@partial(jax.jit, static_argnames=("max_iterations",))
def icp(
    source: Cloud,
    target: Cloud,
    T0,
    max_iterations: int = 10,
    max_corr_dist: float = 2.0,
):
    """Align source onto target starting from T0.  Returns (T, rmse, n_inliers)."""

    def body(_, T):
        src_w = se3.apply(T, source.xyz)
        idx, d = neighbors.nn1(src_w, target.xyz, target.mask)
        ok = source.mask & (d < max_corr_dist**2)
        w = ok.astype(jnp.float32)
        T_fit = _kabsch(src_w, target.xyz[idx], w)
        return T_fit @ T

    T = jax.lax.fori_loop(0, max_iterations, body, T0)
    src_w = se3.apply(T, source.xyz)
    idx, d = neighbors.nn1(src_w, target.xyz, target.mask)
    ok = source.mask & (d < max_corr_dist**2)
    n = jnp.sum(ok)
    rmse = jnp.sqrt(jnp.sum(jnp.where(ok, d, 0.0)) / jnp.maximum(n, 1))
    return T, rmse, n
