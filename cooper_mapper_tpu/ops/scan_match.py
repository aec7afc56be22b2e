"""Scan-to-map Gauss-Newton solve with match-quality gating, batched.

TPU-native re-design of ``ScanMatch::scanMatchScan``
(/root/reference/L_SLAM/src/scan_to_scan_match/ScanMatch.cpp:51-347): per
iteration, register the current corner/surf features into the map frame, find
5-NN in the reference clouds, fit lines (PCA) to corner neighborhoods and
planes (LSQ) to surf neighborhoods, build masked 6-DoF normal equations with
the map-variant robust weights, apply the iteration-0 degeneracy projector
(eigen threshold 100), and gate the result on the residual score
``sum(exp(-|d|))`` and the matched fraction.

The closed-form Jacobian here is the *exact* analytic Jacobian of the warp
``p' = Rz Ry Rx p + t`` (verified against autodiff in tests) — the same rows
the reference builds at ScanMatch.cpp:185-195.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import ScanMatchConfig
from ..utils import twist
from ..utils.cloud import Cloud
from . import bucket_knn
from . import gauss_newton as gn
from . import neighbors, residuals
from .odometry import _reference_jacobian_rows
from .voxel import voxel_downsample


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ScanMatchResult:
    x: jax.Array          # [..., 6] refined pose (TZYX twist)
    success: jax.Array    # [...] bool — converged AND passed the score gate
    converged: jax.Array  # [...] bool
    score: jax.Array      # [...] sum(exp(-|weighted residual|))
    match_fraction: jax.Array
    n_matched: jax.Array
    is_degenerate: jax.Array
    iter_used: jax.Array
    enough_ref: jax.Array  # [...] bool — reference clouds met the size floor


def _build_residuals(x, corner: Cloud, surf: Cloud, ref_corner: Cloud,
                     ref_surf: Cloud, cfg: ScanMatchConfig, chunk: int,
                     grids=None):
    """One correspondence+residual build at pose x.

    Returns (J, b, ok, line_found, plane_found) with J:[Nc+Ns,6].
    """
    pc = twist.point_to_map(x, corner.xyz)
    ps = twist.point_to_map(x, surf.xyz)

    if grids is not None:
        grid_c, grid_s = grids
        idx_c, d_c = bucket_knn.query(grid_c, ref_corner.xyz, ref_corner.mask, pc, cfg.knn)
        idx_s, d_s = bucket_knn.query(grid_s, ref_surf.xyz, ref_surf.mask, ps, cfg.knn)
    else:
        idx_c, d_c = neighbors.knn_search(pc, ref_corner.xyz, ref_corner.mask, cfg.knn, chunk)
        idx_s, d_s = neighbors.knn_search(ps, ref_surf.xyz, ref_surf.mask, cfg.knn, chunk)

    gate_c = (d_c[:, -1] < cfg.nn_sq_dist_max) & corner.mask
    gate_s = (d_s[:, -1] < cfg.nn_sq_dist_max) & surf.mask

    # neighbor coordinates as per-k component planes ([Nc] each) — a
    # [Nc, k, 3] gather pads its (k, 3) tail to (8, 128) on TPU
    # (~1.6 GB/iteration at batch 64; see residuals.fit_line_planes)
    def _planes(ref_xyz, idx):
        return tuple(
            [ref_xyz[..., ax][idx[:, j]] for j in range(idx.shape[1])]
            for ax in range(3)
        )

    cx, cy, cz = _planes(ref_corner.xyz, idx_c)
    A, B, line_ok = residuals.fit_line_planes(cx, cy, cz, gate_c,
                                              cfg.line_eig_ratio)
    dir_c, res_c, w_ok_c = residuals.corner_coeff_map(
        A, B, pc, cfg.weight_slope, cfg.weight_min
    )
    ok_c = line_ok & w_ok_c & gate_c

    sx, sy, sz = _planes(ref_surf.xyz, idx_s)
    plane, plane_ok = residuals.fit_plane_planes(sx, sy, sz, gate_s,
                                                 cfg.plane_max_dist)
    dir_s, res_s, w_ok_s = residuals.surf_coeff_map(
        plane, ps, cfg.weight_slope, cfg.weight_min
    )
    ok_s = plane_ok & w_ok_s & gate_s

    J_c = _reference_jacobian_rows(x, corner.xyz, dir_c)
    J_s = _reference_jacobian_rows(x, surf.xyz, dir_s)

    J = jnp.concatenate([J_c, J_s], axis=0)
    b = jnp.concatenate([-res_c, -res_s], axis=0)
    ok = jnp.concatenate([ok_c, ok_s], axis=0)
    # match counters gate on the geometric fit only (ScanMatch.cpp:111,129)
    found = jnp.concatenate([line_ok & gate_c, plane_ok & gate_s], axis=0)
    return J, b, ok, found


@partial(jax.jit, static_argnames=("cfg", "chunk"))
def scan_match(
    corner: Cloud,
    surf: Cloud,
    ref_corner: Cloud,
    ref_surf: Cloud,
    x0,
    cfg: ScanMatchConfig = ScanMatchConfig(),
    chunk: int = 512,
) -> ScanMatchResult:
    """Refine a world pose against reference feature clouds.

    x0/x are TZYX twists (see utils/twist.point_to_map).  vmap freely.
    """

    enough_ref = (ref_corner.count() >= 50) & (ref_surf.count() >= 100)

    # the reference clouds are fixed for the whole solve: bucket them once
    # (the per-cube kd-tree build of FeatureMap.h:438,453 / ScanMatch.cpp:75)
    grids = None
    if cfg.use_bucket_grid:
        grids = (
            bucket_knn.build(ref_corner.xyz, ref_corner.mask, cfg.bucket_cell,
                             cfg.bucket_hash_bits, cfg.bucket_capacity),
            bucket_knn.build(ref_surf.xyz, ref_surf.mask, cfg.bucket_cell,
                             cfg.bucket_hash_bits, cfg.bucket_capacity),
        )

    def step(st, it, compute_projector=False):
        J, b, ok, _ = _build_residuals(
            st.x, corner, surf, ref_corner, ref_surf, cfg, chunk, grids
        )
        JtJ, Jtb, n_valid = gn.assemble_normal_eqs(J, b, ok)
        return gn.gn_step(
            st, JtJ, Jtb,
            jnp.where(enough_ref, n_valid, 0.0),
            it,
            cfg.eig_threshold,
            cfg.delta_r_abort,
            cfg.delta_t_abort,
            cfg.min_matched,
            compute_projector=compute_projector,
        )

    # iteration 0 peeled: the degeneracy eigendecomposition runs exactly once
    st = step(gn.gn_init(x0), jnp.int32(0), compute_projector=True)
    st = jax.lax.fori_loop(1, cfg.max_iterations, lambda it, s: step(s, it), st)

    # final diagnostics at the solution (score gate, ScanMatch.cpp:263-341)
    J, b, ok, found = _build_residuals(
        st.x, corner, surf, ref_corner, ref_surf, cfg, chunk, grids
    )
    score = jnp.sum(jnp.where(ok, jnp.exp(-jnp.abs(b)), 0.0), axis=-1)
    total = corner.count() + surf.count()
    match_fraction = jnp.sum(found, axis=-1) / jnp.maximum(total, 1)

    gated = (score >= cfg.score_threshold) & (
        match_fraction >= cfg.match_percentage_threshold
    ) if cfg.use_score else jnp.ones_like(st.converged)
    success = st.converged & gated & enough_ref

    return ScanMatchResult(
        x=st.x,
        success=success,
        converged=st.converged,
        score=score,
        match_fraction=match_fraction,
        n_matched=st.n_matched,
        is_degenerate=st.is_degenerate,
        iter_used=st.iter_used,
        enough_ref=enough_ref,
    )


def scan_match_local(
    corner: Cloud,
    surf: Cloud,
    ref_corner: Cloud,
    ref_surf: Cloud,
    x0,
    cfg: ScanMatchConfig = ScanMatchConfig(),
    chunk: int = 512,
) -> ScanMatchResult:
    """scanMatchLocal (ScanMatch.cpp:375-398): voxel-downsample both sides
    (corner 0.2 m / surf 0.4 m leaves), then scan_match."""
    return scan_match(
        voxel_downsample(corner, cfg.local_corner_leaf),
        voxel_downsample(surf, cfg.local_surf_leaf),
        voxel_downsample(ref_corner, cfg.local_corner_leaf),
        voxel_downsample(ref_surf, cfg.local_surf_leaf),
        x0,
        cfg,
        chunk,
    )


def batch_scan_match(corner, surf, ref_corner, ref_surf, x0, cfg, chunk=512):
    fn = lambda a, b, c, d, x: scan_match(a, b, c, d, x, cfg, chunk)
    return jax.vmap(fn)(corner, surf, ref_corner, ref_surf, x0)
