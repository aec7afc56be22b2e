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
                     parity_mode: bool = False):
    """One correspondence+residual build at pose x.

    Returns (J, b, ok, line_found, plane_found) with J:[Nc+Ns,6].
    """
    pc = twist.point_to_map(x, corner.xyz)
    ps = twist.point_to_map(x, surf.xyz)

    idx_c, d_c = neighbors.knn_search(pc, ref_corner.xyz, ref_corner.mask,
                                      cfg.knn, chunk, cfg.kernel_backend)
    idx_s, d_s = neighbors.knn_search(ps, ref_surf.xyz, ref_surf.mask,
                                      cfg.knn, chunk, cfg.kernel_backend)

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

    # parity_mode disables the collinearity rejection: the reference's
    # findPlane (feature_utils.h:158-204) has no such check and accepts
    # every fit passing the 0.2 m inlier test.  On EXACTLY collinear 5-NN
    # sets (ray-cast scan columns; real voxel-filtered data never produces
    # them) the accepted normal is solver-arbitrary and irreproducible —
    # the golden scene jitters the map to keep every fit well-posed.
    sx, sy, sz = _planes(ref_surf.xyz, idx_s)
    plane, plane_ok = residuals.fit_plane_planes(
        sx, sy, sz, gate_s, cfg.plane_max_dist,
        planar_ratio=0.0 if parity_mode else 0.05,
    )
    dir_s, res_s, w_ok_s = residuals.surf_coeff_map(
        plane, ps, cfg.weight_slope, cfg.weight_min
    )
    ok_s = plane_ok & w_ok_s & gate_s

    # parity_mode reproduces the port's missing-parenthesis arz quirk
    # (ScanMatch.cpp:194, identical to LaserOdometry.cpp:567); the default
    # uses the corrected closed-form row (identical near sry ~ 0)
    J_c = _reference_jacobian_rows(x, corner.xyz, dir_c, port_typo=parity_mode)
    J_s = _reference_jacobian_rows(x, surf.xyz, dir_s, port_typo=parity_mode)

    J = jnp.concatenate([J_c, J_s], axis=0)
    b = jnp.concatenate([-res_c, -res_s], axis=0)
    ok = jnp.concatenate([ok_c, ok_s], axis=0)
    # match counters gate on the geometric fit only (ScanMatch.cpp:111,129)
    found = jnp.concatenate([line_ok & gate_c, plane_ok & gate_s], axis=0)
    return J, b, ok, found


@partial(jax.jit, static_argnames=("cfg", "chunk", "parity_mode"))
def scan_match(
    corner: Cloud,
    surf: Cloud,
    ref_corner: Cloud,
    ref_surf: Cloud,
    x0,
    cfg: ScanMatchConfig = ScanMatchConfig(),
    chunk: int = 512,
    parity_mode: bool = False,
) -> ScanMatchResult:
    """Refine a world pose against reference feature clouds.

    x0/x are TZYX twists (see utils/twist.point_to_map).  vmap freely.

    ``parity_mode=True`` reproduces the reference's literal iteration
    dynamics (ScanMatch.cpp:51-260): the port-typo arz Jacobian row and the
    row-zeroing degeneracy projector — asserted iteration-by-iteration
    against tests/ref_oracle.scan_match_scan.
    """

    enough_ref = (ref_corner.count() >= 50) & (ref_surf.count() >= 100)

    def step(st, it, compute_projector=False):
        J, b, ok, _ = _build_residuals(
            st.x, corner, surf, ref_corner, ref_surf, cfg, chunk, parity_mode
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
            reference_mode=parity_mode,
            compute_projector=compute_projector,
            lm_damping=cfg.lm_damping,
        )

    # iteration 0 peeled: the degeneracy eigendecomposition runs exactly once
    st = step(gn.gn_init(x0), jnp.int32(0), compute_projector=True)
    st = jax.lax.fori_loop(1, cfg.max_iterations, lambda it, s: step(s, it), st)

    # final diagnostics at the solution (score gate, ScanMatch.cpp:263-341).
    # Deliberate deviation: the reference scores the coeffSel of the final
    # iteration's PRE-update pose (the build the convergence break exited
    # from); here the score is recomputed AT the converged pose — identical
    # up to the sub-abort-threshold final step (<0.05 deg / 0.5 mm)
    J, b, ok, found = _build_residuals(
        st.x, corner, surf, ref_corner, ref_surf, cfg, chunk, parity_mode
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
    """Batched scan-to-map solves.

    When the reference clouds carry NO batch dimension (xyz [M, 3] instead
    of [B, M, 3]) they are SHARED across the batch and vmapped with
    in_axes=None: every real mapping/localization workload matches B frames
    against ONE surround map (the reference's own structure — one map, many
    queries, ScanMatch.cpp:97-132), and the unbatched operand lets the
    batched NN kernels keep one resident reference block instead of
    re-streaming per problem (reference HBM reads stop scaling with B).
    Results are bit-identical to broadcasting the reference to [B, ...].
    """
    shared_ref = ref_corner.xyz.ndim == 2
    fn = lambda a, b, c, d, x: scan_match(a, b, c, d, x, cfg, chunk)
    in_axes = (0, 0, None, None, 0) if shared_ref else (0, 0, 0, 0, 0)
    return jax.vmap(fn, in_axes=in_axes)(corner, surf, ref_corner, ref_surf, x0)
