"""Scan-to-scan Gauss-Newton odometry solve, batched.

TPU-native re-design of ``LaserOdometry::scanMatch``
(/root/reference/L_SLAM/src/odometry/LaserOdometry.cpp:328-647): per iteration,
motion-compensate the sharp/flat features to the sweep start, find point-to-line
and point-to-plane correspondences against the previous sweep's feature clouds
(refreshed every 5th iteration exactly like the reference, :358), build masked
6-DoF normal equations, apply the iteration-0 degeneracy projector, and update
the twist until deltaR/deltaT fall below the abort thresholds (:636-644).

Two solver modes:
* ``parity_mode=False`` (default, TPU-native): exact per-point Jacobians of the
  in-sweep warp via forward-mode autodiff (each point linearized at its own
  time fraction), full GN steps.  Converges in a handful of iterations.
* ``parity_mode=True``: the reference's closed-form Jacobian evaluated at s=1
  with the -0.05 residual under-relaxation (:512-575), reproducing its exact
  iteration dynamics.

Batch over sweeps with jax.vmap (see batch_odometry_solve).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import OdometryConfig
from ..utils import twist
from ..utils.cloud import Cloud
from . import gauss_newton as gn
from . import neighbors, residuals


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Correspondences:
    """Prefetched correspondence geometry for one refresh block.

    Neighbor coordinates are gathered once at refresh time (the indices are
    frozen for the whole block), so the inner GN iterations run gather-free.
    """

    A_c: jax.Array   # [Nc, 3] corner line endpoint A
    B_c: jax.Array   # [Nc, 3] corner line endpoint B
    ok_c: jax.Array  # [Nc]
    A_s: jax.Array   # [Ns, 3] surf tripod A
    B_s: jax.Array   # [Ns, 3]
    C_s: jax.Array   # [Ns, 3]
    ok_s: jax.Array  # [Ns]


def _tzyx_rotation_rows(srx, crx, sry, cry, srz, crz, points, coeff_dir):
    """coeff . d(Rz Ry Rx p)/d(rx, ry, rz) with per-point angle sines/cosines.

    The closed-form trig rows of LaserOdometry.cpp:557-575, generalized to
    elementwise angles so the exact time-scaled Jacobian can reuse them.
    """
    px, py, pz = points[..., 0], points[..., 1], points[..., 2]
    cx, cy, cz = coeff_dir[..., 0], coeff_dir[..., 1], coeff_dir[..., 2]

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
        (-srz * cry * px - (srz * sry * srx + crz * crx) * py + (crz * srx - srz * sry * crx) * pz) * cx
        + (crz * cry * px + (crz * sry * srx - srz * crx) * py + (crz * sry * crx + srz * srx) * pz) * cy
    )
    return arx, ary, arz


def _reference_jacobian_rows(x, points, coeff_dir, port_typo: bool = False):
    """The reference's closed-form Jacobian at s=1 (LaserOdometry.cpp:557-575).

    The same rows as the exact map-warp Jacobian d(Rz Ry Rx p + t)/d(params)
    dotted with coeff — the reference applies it to the start-warp too.

    ``port_typo=True`` reproduces the reference's missing-parenthesis quirk
    in the arz row: its coeff.y term reads ``... + crz*sry*crx +
    srz*srx*pointOri.z`` (LaserOdometry.cpp:567, identically in
    ScanMatch.cpp:194), i.e. the ``crz*sry*crx`` product is NOT multiplied
    by pointOri.z — where the commented-out original (and the correct
    derivative) has ``(crz*sry*crx + srz*srx) * pointOri.z``.  The typo adds
    a constant ``crz*sry*crx*(1 - pz)`` per row; near identity (sry ~ 0) it
    vanishes, which is why the reference converges anyway.  Used by
    parity_mode for bit-faithful iteration dynamics.
    """
    srx, crx = jnp.sin(x[0]), jnp.cos(x[0])
    sry, cry = jnp.sin(x[1]), jnp.cos(x[1])
    srz, crz = jnp.sin(x[2]), jnp.cos(x[2])
    arx, ary, arz = _tzyx_rotation_rows(
        srx, crx, sry, cry, srz, crz, points, coeff_dir,
    )
    cx, cy, cz = coeff_dir[..., 0], coeff_dir[..., 1], coeff_dir[..., 2]
    if port_typo:
        arz = arz + (crz * sry * crx) * (1.0 - points[..., 2]) * cy
    return jnp.stack([arx, ary, arz, cx, cy, cz], axis=-1)


def _exact_jacobian_rows(x, pts, s, coeff_dir):
    """Exact d(coeff . warp_to_start(x, p, s))/dx rows, closed form: [N, 6].

    warp_to_start applies TZYX(s*x), so by the chain rule the row is
    ``s * J_tzyx(s*x, p)`` — the reference's trig rows evaluated at the
    per-point scaled angles, times the time fraction (the translation
    columns scale identically: d(s*t)/dt = s).  Matches jacfwd of the warp
    to float tolerance (tests/test_odometry.py) at a third of the FLOPs.
    """
    a, b, c = s * x[0], s * x[1], s * x[2]
    arx, ary, arz = _tzyx_rotation_rows(
        jnp.sin(a), jnp.cos(a), jnp.sin(b), jnp.cos(b), jnp.sin(c),
        jnp.cos(c), pts, coeff_dir,
    )
    rows = jnp.stack(
        [arx, ary, arz, coeff_dir[..., 0], coeff_dir[..., 1],
         coeff_dir[..., 2]], axis=-1,
    )
    return s[..., None] * rows


def _exact_jacobian_rows_rigid(x, pts, coeff_dir):
    """``_exact_jacobian_rows`` at s == 1, bit-for-bit, at scalar trig cost.

    The cv_dewarp solve (the native default) rewrites every query's time
    fraction to 1 before solving, so the per-point scaled angles ``s*x`` all
    equal the per-problem twist: the 12 transcendentals per point per
    iteration collapse to 6 per PROBLEM (sin/cos on scalars, coefficient
    products computed once and broadcast).  Values are identical — ``1.0*v``
    is ``v`` and the combine tree is unchanged (pinned bitwise by
    tests/test_odometry.py::test_rigid_paths_bitwise).
    """
    srx, crx = jnp.sin(x[0]), jnp.cos(x[0])
    sry, cry = jnp.sin(x[1]), jnp.cos(x[1])
    srz, crz = jnp.sin(x[2]), jnp.cos(x[2])
    arx, ary, arz = _tzyx_rotation_rows(
        srx, crx, sry, cry, srz, crz, pts, coeff_dir,
    )
    return jnp.stack(
        [arx, ary, arz, coeff_dir[..., 0], coeff_dir[..., 1],
         coeff_dir[..., 2]], axis=-1,
    )


def _find_correspondences(x, sharp: Cloud, flat: Cloud, last_corner: Cloud,
                          last_surf: Cloud, cfg: OdometryConfig,
                          rigid: bool = False):
    if rigid:
        # cv_dewarp clouds carry rel_time == 1: the start-warp is the rigid
        # TZYX(x) transform — scalar trig instead of per-point (bit-identical)
        pc = twist.point_to_map(x, sharp.xyz)
        ps = twist.point_to_map(x, flat.xyz)
    else:
        pc = twist.warp_to_start(x, sharp.xyz, sharp.rel_time)
        ps = twist.warp_to_start(x, flat.xyz, flat.rel_time)
    ia_c, ib_c, ok_c = neighbors.corner_pairs(
        pc, last_corner, cfg.nn_sq_dist_max, cfg.ring_span, cfg.n_rings,
        cfg.nn_query_chunk, precision=cfg.nn_precision,
        backend=cfg.kernel_backend,
    )
    ia_s, ib_s, ic_s, ok_s = neighbors.surf_triples(
        ps, last_surf, cfg.nn_sq_dist_max, cfg.ring_span, cfg.n_rings,
        cfg.nn_query_chunk, precision=cfg.nn_precision,
        backend=cfg.kernel_backend,
    )
    return Correspondences(
        A_c=last_corner.xyz[ia_c],
        B_c=last_corner.xyz[ib_c],
        ok_c=ok_c & sharp.mask,
        A_s=last_surf.xyz[ia_s],
        B_s=last_surf.xyz[ib_s],
        C_s=last_surf.xyz[ic_s],
        ok_s=ok_s & flat.mask,
    )


def _odometry_solve_pass(
    sharp: Cloud,
    flat: Cloud,
    last_corner: Cloud,
    last_surf: Cloud,
    x0,
    cfg: OdometryConfig = OdometryConfig(),
    parity_mode: bool = False,
):
    """One de-warp/solve pass.  Returns (x [6], GNState diagnostics).

    ``x`` parameterizes the sweep motion exactly as the reference ``_transform``
    (see utils/twist.py): warp_to_start(x, p, s) projects a point captured at
    time fraction s back to the sweep-start frame.

    Structure: an unrolled outer loop over correspondence refreshes with an
    inner fori_loop of GN iterations on the frozen correspondence set.  The
    naive ``lax.cond(it % 5 == 0, refresh, keep)`` formulation turns into a
    *select* under vmap and evaluates the expensive NN search every
    iteration; this refresh-block structure runs it exactly
    ceil(max_iterations / refresh_every) times, matching the reference's
    schedule (LaserOdometry.cpp:358) at a fifth of the cost.
    """

    # cv_dewarp rewrites rel_time to 1 below, making every in-solve warp the
    # rigid TZYX(x): per-point trig (12 transcendental arrays per iteration)
    # collapses to per-problem scalars.  Bit-identical (tests pin it); on
    # chip it measures perf-NEUTRAL — the in-jit ones are a constant, so XLA
    # already folds s*x and sinks the broadcasts below sin/cos — but the
    # explicit path no longer depends on the simplifier spotting that.
    rigid = bool(cfg.cv_dewarp and not parity_mode)

    def step(st, corr, it, compute_projector=False):
        if rigid:
            pc = twist.point_to_map(st.x, sharp.xyz)
            ps = twist.point_to_map(st.x, flat.xyz)
        else:
            pc = twist.warp_to_start(st.x, sharp.xyz, sharp.rel_time)
            ps = twist.warp_to_start(st.x, flat.xyz, flat.rel_time)

        dir_c, res_c, w_ok_c = residuals.corner_coeff_odometry(
            corr.A_c, corr.B_c, pc, it, cfg.corner_weight_slope, cfg.weight_min
        )
        ok_c = w_ok_c & corr.ok_c

        dir_s, res_s, w_ok_s = residuals.surf_coeff_odometry(
            corr.A_s, corr.B_s, corr.C_s, ps, it, cfg.corner_weight_slope,
            cfg.weight_min
        )
        ok_s = w_ok_s & corr.ok_s

        if parity_mode:
            # port_typo: the reference's missing-parenthesis arz quirk
            # (LaserOdometry.cpp:567) — bit-faithful iteration dynamics
            J_c = _reference_jacobian_rows(st.x, sharp.xyz, dir_c, port_typo=True)
            J_s = _reference_jacobian_rows(st.x, flat.xyz, dir_s, port_typo=True)
            scale = cfg.residual_scale
        elif rigid:
            J_c = _exact_jacobian_rows_rigid(st.x, sharp.xyz, dir_c)
            J_s = _exact_jacobian_rows_rigid(st.x, flat.xyz, dir_s)
            scale = 1.0
        else:
            J_c = _exact_jacobian_rows(st.x, sharp.xyz, sharp.rel_time, dir_c)
            J_s = _exact_jacobian_rows(st.x, flat.xyz, flat.rel_time, dir_s)
            scale = 1.0

        J = jnp.concatenate([J_c, J_s], axis=0)
        b = jnp.concatenate([-scale * res_c, -scale * res_s], axis=0)
        ok = jnp.concatenate([ok_c, ok_s], axis=0)

        JtJ, Jtb, n_valid = gn.assemble_normal_eqs(J, b, ok)
        st = gn.gn_step(
            st,
            JtJ,
            Jtb,
            n_valid,
            it,
            cfg.eig_threshold,
            cfg.delta_r_abort,
            cfg.delta_t_abort,
            cfg.min_matched,
            # parity uses the Eigen port's row-zeroing projector
            # (matV.inverse() @ matV_rows_zeroed, LaserOdometry.cpp:583-608)
            reference_mode=parity_mode,
            trust_region_t=0.0 if parity_mode else cfg.trust_region_t,
            trust_region_r=0.0 if parity_mode else cfg.trust_region_r,
            min_converge_iter=0 if parity_mode else cfg.min_converge_iter,
            compute_projector=compute_projector,
        )
        return st


    x_base = None
    if cfg.cv_dewarp and not parity_mode:
        # constant-velocity de-warp: remove the predicted in-sweep motion
        # (x0, the previous twist) from the query clouds, then solve the
        # residual motion rigidly (rel_time = 1 for every point, so the
        # warp is the full TZYX(delta)).  The chained reference-projection
        # feedback is stable this way (see OdometryConfig.cv_dewarp).
        sharp = dataclasses.replace(
            sharp,
            xyz=twist.warp_to_start(x0, sharp.xyz, sharp.rel_time),
            rel_time=jnp.ones_like(sharp.rel_time),
        )
        flat = dataclasses.replace(
            flat,
            xyz=twist.warp_to_start(x0, flat.xyz, flat.rel_time),
            rel_time=jnp.ones_like(flat.rel_time),
        )
        x_base = x0
        x0 = jnp.zeros_like(x0)

    st = gn.gn_init(x0)
    n_blocks = -(-cfg.max_iterations // cfg.refresh_every)
    for block in range(n_blocks):
        corr = _find_correspondences(
            st.x, sharp, flat, last_corner, last_surf, cfg, rigid=rigid
        )
        start = block * cfg.refresh_every
        stop = min(start + cfg.refresh_every, cfg.max_iterations)
        if block == 0:
            # peel iteration 0: the only eigendecomposition (degeneracy
            # projector) runs once here instead of inside the device loop
            st = step(st, corr, jnp.int32(0), compute_projector=True)
            start = 1
        if cfg.unroll_iters:
            # fully unrolled: lax loop boundaries around each refresh block
            # defeat XLA's fusion of the correspondence search with its
            # consumers (measured ~100 ms/block at batch 512 on TPU)
            for it in range(start, stop):
                st = step(st, corr, jnp.int32(it))
        else:
            # corr is closure-captured (a loop-INVARIANT input), not carried:
            # carrying the ~44 MB correspondence arrays through the while
            # tuple leaves XLA to prove them unchanged; as captured constants
            # they cannot be copied per trip by construction
            st = jax.lax.fori_loop(
                start, stop, lambda it, s: step(s, corr, it), st
            )
    if x_base is not None:
        # compose the de-warp prior back in: total sweep motion
        # M = TZYX(delta) @ TZYX(x_prev)
        x_total = twist.from_relative_motion(
            twist.to_mat(st.x) @ twist.to_mat(x_base)
        )
        st = dataclasses.replace(st, x=x_total)
    return st.x, st


@partial(jax.jit, static_argnames=("cfg", "parity_mode"))
def odometry_solve(
    sharp: Cloud,
    flat: Cloud,
    last_corner: Cloud,
    last_surf: Cloud,
    x0,
    cfg: OdometryConfig = OdometryConfig(),
    parity_mode: bool = False,
):
    """Solve the in-sweep motion twist.  Returns (x [6], GNState diagnostics).

    With ``cfg.dewarp_passes > 1`` (cv_dewarp only), pass k re-de-warps the
    ORIGINAL clouds with pass k-1's solved twist and re-solves: the
    constant-velocity prior is exact only at constant motion, and under a
    varying yaw rate the residual in-sweep distortion biases the rigid fit
    (see OdometryConfig.dewarp_passes).  Correspondence schedule per pass
    matches the reference (LaserOdometry.cpp:358).
    """
    x, st = _odometry_solve_pass(
        sharp, flat, last_corner, last_surf, x0, cfg, parity_mode
    )
    if cfg.cv_dewarp and not parity_mode:
        for _ in range(max(cfg.dewarp_passes, 1) - 1):
            x, st = _odometry_solve_pass(
                sharp, flat, last_corner, last_surf, x, cfg, parity_mode
            )
    return x, st


def batch_odometry_solve(sharp, flat, last_corner, last_surf, x0, cfg, parity_mode=False):
    """vmapped odometry solve over a leading batch dim.

    Reference clouds WITHOUT a batch dim (xyz [M, 3]) are shared across the
    batch (vmap in_axes=None) — many sweeps tracked against one previous
    frame (relocalization bursts, the broadcast bench shape): the batched
    race kernels then keep a single resident reference block instead of
    re-streaming it per problem.  Bit-identical to broadcasting.
    """
    shared_ref = last_corner.xyz.ndim == 2
    fn = lambda a, b, c, d, x: odometry_solve(a, b, c, d, x, cfg, parity_mode)
    in_axes = (0, 0, None, None, 0) if shared_ref else (0, 0, 0, 0, 0)
    return jax.vmap(fn, in_axes=in_axes)(sharp, flat, last_corner, last_surf, x0)
