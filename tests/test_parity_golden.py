"""Golden-parity: parity_mode reproduces the reference iteration dynamics.

tests/ref_oracle.py is a literal numpy transcription of
LaserOdometry::scanMatch (LaserOdometry.cpp:328-647) + feature_utils.h
kernels.  These tests drive the SAME sweep pair through the oracle and
through ops.odometry.odometry_solve(parity_mode=True) and assert the
iteration-by-iteration -0.05 under-relaxed trace matches — including the
port's missing-parenthesis arz Jacobian quirk (LaserOdometry.cpp:567) and
the row-zeroing degeneracy projector (:583-608).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import ref_oracle
from cooper_mapper_tpu.config import OdometryConfig, RegistrationConfig
from cooper_mapper_tpu.io import sim
from cooper_mapper_tpu.ops import features as feat_ops
from cooper_mapper_tpu.ops import gauss_newton as gn
from cooper_mapper_tpu.ops import odometry as odo_ops
from cooper_mapper_tpu.utils import cloud as cloud_lib


def _ring_major_dense(c: cloud_lib.Cloud):
    """Valid points of a Cloud, ring-major sorted (ring asc, azimuth asc) —
    the layout the reference's index walks assume
    (MultiScanRegistration.cpp:179-190)."""
    m = np.asarray(c.mask)
    xyz = np.asarray(c.xyz)[m]
    ring = np.asarray(c.ring)[m]
    rel = np.asarray(c.rel_time)[m]
    order = np.lexsort((rel, ring))
    return xyz[order], ring[order], rel[order]


def _to_cloud(xyz, ring, rel, cap):
    return cloud_lib.from_points(
        jnp.asarray(xyz), capacity=cap, ring=ring, rel_time=rel
    )


@pytest.fixture(scope="module")
def sweep_pair():
    """Two consecutive simulated sweeps; solve sweep1 against sweep0's
    less-sharp/less-flat clouds (the reference's first pair keeps sweep0
    unprojected, LaserOdometry.cpp:295-303)."""
    world = sim.make_room_world(size=(24.0, 4.0, 30.0), n_pillars=6, seed=5)
    cfg_r = RegistrationConfig(
        n_rings=8, max_points_per_ring=256, max_sharp=64,
        max_less_sharp=512, max_flat=128, max_less_flat=2048,
    )
    p0 = np.eye(4, dtype=np.float32)
    p0[1, 3] = 1.5
    step = np.eye(4, dtype=np.float32)
    step[2, 3] = 0.3
    c, s = np.cos(0.02), np.sin(0.02)
    step[0, 0], step[0, 2], step[2, 0], step[2, 2] = c, s, -s, c
    p1 = p0 @ step
    p2 = p1 @ step
    sw0 = sim.scan_sweep(world, jnp.asarray(p0), jnp.asarray(p1),
                         n_rings=8, width=256)
    sw1 = sim.scan_sweep(world, jnp.asarray(p1), jnp.asarray(p2),
                         n_rings=8, width=256)
    fc0 = feat_ops.extract_features(sw0, cfg_r)
    fc1 = feat_ops.extract_features(sw1, cfg_r)

    refc_xyz, refc_ring, refc_rel = _ring_major_dense(fc0.less_sharp)
    refs_xyz, refs_ring, refs_rel = _ring_major_dense(fc0.less_flat)
    sharp_xyz, sharp_ring, sharp_rel = _ring_major_dense(fc1.sharp)
    flat_xyz, flat_ring, flat_rel = _ring_major_dense(fc1.flat)

    last_corner = _to_cloud(refc_xyz, refc_ring, refc_rel, 512)
    last_surf = _to_cloud(refs_xyz, refs_ring, refs_rel, 2048)
    sharp = _to_cloud(sharp_xyz, sharp_ring, sharp_rel, 128)
    flat = _to_cloud(flat_xyz, flat_ring, flat_rel, 512)

    return dict(
        refc=(refc_xyz, refc_ring), refs=(refs_xyz, refs_ring),
        sharp=(sharp_xyz, sharp_rel), flat=(flat_xyz, flat_rel),
        clouds=(sharp, flat, last_corner, last_surf),
    )


@pytest.fixture(scope="module")
def golden_trace(sweep_pair):
    sp = sweep_pair
    return ref_oracle.odometry_scan_match(
        sp["sharp"][0].astype(np.float64), sp["sharp"][1].astype(np.float64),
        sp["flat"][0].astype(np.float64), sp["flat"][1].astype(np.float64),
        sp["refc"][0].astype(np.float64), sp["refc"][1],
        sp["refs"][0].astype(np.float64), sp["refs"][1],
    )


def _solve_parity(sweep_pair, k):
    sharp, flat, last_corner, last_surf = sweep_pair["clouds"]
    cfg = OdometryConfig(max_iterations=k, n_rings=8)
    x, st = odo_ops.odometry_solve(
        sharp, flat, last_corner, last_surf, jnp.zeros(6), cfg,
        parity_mode=True,
    )
    return np.asarray(x), st


class TestGoldenTrace:
    def test_oracle_is_meaningful(self, golden_trace):
        """The oracle itself converges toward the simulated motion (z ~ 0.3 m
        forward, yaw ~ 0.02): the transcription is solving the real problem."""
        x_final = golden_trace[-1].x
        assert len(golden_trace) >= 5
        assert golden_trace[0].n_selected > 50
        # the -0.05 under-relaxation leaves a partial step after 25 iters;
        # direction must match the true motion
        assert x_final[5] > 0.05, f"no forward progress: {x_final}"
        assert abs(x_final[3]) < 0.2 and abs(x_final[4]) < 0.2

    def test_iteration_trace_matches(self, sweep_pair, golden_trace):
        """parity_mode x after k iterations == oracle trace, iteration by
        iteration — any drift in the -0.05 dynamics, the refresh schedule,
        the weight-after-iter-5 rule, or the arz quirk diverges this."""
        for k in (1, 2, 5, 7, 10, 25):
            x_repo, _ = _solve_parity(sweep_pair, k)
            rec = golden_trace[k - 1] if len(golden_trace) >= k else golden_trace[-1]
            err = np.abs(x_repo - rec.x)
            assert np.all(err[:3] < 3e-4) and np.all(err[3:] < 3e-4), (
                f"iter {k}: repo {x_repo} vs oracle {rec.x} (|err| {err})"
            )

    def test_matched_count_matches(self, sweep_pair, golden_trace):
        x_repo, st = _solve_parity(sweep_pair, 25)
        rec = golden_trace[-1]
        # n_matched is the last build's row count; the trace may end on a
        # converged break, so compare against the matching oracle iteration
        repo_n = int(np.asarray(st.n_matched))
        oracle_iters = {r.iteration: r.n_selected for r in golden_trace}
        assert any(
            abs(repo_n - n) <= 2 for n in oracle_iters.values()
        ), f"repo n_matched {repo_n} not near any oracle count {oracle_iters}"

    def test_refresh_schedule_divergence_detected(self, sweep_pair, golden_trace):
        """Sanity that the comparison has teeth: a WRONG residual scale
        visibly diverges from the golden trace."""
        sharp, flat, last_corner, last_surf = sweep_pair["clouds"]
        cfg = OdometryConfig(max_iterations=10, n_rings=8,
                             residual_scale=0.10)   # wrong: reference is 0.05
        x_bad, _ = odo_ops.odometry_solve(
            sharp, flat, last_corner, last_surf, jnp.zeros(6), cfg,
            parity_mode=True,
        )
        rec = golden_trace[9] if len(golden_trace) >= 10 else golden_trace[-1]
        assert np.max(np.abs(np.asarray(x_bad) - rec.x)) > 1e-3


class TestKernelParity:
    def test_arz_typo_row(self):
        """_reference_jacobian_rows(port_typo=True) == the literal C++ rows
        (including the missing-parenthesis arz term)."""
        rng = np.random.RandomState(0)
        x = rng.randn(6).astype(np.float32) * 0.3
        pts = rng.randn(32, 3).astype(np.float32)
        dirs = rng.randn(32, 3).astype(np.float32)
        J = np.asarray(odo_ops._reference_jacobian_rows(
            jnp.asarray(x), jnp.asarray(pts), jnp.asarray(dirs), port_typo=True
        ))
        for i in range(32):
            row = ref_oracle.jacobian_row(
                x.astype(np.float64), pts[i].astype(np.float64),
                dirs[i].astype(np.float64),
            )
            np.testing.assert_allclose(J[i], row, rtol=1e-4, atol=1e-5)

    def test_typo_differs_from_exact(self):
        """The quirk is real: at nonzero pitch the typo'd row differs from
        the correct derivative (and parity must use the typo'd one)."""
        x = jnp.asarray([0.05, 0.2, 0.1, 0, 0, 0], jnp.float32)
        pts = jnp.asarray([[1.0, 2.0, 3.0]], jnp.float32)
        dirs = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
        J_typo = np.asarray(odo_ops._reference_jacobian_rows(x, pts, dirs, port_typo=True))
        J_fix = np.asarray(odo_ops._reference_jacobian_rows(x, pts, dirs))
        assert abs(J_typo[0, 2] - J_fix[0, 2]) > 1e-3

    def test_projector_row_zeroing(self):
        """reference_mode projector == oracle inv(V) @ rows-zeroed(V) on the
        same matrix (both LAPACK eigh on float32 input).

        Eigenvalues are kept WELL SEPARATED: the reference's row-zeroing
        projector is basis-dependent inside (near-)degenerate eigenspaces —
        with two near-equal tiny eigenvalues, any orthogonal basis of that
        subspace is a valid eigendecomposition and P differs between them
        (an inherent irreproducibility of the port's formula, not a bug
        here)."""
        rng = np.random.RandomState(1)
        Q, _ = np.linalg.qr(rng.randn(6, 6))
        evals = np.array([0.5, 3.0, 20.0, 40.0, 80.0, 200.0])
        A = (Q @ np.diag(evals) @ Q.T).astype(np.float32)
        P_jax, deg = gn.degeneracy_projector(
            jnp.asarray(A), 10.0, reference_mode=True
        )
        P_np, deg_np = ref_oracle.degeneracy_projector(
            np.asarray(A, np.float32), 10.0
        )
        assert bool(deg) and deg_np
        np.testing.assert_allclose(np.asarray(P_jax), P_np, atol=5e-3)

    def test_coefficients_match(self):
        from cooper_mapper_tpu.ops import residuals

        rng = np.random.RandomState(2)
        A = rng.randn(16, 3).astype(np.float32)
        B = rng.randn(16, 3).astype(np.float32)
        C = rng.randn(16, 3).astype(np.float32)
        X = rng.randn(16, 3).astype(np.float32) + 3.0
        for it in (0, 6):
            d_j, r_j, ok_j = residuals.corner_coeff_odometry(
                jnp.asarray(A), jnp.asarray(B), jnp.asarray(X), it
            )
            d_s, r_s, ok_s = residuals.surf_coeff_odometry(
                jnp.asarray(A), jnp.asarray(B), jnp.asarray(C), jnp.asarray(X), it
            )
            for i in range(16):
                c_np, in_np, ok_np = ref_oracle.corner_coefficients(
                    A[i].astype(np.float64), B[i].astype(np.float64),
                    X[i].astype(np.float64), it,
                )
                np.testing.assert_allclose(np.asarray(d_j)[i], c_np,
                                           rtol=1e-4, atol=1e-4)
                np.testing.assert_allclose(np.asarray(r_j)[i], in_np,
                                           rtol=1e-4, atol=1e-4)
                assert bool(np.asarray(ok_j)[i]) == ok_np
                c_np, in_np, ok_np = ref_oracle.surf_coefficients(
                    A[i].astype(np.float64), B[i].astype(np.float64),
                    C[i].astype(np.float64), X[i].astype(np.float64), it,
                )
                np.testing.assert_allclose(np.asarray(d_s)[i], c_np,
                                           rtol=1e-4, atol=1e-4)
                np.testing.assert_allclose(np.asarray(r_s)[i], in_np,
                                           rtol=1e-4, atol=1e-4)
                assert bool(np.asarray(ok_s)[i]) == ok_np
