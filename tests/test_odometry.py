import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cooper_mapper_tpu.config import OdometryConfig, RegistrationConfig
from cooper_mapper_tpu.io import sim
from cooper_mapper_tpu.ops import features, odometry
from cooper_mapper_tpu.utils import se3, twist


CFG_REG = RegistrationConfig(n_rings=16, max_points_per_ring=512)
CFG_ODO = OdometryConfig()


def _pose(x=0.0, y=1.5, z=0.0, yaw=0.0):
    c, s = np.cos(yaw), np.sin(yaw)
    return jnp.array(
        [[c, 0, s, x], [0, 1, 0, y], [-s, 0, c, z], [0, 0, 0, 1]], jnp.float32
    )


def _sweep_pair(motion, world=None, distortion=True, width=512):
    """Two consecutive sweeps; returns (prev_features, cur_features, gt_twist).

    Sweep 0: pose0 -> pose1; sweep 1: pose1 -> pose2 with pose2 = pose1 @ motion.
    The odometry twist for sweep 1 describes the in-sweep motion pose1 -> pose2.
    """
    world = world or sim.make_room_world(seed=7)
    p0 = _pose()
    p1 = p0  # previous sweep static: its end frame == its start frame
    p2 = p1 @ motion
    s_prev = sim.scan_sweep(world, p0, p1, n_rings=16, width=width, distortion=distortion)
    s_cur = sim.scan_sweep(world, p1, p2, n_rings=16, width=width, distortion=distortion)
    f_prev = features.extract_features(s_prev, CFG_REG)
    f_cur = features.extract_features(s_cur, CFG_REG)
    gt = twist.from_relative_motion(motion)
    return f_prev, f_cur, gt


class TestTwistMotionRoundtrip:
    def test_roundtrip(self):
        x = jnp.array([0.02, -0.04, 0.03, 0.3, -0.2, 0.5])
        M = twist.to_relative_motion(x)
        x2 = twist.from_relative_motion(M)
        np.testing.assert_allclose(x, x2, atol=1e-5)

    def test_warp_consistency(self):
        # warp_to_start at s=1 must equal applying M to the point
        x = jnp.array([0.02, -0.04, 0.03, 0.3, -0.2, 0.5])
        M = twist.to_relative_motion(x)
        p = jax.random.normal(jax.random.PRNGKey(0), (6, 3)) * 5
        warped = twist.warp_to_start(x, p, jnp.ones(6))
        np.testing.assert_allclose(warped, se3.apply(M, p), atol=1e-5)


class TestOdometrySolve:
    @pytest.mark.parametrize(
        "motion",
        [
            _pose(x=0.25, y=0.0, z=0.35) @ jnp.eye(4),
            _pose(x=0.0, y=0.0, z=0.5, yaw=0.05),
            _pose(x=-0.2, y=0.03, z=0.3, yaw=-0.04),
        ],
    )
    def test_recovers_motion(self, motion):
        # clean static reference + distorted query + zero prior: the
        # s-scaled warp model's home case (cv_dewarp needs a motion prior
        # or equally-distorted clouds; see test_cv_dewarp_*)
        motion = jnp.asarray(motion)
        f_prev, f_cur, gt = _sweep_pair(motion)
        x, st = odometry.odometry_solve(
            f_cur.sharp, f_cur.flat, f_prev.less_sharp, f_prev.less_flat,
            jnp.zeros(6), dataclasses.replace(CFG_ODO, cv_dewarp=False),
        )
        M_est = twist.to_relative_motion(x)
        err = np.array(se3.se3_log(se3.inverse(motion) @ M_est))
        trans_err = np.linalg.norm(err[:3])
        rot_err = np.linalg.norm(err[3:])
        # accuracy is bounded by correspondence discretization at the test's
        # coarse 512-column azimuth grid (0.7 deg); 1024+ columns reach ~6 mm
        assert trans_err < 0.05, f"trans err {trans_err}, x={x}, gt={gt}"
        assert rot_err < 0.01, f"rot err {rot_err}"
        assert int(st.n_matched) > 50

    def test_no_motion(self):
        f_prev, f_cur, _ = _sweep_pair(jnp.eye(4))
        x, st = odometry.odometry_solve(
            f_cur.sharp, f_cur.flat, f_prev.less_sharp, f_prev.less_flat,
            jnp.zeros(6), CFG_ODO,
        )
        assert float(jnp.linalg.norm(x[3:])) < 0.01
        assert bool(st.converged)

    def test_batched(self):
        m1 = _pose(x=0.25, y=0.0, z=0.35)
        m2 = _pose(x=0.0, z=0.4, y=0.0, yaw=0.03)
        fp1, fc1, g1 = _sweep_pair(m1)
        fp2, fc2, g2 = _sweep_pair(m2)
        stack = lambda a, b: jax.tree.map(lambda u, v: jnp.stack([u, v]), a, b)
        xs, st = odometry.batch_odometry_solve(
            stack(fc1.sharp, fc2.sharp),
            stack(fc1.flat, fc2.flat),
            stack(fp1.less_sharp, fp2.less_sharp),
            stack(fp1.less_flat, fp2.less_flat),
            jnp.zeros((2, 6)),
            dataclasses.replace(CFG_ODO, cv_dewarp=False),
        )
        M1 = twist.to_relative_motion(xs[0])
        M2 = twist.to_relative_motion(xs[1])
        assert float(jnp.linalg.norm(se3.se3_log(se3.inverse(m1) @ M1))) < 0.05
        assert float(jnp.linalg.norm(se3.se3_log(se3.inverse(m2) @ M2))) < 0.05

    def test_degenerate_geometry_guard(self):
        # a single infinite plane constrains only 3 DoF: solver must not blow up
        o = np.array([[-50.0, 0.0, -50.0]], np.float32)
        u = np.array([[100.0, 0, 0]], np.float32)
        v = np.array([[0.0, 0, 100.0]], np.float32)
        world = sim.PlaneWorld(jnp.asarray(o), jnp.asarray(u), jnp.asarray(v))
        motion = _pose(x=0.2, y=0.0, z=0.2)
        f_prev, f_cur, _ = _sweep_pair(motion, world=world)
        x, st = odometry.odometry_solve(
            f_cur.sharp, f_cur.flat, f_prev.less_sharp, f_prev.less_flat,
            jnp.zeros(6), CFG_ODO,
        )
        assert np.all(np.isfinite(np.array(x)))
        assert bool(st.is_degenerate)
        # unconstrained in-plane translation must stay ~0 (projected out)
        assert float(jnp.abs(x[4])) < 0.5  # vertical (y) IS constrained


class TestParityMode:
    def test_parity_mode_converges(self):
        """The reference-dynamics mode (closed-form s=1 Jacobian, -0.05
        under-relaxation, no trust region) reaches the same optimum, just in
        more iterations (LaserOdometry.cpp:512-575)."""
        motion = jnp.asarray(_pose(x=0.2, y=0.0, z=0.3))
        f_prev, f_cur, gt = _sweep_pair(motion)
        # the 0.05 under-relaxation needs a longer budget on a cold start of
        # this magnitude; the reference leans on warm starts per sweep
        cfg = OdometryConfig(max_iterations=100)
        x, st = odometry.odometry_solve(
            f_cur.sharp, f_cur.flat, f_prev.less_sharp, f_prev.less_flat,
            jnp.zeros(6), cfg, parity_mode=True,
        )
        M_est = twist.to_relative_motion(x)
        err = np.array(se3.se3_log(se3.inverse(motion) @ M_est))
        assert np.linalg.norm(err[:3]) < 0.08, f"trans err {err}"
        assert bool(st.converged)
        assert np.all(np.isfinite(np.array(x)))


class TestExactJacobianClosedForm:
    def test_matches_jacfwd(self):
        """The closed-form per-point-s rows equal autodiff of the warp."""
        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.uniform(-0.3, 0.3, 6).astype(np.float32))
        pts = jnp.asarray(rng.uniform(-10, 10, (64, 3)).astype(np.float32))
        s = jnp.asarray(rng.uniform(0.0, 1.0, 64).astype(np.float32))
        coeff = jnp.asarray(rng.randn(64, 3).astype(np.float32))

        rows = odometry._exact_jacobian_rows(x, pts, s, coeff)
        dW = jax.jacfwd(lambda xx: twist.warp_to_start(xx, pts, s))(x)
        ref = jnp.einsum("ni,nio->no", coeff, dW)
        np.testing.assert_allclose(np.asarray(rows), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)

    def test_s_one_equals_reference_rows(self):
        rng = np.random.RandomState(6)
        x = jnp.asarray(rng.uniform(-0.3, 0.3, 6).astype(np.float32))
        pts = jnp.asarray(rng.uniform(-10, 10, (32, 3)).astype(np.float32))
        coeff = jnp.asarray(rng.randn(32, 3).astype(np.float32))
        a = odometry._exact_jacobian_rows(x, pts, jnp.ones(32), coeff)
        b = odometry._reference_jacobian_rows(x, pts, coeff)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_rigid_paths_bitwise(self):
        """The cv_dewarp rigid fast paths are the s == 1 paths BIT-for-bit.

        The rigid step replaces per-point trig of ``1 * x`` with per-problem
        scalar trig; ``1.0 * v == v`` and the combine tree is unchanged, so
        warp and Jacobian rows must match exactly (no tolerance) — any drift
        here would silently change the default solver's iterates.
        """
        rng = np.random.RandomState(7)
        for _ in range(3):
            x = jnp.asarray(rng.uniform(-0.5, 0.5, 6).astype(np.float32))
            pts = jnp.asarray(rng.uniform(-30, 30, (64, 3)).astype(np.float32))
            coeff = jnp.asarray(rng.randn(64, 3).astype(np.float32))
            ones = jnp.ones(64, jnp.float32)

            w_s = twist.warp_to_start(x, pts, ones)
            w_r = twist.point_to_map(x, pts)
            assert np.array_equal(np.asarray(w_s), np.asarray(w_r))

            j_s = odometry._exact_jacobian_rows(x, pts, ones, coeff)
            j_r = odometry._exact_jacobian_rows_rigid(x, pts, coeff)
            assert np.array_equal(np.asarray(j_s), np.asarray(j_r))


def test_query_chunked_nn_matches_dense():
    """Chunked-query correspondence search equals the single-tile search,
    and the solve result is identical."""
    from cooper_mapper_tpu.ops import neighbors

    m1 = _pose(x=0.2, y=0.0, z=0.3)
    fp, fc, _ = _sweep_pair(jnp.asarray(m1))
    q = jnp.asarray(np.asarray(fc.sharp.xyz))
    ia0, ib0, ok0 = neighbors.corner_pairs(q, fp.less_sharp, 25.0)
    ia1, ib1, ok1 = neighbors.corner_pairs(q, fp.less_sharp, 25.0,
                                           query_chunk=48)
    np.testing.assert_array_equal(np.asarray(ia0), np.asarray(ia1))
    np.testing.assert_array_equal(np.asarray(ok0), np.asarray(ok1))

    qs = jnp.asarray(np.asarray(fc.flat.xyz))
    t0 = neighbors.surf_triples(qs, fp.less_flat, 25.0)
    t1 = neighbors.surf_triples(qs, fp.less_flat, 25.0, query_chunk=100)
    ok = np.asarray(t0[3]) & np.asarray(t1[3])
    assert ok.mean() > 0.5
    # different matmul tilings can flip argmin between near-equidistant
    # neighbors: compare the chosen neighbor DISTANCES, not indices
    ref_xyz = np.asarray(fp.less_flat.xyz)
    qn = np.asarray(qs)
    for a, b in zip(t0[:3], t1[:3]):
        da = np.linalg.norm(ref_xyz[np.asarray(a)[ok]] - qn[ok], axis=-1)
        db = np.linalg.norm(ref_xyz[np.asarray(b)[ok]] - qn[ok], axis=-1)
        np.testing.assert_allclose(da, db, rtol=1e-3, atol=1e-3)

    cfg = CFG_ODO
    cfg_chunked = dataclasses.replace(cfg, nn_query_chunk=64)
    x_a, _ = odometry.odometry_solve(fc.sharp, fc.flat, fp.less_sharp,
                                     fp.less_flat, jnp.zeros(6), cfg)
    x_b, _ = odometry.odometry_solve(fc.sharp, fc.flat, fp.less_sharp,
                                     fp.less_flat, jnp.zeros(6), cfg_chunked)
    np.testing.assert_allclose(np.asarray(x_a), np.asarray(x_b), atol=2e-3)


def test_unrolled_iters_match_fori_loop():
    """unroll_iters=True is a pure scheduling change: bit-identical solves."""
    m1 = _pose(x=0.2, y=0.0, z=0.3)
    fp, fc, _ = _sweep_pair(jnp.asarray(m1))
    cfg_u = dataclasses.replace(CFG_ODO, unroll_iters=True)
    x_a, st_a = odometry.odometry_solve(fc.sharp, fc.flat, fp.less_sharp,
                                        fp.less_flat, jnp.zeros(6), CFG_ODO)
    x_b, st_b = odometry.odometry_solve(fc.sharp, fc.flat, fp.less_sharp,
                                        fp.less_flat, jnp.zeros(6), cfg_u)
    np.testing.assert_allclose(np.asarray(x_a), np.asarray(x_b), atol=1e-6)
    assert int(st_a.iter_used) == int(st_b.iter_used)


class TestCvDewarp:
    """Constant-velocity de-warp + rigid solve (OdometryConfig.cv_dewarp)."""

    def test_warm_start_recovers_exactly(self):
        # distorted query vs clean start-frame reference: the prior carries
        # the distortion, the rigid solve refines
        motion = jnp.asarray(_pose(x=-0.2, y=0.03, z=0.3, yaw=-0.04))
        f_prev, f_cur, gt = _sweep_pair(motion)
        # prior noise at chained-solve scale: ~0.3 deg rotation, ~2 cm
        # translation (a previous solve's typical error).  Large rotation
        # prior noise creates dewarp ramps the rigid fit can only partially
        # absorb (the s-model has the mirrored weakness via its reference
        # projection); the chain test below covers the closed loop.
        rng = np.random.RandomState(3)
        noise = np.concatenate([0.005 * rng.randn(3), 0.02 * rng.randn(3)])
        x0 = gt + jnp.asarray(noise, jnp.float32)
        x, st = odometry.odometry_solve(
            f_cur.sharp, f_cur.flat, f_prev.less_sharp, f_prev.less_flat,
            x0, CFG_ODO,
        )
        err = np.array(se3.se3_log(se3.inverse(motion) @ twist.to_relative_motion(x)))
        assert np.linalg.norm(err[:3]) < 0.05, err
        assert np.linalg.norm(err[3:]) < 0.01, err

    def test_equal_distortion_cold_start(self):
        # two consecutive sweeps at the same velocity carry the same
        # distortion field: rigid alignment is exact even with zero prior
        motion = _pose(x=0.05, y=0.0, z=0.4, yaw=0.03)
        world = sim.make_room_world(seed=7)
        p1 = _pose()
        p0 = p1 @ jnp.linalg.inv(motion)
        p2 = p1 @ motion
        s_prev = sim.scan_sweep(world, p0, p1, n_rings=16, width=512)
        s_cur = sim.scan_sweep(world, p1, p2, n_rings=16, width=512)
        f_prev = features.extract_features(s_prev, CFG_REG)
        f_cur = features.extract_features(s_cur, CFG_REG)
        x, st = odometry.odometry_solve(
            f_cur.sharp, f_cur.flat, f_prev.less_sharp, f_prev.less_flat,
            jnp.zeros(6), CFG_ODO,
        )
        err = np.array(se3.se3_log(
            se3.inverse(jnp.asarray(motion)) @ twist.to_relative_motion(x)))
        assert np.linalg.norm(err[:3]) < 0.06, err

    def test_chained_sweeps_stay_stable(self):
        # the reason cv_dewarp exists: the s-scaled model's estimate error
        # feeds back through the end-projected reference with loop gain > 1
        # (pitch/height see-saw); de-warp + rigid solve keeps the chain tight
        from cooper_mapper_tpu.models.laser_odometry import _project_to_end

        world = sim.make_room_world(seed=7)
        motion = np.asarray(_pose(x=0.05, y=0.0, z=0.4, yaw=0.03))
        poses = [np.asarray(_pose())]
        for _ in range(6):
            poses.append(poses[-1] @ motion)
        fcs = [
            features.extract_features(
                sim.scan_sweep(world, jnp.asarray(poses[i]),
                               jnp.asarray(poses[i + 1]), n_rings=16, width=512),
                CFG_REG,
            )
            for i in range(6)
        ]
        ref_c, ref_s = fcs[0].less_sharp, fcs[0].less_flat
        x_prev = jnp.zeros(6)
        errs = []
        for i in range(1, 6):
            x, _ = odometry.odometry_solve(
                fcs[i].sharp, fcs[i].flat, ref_c, ref_s, x_prev, CFG_ODO)
            err = np.array(se3.se3_log(
                se3.inverse(jnp.asarray(motion)) @ twist.to_relative_motion(x)))
            errs.append(np.linalg.norm(err[:3]))
            ref_c = _project_to_end(x, fcs[i].less_sharp)
            ref_s = _project_to_end(x, fcs[i].less_flat)
            x_prev = x
        assert max(errs[1:]) < 0.08, errs

