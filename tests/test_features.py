import jax
import jax.numpy as jnp
import numpy as np

from cooper_mapper_tpu.config import RegistrationConfig
from cooper_mapper_tpu.io import sim
from cooper_mapper_tpu.ops import features
from cooper_mapper_tpu.ops.voxel import voxel_downsample
from cooper_mapper_tpu.utils import cloud as cloud_lib
from cooper_mapper_tpu.utils import se3


CFG = RegistrationConfig(n_rings=16, max_points_per_ring=512)


def _make_sweep(width=512, distortion=False):
    world = sim.make_room_world(seed=1)
    pose = jnp.eye(4).at[1, 3].set(1.5)
    return world, sim.scan_sweep(
        world, pose, pose, n_rings=16, width=width, distortion=distortion
    )


class TestCurvature:
    def test_flat_line_zero_curvature(self):
        # colinear equally spaced points -> zero curvature
        xyz = jnp.stack([jnp.linspace(0, 10, 64), jnp.zeros(64), jnp.ones(64)], -1)[None]
        c = features.curvature(xyz, 5)
        assert float(jnp.max(c[0, 5:-5])) < 1e-6

    def test_corner_peak(self):
        # a right-angle corner has high curvature at the apex
        left = jnp.stack([jnp.linspace(-3, 0, 32), jnp.zeros(32), 5 - jnp.linspace(-3, 0, 32) * 0], -1)
        xs = jnp.linspace(-3, 0, 32)
        left = jnp.stack([xs, jnp.zeros(32), jnp.full((32,), 5.0)], -1)
        zs = 5.0 - jnp.linspace(0, 3, 32)
        right = jnp.stack([jnp.zeros(32), jnp.zeros(32), zs], -1)
        xyz = jnp.concatenate([left, right[1:]], 0)[None]
        c = features.curvature(xyz, 5)
        apex = 31
        window = c[0, apex - 5 : apex + 6]
        assert float(jnp.argmax(c[0, 6:-6])) + 6 in range(apex - 5, apex + 6)
        assert float(jnp.max(window)) > 0.1


class TestExtractFeatures:
    def test_shapes_and_masks(self):
        _, sweep = _make_sweep()
        fc = features.extract_features(sweep, CFG)
        assert fc.sharp.capacity == CFG.max_sharp
        assert fc.less_sharp.capacity == CFG.max_less_sharp
        assert fc.flat.capacity == CFG.max_flat
        assert fc.less_flat.capacity == CFG.max_less_flat
        # masked-out points are at the FAR sentinel
        for c in [fc.sharp, fc.less_sharp, fc.flat, fc.less_flat]:
            xyz = np.array(c.xyz)
            mask = np.array(c.mask)
            assert np.all(np.abs(xyz[~mask]) >= 1e5)

    def test_finds_features(self):
        _, sweep = _make_sweep()
        fc = features.extract_features(sweep, CFG)
        assert int(fc.sharp.count()) > 10        # pillar edges exist
        assert int(fc.flat.count()) > 50         # walls/floor everywhere
        assert int(fc.less_flat.count()) > int(fc.flat.count())
        assert int(fc.less_sharp.count()) >= int(fc.sharp.count())

    def test_flat_points_lie_on_world_planes(self):
        world, sweep = _make_sweep()
        fc = features.extract_features(sweep, CFG)
        xyz = np.array(fc.flat.xyz) + np.array([0, 1.5, 0])  # sensor -> world
        mask = np.array(fc.flat.mask)
        n = np.array(world.normals)
        o = np.array(world.origin)
        # distance to the nearest plane (unbounded) should be ~0 for flats
        d = np.abs((xyz[:, None, :] - o[None]) @ n[..., None].squeeze(-1).T)
        d = np.abs(np.einsum("np,mp->nm", xyz, n) - np.einsum("mp,mp->m", o, n))
        dmin = d.min(1)
        assert np.quantile(dmin[mask], 0.9) < 0.05

    def test_sharp_points_near_pillar_edges(self):
        world, sweep = _make_sweep()
        fc = features.extract_features(sweep, CFG)
        xyz = np.array(fc.sharp.xyz) + np.array([0, 1.5, 0])
        mask = np.array(fc.sharp.mask)
        o = np.array(world.origin)
        u = np.array(world.u)
        v = np.array(world.v)
        # pillar faces are all rects after the first 6; their vertical edges are
        # at origin and origin+u for vertical-v rects
        pf = slice(6, None)
        edges = np.concatenate([o[pf], o[pf] + u[pf]], 0)  # [E, 3] bottom corners
        exy = edges[:, [0, 2]]
        sx = xyz[mask][:, [0, 2]]
        d = np.linalg.norm(sx[:, None] - exy[None], axis=-1).min(1)
        # most sharp features should be close to a vertical pillar edge in plan view
        assert np.quantile(d, 0.8) < 0.3

    def test_batched_vmap(self):
        _, sweep = _make_sweep(width=256)
        batched = jax.tree.map(lambda a: jnp.stack([a, a]), sweep)
        fc = jax.vmap(lambda s: features.extract_features(s, CFG))(batched)
        assert fc.sharp.xyz.shape[0] == 2
        single = features.extract_features(sweep, CFG)
        np.testing.assert_allclose(fc.sharp.xyz[0], single.sharp.xyz, atol=1e-6)


class TestVoxelDownsample:
    def test_merges_within_voxel(self):
        pts = jnp.array([[0.0, 0, 0], [0.05, 0, 0], [5.0, 0, 0]])
        c = cloud_lib.from_points(pts, capacity=8)
        out = voxel_downsample(c, leaf=0.2)
        assert int(out.count()) == 2
        got = np.sort(np.array(out.xyz[np.array(out.mask)])[:, 0])
        np.testing.assert_allclose(got, [0.025, 5.0], atol=1e-6)

    def test_invalid_points_ignored(self):
        pts = jnp.array([[0.0, 0, 0], [1000.0, 0, 0]])
        c = cloud_lib.from_points(pts, capacity=4)
        c = cloud_lib.Cloud(c.xyz, c.mask.at[1].set(False), c.ring, c.rel_time)
        out = voxel_downsample(c, leaf=0.2)
        assert int(out.count()) == 1


class TestImuDewarp:
    def _hist_linear_accel(self, a, t_max=0.25, m=26):
        """IMU track: no rotation, constant world accel a (LOAM frame)."""
        from cooper_mapper_tpu.models import scan_registration as sr

        ts = np.linspace(0.0, t_max, m).astype(np.float32)
        rpy = np.zeros((m, 3), np.float32)
        # sensor-frame raw accel that integrates to world accel a after the
        # remap+gravity step: acc_working = (raw_y - 0, raw_z - g, raw_x)
        raw = np.zeros((m, 3), np.float32)
        raw[:, 1] = a[0]
        raw[:, 2] = a[1] + sr.GRAVITY
        raw[:, 0] = a[2]
        return sr.integrate_imu_history(ts, raw, rpy), ts

    def test_accel_shift_removed(self):
        """Points distorted by const acceleration come back to the
        constant-velocity (linear) trajectory after de-warp."""
        from cooper_mapper_tpu.models import scan_registration as sr
        from cooper_mapper_tpu.ops.features import Sweep

        a = np.array([0.8, -0.4, 1.2], np.float32)
        hist, ts = self._hist_linear_accel(a)
        scan_time, period = 0.1, 0.1
        rng = np.random.RandomState(0)
        pw = rng.uniform(-5, 5, (2, 8, 3)).astype(np.float32)
        rel = rng.uniform(0, 1, (2, 8)).astype(np.float32)
        # sensor at pos(t) (pure translation): p_sensor = p_world - pos(t)
        t_p = scan_time + rel * period

        def pos(t):  # integral of the IMU history started at vel 0, pos 0
            return 0.5 * a * t[..., None] ** 2

        def vel(t):
            return a * t[..., None]

        p_sensor = pw - pos(t_p)
        sweep = Sweep(xyz=jnp.asarray(p_sensor),
                      mask=jnp.ones((2, 8), bool),
                      rel_time=jnp.asarray(rel))
        out = sr.imu_dewarp(sweep, hist, scan_time, period)
        # expected: only the linear part of the motion remains
        expect = pw - (pos(np.full_like(rel, scan_time))
                       + vel(np.full_like(rel, scan_time)) * (rel * period)[..., None])
        np.testing.assert_allclose(np.asarray(out.xyz), expect, atol=2e-3)

    def test_rotation_made_common_frame(self):
        """With zero accel and a spinning sensor, de-warped points of a
        static world point agree across capture times."""
        from cooper_mapper_tpu.models import scan_registration as sr
        from cooper_mapper_tpu.ops.features import Sweep

        m = 40
        ts = np.linspace(0.0, 0.25, m).astype(np.float32)
        yaw_rate = 0.6
        rpy = np.zeros((m, 3), np.float32)
        rpy[:, 2] = yaw_rate * ts
        raw = np.zeros((m, 3), np.float32)
        raw[:, 2] = sr.GRAVITY  # stationary: gravity only
        hist = sr.integrate_imu_history(ts, raw, rpy)

        pw = np.array([3.0, 1.0, -2.0], np.float32)
        rel = np.linspace(0, 0.9, 8).astype(np.float32)[None, :]
        scan_time, period = 0.1, 0.1
        t_p = (scan_time + rel * period)[0]
        # sensor attitude R(t) = Ry(yaw(t)); p_sensor = R(t)^T p_world
        ps = np.stack(
            [np.asarray(se3.rot_y(jnp.float32(yaw_rate * t))).T @ pw
             for t in t_p], 0
        )[None]
        sweep = Sweep(xyz=jnp.asarray(ps), mask=jnp.ones((1, 8), bool),
                      rel_time=jnp.asarray(rel))
        out = sr.imu_dewarp(sweep, hist, scan_time, period)
        got = np.asarray(out.xyz[0])
        np.testing.assert_allclose(got, np.broadcast_to(got[:1], got.shape),
                                   atol=2e-3)

    def test_empty_history_identity(self):
        from cooper_mapper_tpu.models import scan_registration as sr
        from cooper_mapper_tpu.ops.features import Sweep

        hist = sr.integrate_imu_history(
            np.zeros(4, np.float32), np.zeros((4, 3), np.float32),
            np.zeros((4, 3), np.float32), mask=np.zeros(4, bool),
        )
        xyz = np.random.RandomState(1).randn(2, 5, 3).astype(np.float32)
        sweep = Sweep(xyz=jnp.asarray(xyz), mask=jnp.ones((2, 5), bool),
                      rel_time=jnp.zeros((2, 5), jnp.float32))
        out = sr.imu_dewarp(sweep, hist, 0.0)
        np.testing.assert_allclose(np.asarray(out.xyz), xyz)


class TestRingMappers:
    def test_pandar40_vendor_table(self):
        # ring ids must reproduce scanID_pandar40 (lidar_type.h:57-72):
        # the vendor table lists angles top-down, ring = 39 - vendor index
        from cooper_mapper_tpu.models import scan_registration as sr

        vendor_desc = np.asarray(sr._PANDAR40_ANGLES)[::-1]  # 6.96 .. -15.444
        for i, ang in enumerate(vendor_desc):
            assert int(sr.PANDAR40.ring(np.float32(ang))) == 39 - i
        # off-grid angles snap to the nearest channel
        # off-grid angles snap to the nearest channel: 0.0 deg is vendor
        # index 11 -> ring 39 - 11 = 28
        assert int(sr.PANDAR40.ring(np.float32(0.05))) == 28
        assert sr.PANDAR40.n_rings == 40

    def test_linear_mappers(self):
        from cooper_mapper_tpu.models import scan_registration as sr

        assert int(sr.VLP16.ring(-15.0)) == 0
        assert int(sr.VLP16.ring(15.0)) == 15
        assert int(sr.HDL32.ring(-30.67)) == 0
        assert int(sr.HDL32.ring(10.67)) == 31


class TestFeatureDebug:
    def test_debug_outputs_consistent(self):
        from cooper_mapper_tpu.config import RegistrationConfig

        world = sim.make_room_world(size=(20.0, 4.0, 24.0), n_pillars=5, seed=4)
        T = jnp.eye(4).at[1, 3].set(1.5)
        sweep = sim.scan_sweep(world, T, T, n_rings=16, width=512,
                               distortion=False)
        cfg = RegistrationConfig(n_rings=16, max_points_per_ring=512)
        fc, dbg = features.extract_features_debug(sweep, cfg)
        fc2 = features.extract_features(sweep, cfg)
        np.testing.assert_array_equal(np.asarray(fc.sharp.mask),
                                      np.asarray(fc2.sharp.mask))
        # grid-shaped internals
        assert dbg.curvature.shape == (16, 512)
        assert dbg.status.shape == (16, 512)
        # the sharp cloud is exactly the picked mask's points
        assert int(dbg.sharp_picked.sum()) == int(fc.sharp.mask.sum())
        assert int(dbg.flat_picked.sum()) == int(fc.flat.mask.sum())
        # labels/status live in their documented enums
        st = np.unique(np.asarray(dbg.status))
        assert set(st).issubset({features.BLIND_BLOCK, features.NEAR_BLOCK,
                                 features.EDGE_BROKEN, features.STATUS_NONE})
        lb = np.unique(np.asarray(dbg.label))
        assert set(lb).issubset({features.MESSY, features.CLS_SURFACE_FLAT,
                                 features.CLS_CORNER_SHARP,
                                 features.CLS_ONESIDE_FLAT})
        # region ids: -1 outside the span, within [0, nreg) inside
        rid = np.asarray(dbg.region_id)
        assert rid.min() >= -1 and rid.max() < cfg.n_feature_regions


class TestFeaturesGolden:
    """Set-level pick parity against the literal extractFeatures oracle
    (tests/ref_oracle.py: ScanRegistration.cpp:190-666 transcribed).

    Scene A is engineered so the documented order-dependence deviations
    (ops/features.py:10-22) cannot bite — distinct curvatures, features away
    from region boundaries, no occlusion chains: parity must be EXACT.
    Scene B (ray-cast pillar world: occlusion chains, large equal-curvature
    floor plateaus) quantifies the divergence as picked-set Jaccard.
    """

    W = 1024
    R = 4

    def _square_ring(self, y, wave_seed=0):
        """Radial scan of a 10 m square room, corners exactly on samples
        (az 45/135/225/315 deg at W=1024); wall distance carries a ramped
        wave so every low-curvature candidate has a distinct curvature."""
        W = self.W
        az = np.arange(W) * 2 * np.pi / W
        denom = np.maximum(np.abs(np.cos(az)), np.abs(np.sin(az)))
        r = 5.0 / denom
        quad_pos = (az % (np.pi / 2)) / (np.pi / 2)
        amp = 0.002 + 0.018 * quad_pos
        rng = np.random.RandomState(wave_seed)
        wave = amp * np.sin(24 * 2 * np.pi * quad_pos + rng.uniform(0, 2 * np.pi))
        corner_k = np.array([128, 384, 640, 896])
        dist = np.min(np.abs(az[:, None] - az[corner_k][None, :]), axis=1)
        wave = np.where(dist < 8 * 2 * np.pi / W, 0.0, wave)
        r = r + wave
        return np.stack([r * np.cos(az), np.full(W, y), r * np.sin(az)],
                        -1).astype(np.float32), az / (2 * np.pi)

    def _compare(self, sweep, cfg):
        from tests import ref_oracle as ro

        _, dbg = features.extract_features_debug(sweep, cfg)
        sharp_fw = np.asarray(dbg.sharp_picked)
        flat_fw = np.asarray(dbg.flat_picked)
        xyz = np.asarray(sweep.xyz)
        mask = np.asarray(sweep.mask)
        inter = {"sharp": 0, "flat": 0}
        union = {"sharp": 0, "flat": 0}
        exact = True
        for ri in range(mask.shape[0]):
            n = int(mask[ri].sum())
            orc = ro.extract_features_ring(
                xyz[ri, :n].astype(np.float64),
                cr=cfg.curvature_region, nreg=cfg.n_feature_regions,
                max_corner_sharp=cfg.max_corner_sharp,
                max_surface_flat=cfg.max_surface_flat,
                surf_thresh=cfg.surface_curvature_threshold,
                blind_threshold=cfg.blind_threshold,
            )
            for key, o_set, f_mask in (
                ("sharp", set(orc.sharp), sharp_fw[ri][:n]),
                ("flat", set(orc.flat), flat_fw[ri][:n]),
            ):
                f_set = set(np.nonzero(f_mask)[0].tolist())
                inter[key] += len(o_set & f_set)
                union[key] += len(o_set | f_set)
                exact = exact and (o_set == f_set)
        jac = {k: inter[k] / max(union[k], 1) for k in inter}
        return exact, jac

    def test_exact_parity_clean_scene(self):
        cfg = RegistrationConfig(n_rings=self.R, max_points_per_ring=self.W)
        xyzs, rels = zip(*[self._square_ring(0.2 * ri, wave_seed=ri)
                           for ri in range(self.R)])
        sweep = features.Sweep(
            xyz=jnp.asarray(np.stack(xyzs)),
            mask=jnp.ones((self.R, self.W), bool),
            rel_time=jnp.asarray(np.stack(rels), jnp.float32),
        )
        exact, jac = self._compare(sweep, cfg)
        assert exact, f"picked sets differ on the no-bite scene: {jac}"
        assert jac["sharp"] == 1.0 and jac["flat"] == 1.0

    def test_quantified_divergence_occlusion_scene(self):
        """Pillar world: occlusion chains exercise the order-dependent
        sequential buffer; the floor's equal-curvature plateaus make flat
        tie-breaking diverge between f32 grid and f64 sequential picks.
        The divergence is bounded, not eliminated — assert the floor."""
        cfg = RegistrationConfig(n_rings=16, max_points_per_ring=1024)
        world = sim.make_room_world(seed=11, n_pillars=10)
        p0 = jnp.eye(4, dtype=jnp.float32).at[1, 3].set(1.5)
        sweep = sim.scan_sweep(world, p0, p0, n_rings=16, width=1024)
        exact, jac = self._compare(sweep, cfg)
        # measured at round 5: sharp 0.93, flat 0.73 (ties dominate flats)
        assert jac["sharp"] >= 0.85, jac
        assert jac["flat"] >= 0.60, jac


class TestImuDewarpGolden:
    """models/scan_registration.{integrate_imu_history, imu_dewarp} vs the
    literal IMU transcription (tests/ref_oracle.py: ScanRegistration.cpp
    :89-188).  Points are compared in azimuth-major order — the driver
    packet order the reference's monotone _imuIdx walk assumes."""

    def _imu_stream(self, n=40, hz=100.0, seed=3):
        rng = np.random.RandomState(seed)
        t = 10.0 + np.arange(n) / hz
        # smooth attitude with a yaw ramp crossing the +/-pi wrap
        roll = 0.05 * np.sin(2 * np.pi * 1.3 * (t - t[0]))
        pitch = 0.04 * np.sin(2 * np.pi * 0.9 * (t - t[0]) + 1.0)
        yaw = np.pi - 0.02 + 0.8 * (t - t[0])          # wraps past +pi
        yaw = np.mod(yaw + np.pi, 2 * np.pi) - np.pi
        rpy = np.stack([roll, pitch, yaw], -1)
        acc = 0.3 * rng.randn(n, 3)
        # raw accelerometer carries gravity along sensor x (LOAM remap: the
        # reference reads (y, z, x) and removes tilted gravity, :96-99)
        acc[:, 2] += 9.81 * np.cos(roll) * np.cos(pitch)
        return t, acc, rpy

    def test_history_integration_matches(self):
        from cooper_mapper_tpu.models import scan_registration as sr
        from tests import ref_oracle as ro

        t, acc, rpy = self._imu_stream()
        hist = sr.integrate_imu_history(t, acc, rpy)
        golden = ro.imu_history_oracle(t, acc, rpy)
        pos_g = np.stack([s.position for s in golden])
        vel_g = np.stack([s.velocity for s in golden])
        np.testing.assert_allclose(np.asarray(hist.pos), pos_g, atol=1e-4)
        np.testing.assert_allclose(np.asarray(hist.vel), vel_g, atol=1e-4)

    def test_dewarp_matches_oracle(self):
        import jax.numpy as jnp

        from cooper_mapper_tpu.models import scan_registration as sr
        from tests import ref_oracle as ro

        t, acc, rpy = self._imu_stream()
        hist = sr.integrate_imu_history(t, acc, rpy)
        golden = ro.imu_history_oracle(t, acc, rpy)

        rng = np.random.RandomState(0)
        R, W = 4, 64
        scan_time = float(t[3]) + 0.004   # sweep starts inside the stream
        xyz = rng.uniform(-8, 8, (R, W, 3)).astype(np.float32)
        rel = np.broadcast_to(
            (np.arange(W, dtype=np.float32) / W)[None, :], (R, W)).copy()
        sweep = sr.Sweep(
            xyz=jnp.asarray(xyz), mask=jnp.ones((R, W), bool),
            rel_time=jnp.asarray(rel),
        )
        out = sr.imu_dewarp(sweep, hist, scan_time, scan_period=0.1)

        # azimuth-major comparison: per column, all rings share one relTime
        pts_am = xyz.transpose(1, 0, 2).reshape(-1, 3)
        rel_am = np.repeat(rel[0] * 0.1, R)
        gold = ro.imu_dewarp_oracle(pts_am.astype(np.float64), rel_am,
                                    golden, scan_time)
        got = np.asarray(out.xyz).transpose(1, 0, 2).reshape(-1, 3)
        np.testing.assert_allclose(got, gold, atol=2e-3)

    def test_dewarp_before_history_start_is_raw_state(self):
        """Points before the first IMU stamp take history[0] verbatim
        (the idx==0 branch, :180-181): both implementations agree."""
        import jax.numpy as jnp

        from cooper_mapper_tpu.models import scan_registration as sr
        from tests import ref_oracle as ro

        t, acc, rpy = self._imu_stream()
        hist = sr.integrate_imu_history(t, acc, rpy)
        golden = ro.imu_history_oracle(t, acc, rpy)
        scan_time = float(t[0]) - 0.05    # before the stream
        xyz = np.random.RandomState(1).uniform(-5, 5, (1, 16, 3)).astype(
            np.float32)
        rel = np.linspace(0, 0.3, 16, dtype=np.float32)[None, :]
        sweep = sr.Sweep(xyz=jnp.asarray(xyz), mask=jnp.ones((1, 16), bool),
                         rel_time=jnp.asarray(rel))
        out = sr.imu_dewarp(sweep, hist, scan_time, scan_period=0.1)
        gold = ro.imu_dewarp_oracle(xyz[0].astype(np.float64), rel[0] * 0.1,
                                    golden, scan_time)
        np.testing.assert_allclose(np.asarray(out.xyz)[0], gold, atol=2e-3)
