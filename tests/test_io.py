import os

import jax.numpy as jnp
import numpy as np

from cooper_mapper_tpu.config import MapConfig
from cooper_mapper_tpu.io import feature_extracter, map_io, pcd
from cooper_mapper_tpu.maps import dynamic_map, feature_map as fm
from cooper_mapper_tpu.utils import cloud as cloud_lib
from cooper_mapper_tpu.fusion import fpd_receiver, utm
from cooper_mapper_tpu.ops import icp
from cooper_mapper_tpu.utils import se3


CFG = MapConfig(
    n_cubes=(5, 3, 5), cube_size=10.0,
    corner_cube_capacity=256, surf_cube_capacity=512,
    surround_corner_capacity=2048, surround_surf_capacity=4096,
    valid_distance=25.0,
)


class TestPcd:
    def test_roundtrip_binary(self, tmp_path):
        xyz = np.random.RandomState(0).randn(100, 3).astype(np.float32)
        inten = np.arange(100, dtype=np.float32)
        p = str(tmp_path / "a.pcd")
        pcd.write_pcd(p, xyz, inten)
        xyz2, inten2 = pcd.read_pcd(p)
        np.testing.assert_allclose(xyz, xyz2)
        np.testing.assert_allclose(inten, inten2)

    def test_roundtrip_ascii(self, tmp_path):
        xyz = np.random.RandomState(1).randn(10, 3).astype(np.float32)
        p = str(tmp_path / "b.pcd")
        pcd.write_pcd(p, xyz, binary=False)
        xyz2, _ = pcd.read_pcd(p)
        np.testing.assert_allclose(xyz, xyz2, atol=1e-5)


class TestMapPersistence:
    def test_save_load_roundtrip(self, tmp_path):
        state = fm.create(CFG)
        pts = jnp.array([[0.0, 0, 0], [1.0, 0.5, 0], [12.0, 0, 3.0]])
        c = cloud_lib.from_points(pts, capacity=8)
        state = fm.add_feature_cloud(state, c, c, CFG)
        n = map_io.save_feature_map(state, CFG, str(tmp_path))
        assert n >= 2
        assert os.path.exists(tmp_path / "index.txt")

        loaded = fm.create(CFG)
        loaded = map_io.load_feature_map(str(tmp_path), CFG)
        corner, surf = fm.get_surround(loaded, jnp.zeros(3), CFG)
        got = np.sort(np.asarray(corner.xyz[np.asarray(corner.mask)])[:, 0])
        np.testing.assert_allclose(got, [0, 1, 12], atol=1e-5)

    def test_g2o_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        poses = []
        T = np.eye(4, dtype=np.float32)
        for _ in range(5):
            T = T @ np.asarray(se3.se3_exp(jnp.asarray(0.2 * rng.randn(6), jnp.float32)))
            poses.append(T)
        poses = np.stack(poses)
        edges = [(i, i + 1, np.linalg.inv(poses[i]) @ poses[i + 1], np.ones(6))
                 for i in range(4)]
        p = str(tmp_path / "graph.g2o")
        map_io.save_g2o(p, poses, edges)
        poses2, edges2 = map_io.load_g2o(p)
        np.testing.assert_allclose(poses, poses2, atol=1e-5)
        assert len(edges2) == 4
        np.testing.assert_allclose(edges[0][2], edges2[0][2], atol=1e-5)

    def test_index_convert(self, tmp_path):
        src = tmp_path / "index.txt"
        src.write_text("10 0 1 2 3 50.0\n")
        dst = tmp_path / "index2.txt"
        map_io.index_convert(str(src), str(dst), (5, -1, 0))
        assert dst.read_text().split() == ["10", "0", "6", "1", "3", "50.0"]


class TestNativePager:
    def test_flush_fetch_roundtrip(self, tmp_path):
        from cooper_mapper_tpu.io import native_pager

        if not native_pager.CubePager.available():
            import pytest

            pytest.skip("libcube_pager.so not built")
        pager = native_pager.CubePager(str(tmp_path), n_threads=3)
        rng = np.random.RandomState(1)
        clouds = {k: rng.randn(10 + 7 * k, 3).astype(np.float32)
                  for k in range(6)}
        for k, pts in clouds.items():
            pager.flush(0, (k, 0, 0), pts)
        pager.sync()
        # files interchangeable with the Python PCD reader
        xyz, _ = pcd.read_pcd(str(tmp_path / "cube_0_2_0_0.pcd"))
        np.testing.assert_allclose(xyz, clouds[2])
        # parallel prefetch + fetch
        tickets = {k: pager.prefetch(0, (k, 0, 0)) for k in clouds}
        for k, t in tickets.items():
            got = pager.fetch(t, 1024)
            np.testing.assert_allclose(got, clouds[k])
        # missing file -> empty; capacity truncation honored
        t = pager.prefetch(0, (99, 9, 9))
        assert pager.fetch(t, 16).shape == (0, 3)
        pager.flush(1, (0, 0, 0), rng.randn(50, 3).astype(np.float32))
        pager.sync()
        t = pager.prefetch(1, (0, 0, 0))
        assert pager.fetch(t, 20).shape == (20, 3)
        pager.close()

    def test_python_pcd_reads_native_and_vice_versa(self, tmp_path):
        from cooper_mapper_tpu.io import native_pager

        if not native_pager.CubePager.available():
            import pytest

            pytest.skip("libcube_pager.so not built")
        pager = native_pager.CubePager(str(tmp_path))
        pts = np.arange(30, dtype=np.float32).reshape(10, 3)
        # python-written file (with intensity column) read by native pager
        pcd.write_pcd(str(tmp_path / "cube_0_5_5_5.pcd"), pts,
                      intensity=np.ones(10, np.float32))
        got = pager.fetch(pager.prefetch(0, (5, 5, 5)), 64)
        np.testing.assert_allclose(got, pts)
        pager.close()


class TestDynamicMap:
    def test_page_out_and_back(self, tmp_path):
        dmap = dynamic_map.DynamicFeatureMap.create(CFG, str(tmp_path))
        pts = jnp.array([[0.0, 0, 0], [3.0, 1.0, 2.0]])
        c = cloud_lib.from_points(pts, capacity=4)
        dmap.add_feature_cloud(c, c)
        # drive far away: cubes leave the window but land on disk
        dmap.page(np.array([200.0, 0.0, 0.0]))
        assert int(jnp.sum(dmap.state.corner.count)) == 0
        assert len(dmap.on_disk) > 0
        # come back: cubes reload
        dmap.page(np.array([0.0, 0.0, 0.0]))
        corner, _ = dmap.get_surround(np.zeros(3))
        assert int(corner.count()) == 2

    def test_native_matches_python_paging(self, tmp_path):
        from cooper_mapper_tpu.io import native_pager

        if not native_pager.CubePager.available():
            import pytest

            pytest.skip("libcube_pager.so not built")
        rng = np.random.RandomState(3)
        pts = jnp.asarray(rng.uniform(-12, 12, (40, 3)).astype(np.float32))
        results = []
        for use_native in (False, True):
            d = str(tmp_path / ("native" if use_native else "python"))
            dmap = dynamic_map.DynamicFeatureMap.create(
                CFG, d, use_native_pager=use_native
            )
            dmap.add_feature_cloud(
                cloud_lib.from_points(pts), cloud_lib.from_points(pts)
            )
            # wander out, further, and back: multiple flush/load cycles
            for pos in ([60.0, 0, 0], [120.0, 0, 0], [0.0, 0, 0]):
                dmap.page(np.array(pos, np.float64))
            dmap.save()
            corner, surf = dmap.get_surround(np.zeros(3))
            xyz = np.asarray(corner.xyz)[np.asarray(corner.mask)]
            results.append(xyz[np.lexsort(xyz.T)])
        np.testing.assert_allclose(results[0], results[1], atol=1e-6)
        # every original point survived the out-and-back paging round trip
        orig = np.asarray(pts)
        assert len(results[0]) == len(orig)
        np.testing.assert_allclose(
            results[0], orig[np.lexsort(orig.T)], atol=1e-5
        )

    def test_page_without_crossing_is_noop(self, tmp_path):
        dmap = dynamic_map.DynamicFeatureMap.create(CFG, str(tmp_path))
        c = cloud_lib.from_points(jnp.array([[1.0, 1.0, 1.0]]), capacity=4)
        dmap.add_feature_cloud(c, c)
        dmap.page(np.zeros(3))
        dmap.page(np.array([1.0, 0.0, 0.0]))  # same cube, no crossing
        assert len(dmap.on_disk) == 0  # nothing flushed
        assert int(jnp.sum(dmap.state.corner.count)) == 1


class TestFeatureExtracter:
    def test_classifies_plane_and_edge(self):
        rng = np.random.RandomState(0)
        # a dense plane patch + a dense line
        uv = rng.uniform(-2, 2, (400, 2))
        plane = np.stack([uv[:, 0], np.zeros(400), uv[:, 1]], -1)
        t = rng.uniform(-2, 2, (100, 1))
        line = np.concatenate([t * 0 + 5.0, t * 3, t * 0], -1)
        xyz = np.concatenate([plane, line]).astype(np.float32)
        is_surf, is_corner = feature_extracter.classify_map_points(xyz, k=8)
        assert is_surf[:400].mean() > 0.8
        assert is_corner[400:].mean() > 0.6
        assert is_corner[:400].mean() < 0.2


class TestUtm:
    def test_known_utm_point(self):
        # NYC: 40.7128 N, 74.0060 W -> UTM zone 18N
        e, n, zone = utm.wgs84_to_utm(40.7128, -74.0060)
        assert zone == 18
        assert abs(e - 583960) < 10
        assert abs(n - 4507351) < 10

    def test_central_meridian_exact(self):
        # northing on the central meridian equals k0 * meridional arc:
        # M(45 deg, WGS84) = 4984944.38 m -> 0.9996 * M = 4982950.4
        e, n, zone = utm.wgs84_to_utm(45.0, -75.0)
        assert abs(e - 500000.0) < 1e-6
        assert abs(n - 4982950.4) < 1.0

    def test_gnss_to_map_origin(self):
        p = utm.gnss_to_map(40.7128, -74.0060, 10.0, 40.7128, -74.0060, 10.0)
        np.testing.assert_allclose(p, np.zeros(3), atol=1e-6)


class TestFpdQueue:
    def test_interpolation(self):
        q = fpd_receiver.FpdQueue()
        T0 = np.eye(4, dtype=np.float32)
        T1 = np.eye(4, dtype=np.float32)
        T1[:3, 3] = [2.0, 0, 0]
        q.push(0.0, T0)
        q.push(1.0, T1)
        Tm = q.find_nearest(0.5)
        np.testing.assert_allclose(Tm[:3, 3], [1.0, 0, 0], atol=1e-6)


class TestIcp:
    def test_aligns_offset_cloud(self):
        rng = np.random.RandomState(0)
        pts = rng.uniform(-5, 5, (500, 3)).astype(np.float32)
        # structured: snap to two planes for stability
        pts[:250, 1] = 0.0
        pts[250:, 0] = 3.0
        target = cloud_lib.from_points(jnp.asarray(pts))
        T_true = np.asarray(se3.se3_exp(jnp.asarray([0.3, -0.2, 0.1, 0.02, 0.05, -0.03], jnp.float32)))
        src_pts = (np.linalg.inv(T_true)[:3, :3] @ (pts - T_true[:3, 3]).T).T
        source = cloud_lib.from_points(jnp.asarray(src_pts.astype(np.float32)))
        T, rmse, n = icp.icp(source, target, jnp.eye(4), max_iterations=15)
        err = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(T_true)) @ T))
        assert np.linalg.norm(err) < 0.05, err
        assert float(rmse) < 0.1


class TestNativeBinner:
    def test_native_matches_semantics(self):
        from cooper_mapper_tpu.io import native_binner

        if not native_binner.available():
            import pytest
            pytest.skip("libsweep_binner.so not built")
        rng = np.random.RandomState(0)
        n = 20000
        az = rng.uniform(0, 2 * np.pi, n)
        elev = np.deg2rad(rng.uniform(-15, 15, n))
        # smooth surface (so the feature kernel finds flats downstream)
        r = 10.0 + 0.5 * np.sin(3 * az)
        pts_loam = np.stack(
            [r * np.cos(elev) * np.cos(az), r * np.sin(elev), r * np.cos(elev) * np.sin(az)], -1
        ).astype(np.float32)
        pts_dev = pts_loam[:, [2, 0, 1]].copy()   # invert the LOAM axis remap
        xyz, mask, rel = native_binner.bin_sweep_native(pts_dev, 16, 512)
        assert mask.sum() > 5000
        got = xyz[mask]
        # ring assignment: vertical angle within rounding of the ring's angle
        va = np.rad2deg(np.arctan2(got[:, 1], np.hypot(got[:, 0], got[:, 2])))
        rings = np.repeat(np.arange(16), mask.sum(1))
        np.testing.assert_array_less(np.abs(va - (-15 + 2 * rings)), 1.01)
        # azimuth ordering: rel_time monotone within each ring's occupied cells
        for rr in range(16):
            rels = rel[rr][mask[rr]]
            assert np.all(np.diff(rels) >= 0)
        # grid feeds the feature kernel
        import jax.numpy as jnp
        from cooper_mapper_tpu.config import RegistrationConfig
        from cooper_mapper_tpu.ops import features
        from cooper_mapper_tpu.ops.features import Sweep

        sweep = Sweep(jnp.asarray(np.where(mask[..., None], xyz, 1e6)),
                      jnp.asarray(mask), jnp.asarray(rel))
        fc = features.extract_features(
            sweep, RegistrationConfig(n_rings=16, max_points_per_ring=512)
        )
        assert int(fc.less_flat.count()) > 50


class TestNativeTableBinner:
    def test_table_ring_matches_python_mapper(self):
        from cooper_mapper_tpu.io import native_binner
        from cooper_mapper_tpu.models import scan_registration as sr

        if not native_binner.table_supported():
            import pytest
            pytest.skip("libsweep_binner.so lacks bin_sweep_table")
        rng = np.random.RandomState(3)
        n = 8000
        table = np.asarray(sr._PANDAR40_ANGLES, np.float32)
        az = rng.uniform(0, 2 * np.pi, n)
        # sample elevations near (but off) the vendor channel angles
        elev_deg = table[rng.randint(0, 40, n)] + rng.uniform(-0.12, 0.12, n)
        elev = np.deg2rad(elev_deg)
        r = 12.0
        pts_loam = np.stack(
            [r * np.cos(elev) * np.cos(az), r * np.sin(elev),
             r * np.cos(elev) * np.sin(az)], -1,
        ).astype(np.float32)
        pts_dev = pts_loam[:, [2, 0, 1]].copy()
        xyz, mask, rel = native_binner.bin_sweep_table_native(pts_dev, table, 512)
        assert mask.sum() > 3000
        got = xyz[mask]
        va = np.rad2deg(np.arctan2(got[:, 1], np.hypot(got[:, 0], got[:, 2])))
        rings_native = np.repeat(np.arange(40), mask.sum(1))
        rings_py = sr.PANDAR40.ring(va)
        np.testing.assert_array_equal(rings_native, rings_py)


class TestRosbag:
    """Pure-python rosbag V2.0 round trip (SURVEY §4 item 1: bag replay is
    the reference's integration harness; the reader opens its workloads
    without ROS)."""

    def _make_bag(self, path, compression="none"):
        from cooper_mapper_tpu.io import rosbag

        rng = np.random.RandomState(0)
        msgs = []
        self.clouds = []
        for i in range(3):
            xyz = rng.randn(50, 3).astype(np.float32)
            ring = (np.arange(50) % 16).astype(np.uint16)
            inten = rng.rand(50).astype(np.float32)
            self.clouds.append(xyz)
            msgs.append(("/multi_scan_points", "sensor_msgs/PointCloud2",
                         10.0 + 0.1 * i,
                         rosbag.encode_pointcloud2(xyz, 10.0 + 0.1 * i,
                                                   intensity=inten,
                                                   ring=ring)))
            for k in range(4):
                t = 10.0 + 0.1 * i + 0.025 * k
                msgs.append(("/imu/data", "sensor_msgs/Imu", t,
                             rosbag.encode_imu(t, [0, 0, 0, 1],
                                               [0.01, 0.02, 0.03],
                                               [0.0, 9.81, 0.0])))
            msgs.append(("/fpd", "nav_msgs/Odometry", 10.0 + 0.1 * i,
                         rosbag.encode_odometry(10.0 + 0.1 * i,
                                                [float(i), 0.0, 0.0],
                                                [0, 0, 0, 1])))
        rosbag.write_bag(path, msgs, compression=compression)
        return msgs

    def test_roundtrip_uncompressed(self, tmp_path):
        from cooper_mapper_tpu.io import rosbag

        p = str(tmp_path / "a.bag")
        self._make_bag(p)
        reader = rosbag.BagReader(p)
        got = list(reader.messages())
        assert len(got) == 18
        assert reader.connections
        topics = {t for t, _, _, _ in got}
        assert topics == {"/multi_scan_points", "/imu/data", "/fpd"}
        # first cloud decodes bit-exact
        clouds = [(s, raw) for t, ty, s, raw in got
                  if t == "/multi_scan_points"]
        msg = rosbag.decode_pointcloud2(clouds[0][1])
        np.testing.assert_array_equal(msg["xyz"], self.clouds[0])
        assert "intensity" in msg and "ring" in msg
        assert msg["ring"].dtype == np.uint16
        imu_raw = next(raw for t, _, _, raw in got if t == "/imu/data")
        imu = rosbag.decode_imu(imu_raw)
        np.testing.assert_allclose(imu["angular_velocity"],
                                   [0.01, 0.02, 0.03])
        np.testing.assert_allclose(imu["linear_acceleration"],
                                   [0.0, 9.81, 0.0])
        odo_raw = next(raw for t, _, _, raw in got if t == "/fpd")
        odo = rosbag.decode_odometry(odo_raw)
        np.testing.assert_allclose(odo["position"], [0.0, 0.0, 0.0])

    def test_roundtrip_bz2(self, tmp_path):
        from cooper_mapper_tpu.io import rosbag

        p = str(tmp_path / "c.bag")
        self._make_bag(p, compression="bz2")
        got = list(rosbag.BagReader(p).messages())
        assert len(got) == 18
        clouds = [raw for t, _, _, raw in got if t == "/multi_scan_points"]
        np.testing.assert_array_equal(
            rosbag.decode_pointcloud2(clouds[-1])["xyz"], self.clouds[-1])

    def test_bag_to_npz(self, tmp_path):
        from cooper_mapper_tpu.io import rosbag

        p = str(tmp_path / "b.bag")
        self._make_bag(p)
        out = str(tmp_path / "npz")
        info = rosbag.bag_to_npz(p, out)
        assert info["n_sweeps"] == 3
        assert info["n_imu"] == 12
        assert info["n_gt"] == 3
        assert info["cloud_topic"] == "/multi_scan_points"
        z = np.load(os.path.join(out, "sweep_000001.npz"))
        np.testing.assert_array_equal(z["xyz"], self.clouds[1])
        imu = np.load(os.path.join(out, "imu.npz"))
        assert imu["angular_velocity"].shape == (12, 3)
        gt = np.load(os.path.join(out, "gt.npz"))
        np.testing.assert_allclose(gt["position"][:, 0], [0.0, 1.0, 2.0])

    def test_bag_feeds_pipeline(self, tmp_path):
        """A synthetic bag of simulated sweeps converts and replays through
        the organizer + pipeline (the run_offline --bag path, shrunk)."""
        import jax.numpy as jnp

        from cooper_mapper_tpu import config as cfg_mod
        from cooper_mapper_tpu.io import rosbag, sim
        from cooper_mapper_tpu.models import scan_registration
        from cooper_mapper_tpu.models.pipeline import SlamPipeline

        world = sim.make_room_world(size=(20.0, 4.0, 24.0), n_pillars=4,
                                    seed=13)
        p = np.eye(4, dtype=np.float32)
        p[1, 3] = 1.5
        step = np.eye(4, dtype=np.float32)
        step[2, 3] = 0.35
        msgs = []
        for i in range(3):
            p2 = p @ step
            sw = sim.scan_sweep(world, jnp.asarray(p), jnp.asarray(p2),
                                n_rings=16, width=256)
            xyz = np.asarray(sw.xyz)[np.asarray(sw.mask)][:, [2, 0, 1]]
            msgs.append(("/multi_scan_points", "sensor_msgs/PointCloud2",
                         10.0 + 0.1 * i,
                         rosbag.encode_pointcloud2(xyz, 10.0 + 0.1 * i)))
            p = p2
        bag = str(tmp_path / "drive.bag")
        rosbag.write_bag(bag, msgs)
        out = str(tmp_path / "npz")
        info = rosbag.bag_to_npz(bag, out)
        assert info["n_sweeps"] == 3

        cfg = cfg_mod.vlp16()
        cfg = cfg_mod.dataclasses.replace(
            cfg,
            registration=cfg_mod.dataclasses.replace(
                cfg.registration, max_points_per_ring=256),
            mapping_stride=2,
        )
        pipe = SlamPipeline(cfg, mode="mapping")
        for i in range(3):
            z = np.load(os.path.join(out, f"sweep_{i:06d}.npz"))
            sweep = scan_registration.organize_unordered(
                z["xyz"], cfg.registration, scan_registration.VLP16)
            r = pipe.process(sweep, stamp=0.1 * (i + 1))
        assert np.all(np.isfinite(r.merged_pose))
        assert abs(r.merged_pose[2, 3] - 0.70) < 0.3  # tracked ~2 steps fwd
