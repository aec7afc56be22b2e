"""Feature-map persistence — the checkpoint system.

Re-design of ``FeatureMap::saveCloudToFiles`` / ``loadCloudFromFiles``
(/root/reference/L_SLAM/src/util/FeatureMap.h:378-462): one PCD per
non-empty cube plus an ``index.txt`` manifest of
``(count, type, i, j, k, size)`` rows, where type 0 = corner, 1 = surf, the
(i, j, k) are *world* cube indices, and size is the cube edge length.  Also
provides the ``indexConvert`` re-centering tool (indexConvert.cpp:21-33) and
g2o-text pose-graph checkpoints (solver_g2o.cpp:97-100).
"""

from __future__ import annotations

import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..config import MapConfig
from ..maps import feature_map as fm
from ..utils import se3
from . import pcd

CORNER, SURF = 0, 1


def save_feature_map(state: fm.FeatureMapState, cfg: MapConfig, directory: str) -> int:
    """Dump non-empty cubes.  Returns the number of cubes written."""
    os.makedirs(directory, exist_ok=True)
    rows = []
    written = 0
    # slot -> world cube index under the toroidal addressing
    slot_world = fm.slot_world_index(np.asarray(state.origin), cfg.n_cubes)
    for type_id, cc in ((CORNER, state.corner), (SURF, state.surf)):
        counts = np.asarray(cc.count)
        xyz = np.asarray(cc.xyz)
        mask = np.asarray(cc.mask)
        for flat in np.nonzero(counts > 0)[0]:
            wi, wj, wk = (int(v) for v in slot_world[int(flat)])
            pts = xyz[flat][mask[flat]]
            name = f"cube_{type_id}_{wi}_{wj}_{wk}.pcd"
            pcd.write_pcd(os.path.join(directory, name), pts)
            rows.append((len(pts), type_id, int(wi), int(wj), int(wk), cfg.cube_size))
            written += 1
    with open(os.path.join(directory, "index.txt"), "w") as f:
        for r in rows:
            f.write(" ".join(str(v) for v in r) + "\n")
    return written


def load_feature_map(directory: str, cfg: MapConfig) -> fm.FeatureMapState:
    """Rebuild a FeatureMapState from a cube directory (loadCloudFromFiles).

    Cubes outside the configured grid window (centered on the manifest's
    centroid) are dropped, as the reference's fixed grid does.
    """
    rows = []
    with open(os.path.join(directory, "index.txt")) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 6:
                rows.append(
                    (int(parts[0]), int(parts[1]), int(parts[2]), int(parts[3]),
                     int(parts[4]), float(parts[5]))
                )
    state = fm.create(cfg)
    if not rows:
        return state
    # center the grid on the occupied region
    centers = np.array([[r[2], r[3], r[4]] for r in rows])
    mid = np.round(centers.mean(0)).astype(np.int32)
    nx, ny, nz = cfg.n_cubes
    origin = jnp.asarray(mid - np.array([nx // 2, ny // 2, nz // 2]), jnp.int32)
    state = fm.FeatureMapState(state.corner, state.surf, origin)

    from ..utils import cloud as cloud_lib

    for count, type_id, wi, wj, wk, size in rows:
        name = f"cube_{type_id}_{wi}_{wj}_{wk}.pcd"
        xyz, _ = pcd.read_pcd(os.path.join(directory, name))
        c = cloud_lib.from_points(jnp.asarray(xyz))
        if type_id == CORNER:
            state = fm.add_feature_cloud(
                state, c, cloud_lib.empty(1), cfg
            )
        else:
            state = fm.add_feature_cloud(
                state, cloud_lib.empty(1), c, cfg
            )
    return state


def index_convert(src: str, dst: str, offset: Tuple[int, int, int]) -> None:
    """Re-center a cube manifest by integer cube offsets (indexConvert.cpp)."""
    with open(src) as f, open(dst, "w") as g:
        for line in f:
            p = line.split()
            if len(p) >= 6:
                p[2] = str(int(p[2]) + offset[0])
                p[3] = str(int(p[3]) + offset[1])
                p[4] = str(int(p[4]) + offset[2])
                g.write(" ".join(p) + "\n")


# ---------------------------------------------------------------------------
# g2o text checkpoints (solver_g2o.cpp:97-100; graph.cpp:113-115)
# ---------------------------------------------------------------------------


def save_g2o(path: str, poses: np.ndarray, edges) -> None:
    """poses: [N,4,4]; edges: iterable of (i, j, T_rel [4,4], info_diag [6])."""
    import jax.numpy as jnp

    with open(path, "w") as f:
        for idx, T in enumerate(poses):
            q = np.asarray(se3.rot_to_quat(jnp.asarray(T[:3, :3])))
            t = T[:3, 3]
            # g2o order: x y z qx qy qz qw
            f.write(
                f"VERTEX_SE3:QUAT {idx} {t[0]} {t[1]} {t[2]} "
                f"{q[1]} {q[2]} {q[3]} {q[0]}\n"
            )
        for i, j, T, info in edges:
            q = np.asarray(se3.rot_to_quat(jnp.asarray(np.asarray(T)[:3, :3])))
            t = np.asarray(T)[:3, 3]
            # upper-triangular 6x6 information from the diagonal
            I = np.diag(np.asarray(info))
            upper = " ".join(
                str(I[a, b]) for a in range(6) for b in range(a, 6)
            )
            f.write(
                f"EDGE_SE3:QUAT {int(i)} {int(j)} {t[0]} {t[1]} {t[2]} "
                f"{q[1]} {q[2]} {q[3]} {q[0]} {upper}\n"
            )


def load_g2o(path: str):
    """Returns (poses [N,4,4], edges [(i, j, T, info_diag)])."""
    import jax.numpy as jnp

    poses = {}
    edges = []
    with open(path) as f:
        for line in f:
            p = line.split()
            if not p:
                continue
            if p[0] == "VERTEX_SE3:QUAT":
                idx = int(p[1])
                t = np.array(p[2:5], np.float64)
                qx, qy, qz, qw = np.array(p[5:9], np.float64)
                R = np.asarray(se3.quat_to_rot(jnp.asarray([qw, qx, qy, qz])))
                T = np.eye(4, dtype=np.float32)
                T[:3, :3] = R
                T[:3, 3] = t
                poses[idx] = T
            elif p[0] == "EDGE_SE3:QUAT":
                i, j = int(p[1]), int(p[2])
                t = np.array(p[3:6], np.float64)
                qx, qy, qz, qw = np.array(p[6:10], np.float64)
                R = np.asarray(se3.quat_to_rot(jnp.asarray([qw, qx, qy, qz])))
                T = np.eye(4, dtype=np.float32)
                T[:3, :3] = R
                T[:3, 3] = t
                upper = np.array(p[10:31], np.float64)
                I = np.zeros((6, 6))
                c = 0
                for a in range(6):
                    for b in range(a, 6):
                        I[a, b] = I[b, a] = upper[c]
                        c += 1
                edges.append((i, j, T, np.diag(I).astype(np.float32)))
    n = max(poses) + 1 if poses else 0
    arr = np.stack([poses[i] for i in range(n)]) if n else np.zeros((0, 4, 4))
    return arr, edges


def save_trajectory_pcd(path: str, poses: np.ndarray) -> None:
    """Trajectory as a cloud of positions with the index in intensity
    (generateGraphTrajectoryCloud, graph.h:60-93)."""
    poses = np.asarray(poses)
    pcd.write_pcd(path, poses[:, :3, 3], np.arange(len(poses), dtype=np.float32))
