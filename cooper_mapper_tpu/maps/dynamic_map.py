"""Out-of-core cube map with host-side disk paging.

Re-design of ``DynamicFeatureMap<PointT>``
(/root/reference/L_SLAM/src/util/DynamicFeatureMap.h): a fixed RAM/HBM window
of cubes rides with the sensor; on cube-crossings, cubes leaving the window
are flushed to per-cube PCD files and cubes entering it are loaded from disk
(setupPCDFileName/update, :129-161, :504-677).  The reference's ``_indexMap``
indirection table becomes the device grid of maps/feature_map plus a host
ledger of which world cubes are dirty/backed on disk.

The device window IS a FeatureMapState: recentring, insertion, surround
gather, and the scan-match all reuse the static-shape kernels.  Paging is an
explicit host step (``page``) the pipeline calls on sensor cube-crossings —
the host/device split mirrors the reference's disk/RAM split, with
device_put/device_get as the transfer layer (async prefetch is a natural
extension; SURVEY.md §7.3 "out-of-core map paging").
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import MapConfig
from ..utils import cloud as cloud_lib
from . import feature_map as fm
from ..io import pcd


Key = Tuple[int, int, int]


@dataclasses.dataclass
class DynamicFeatureMap:
    cfg: MapConfig
    directory: str
    state: fm.FeatureMapState
    on_disk: Dict[Key, bool] = dataclasses.field(default_factory=dict)
    prev_center: Optional[np.ndarray] = None

    @classmethod
    def create(cls, cfg: MapConfig, directory: str) -> "DynamicFeatureMap":
        os.makedirs(directory, exist_ok=True)
        dmap = cls(cfg=cfg, directory=directory, state=fm.create(cfg))
        dmap._load_manifest()
        return dmap

    # -- manifest ----------------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.directory, "index2.txt")

    def _load_manifest(self) -> None:
        path = self._manifest_path()
        if not os.path.exists(path):
            return
        with open(path) as f:
            for line in f:
                p = line.split()
                if len(p) >= 5:
                    self.on_disk[(int(p[2]), int(p[3]), int(p[4]))] = True

    def _save_manifest(self) -> None:
        with open(self._manifest_path(), "w") as f:
            for (i, j, k) in sorted(self.on_disk):
                f.write(f"0 0 {i} {j} {k} {self.cfg.cube_size}\n")

    def _cube_file(self, key: Key, type_id: int) -> str:
        return os.path.join(
            self.directory, f"cube_{type_id}_{key[0]}_{key[1]}_{key[2]}.pcd"
        )

    # -- paging ------------------------------------------------------------

    def page(self, sensor_pos: np.ndarray) -> None:
        """Flush cubes leaving the window, load cubes entering it.

        Call on sensor cube-crossings (the reference pages inside update(),
        DynamicFeatureMap.h:504-677).
        """
        cfg = self.cfg
        center = np.asarray(fm.world_to_cube(jnp.asarray(sensor_pos), cfg))
        if self.prev_center is not None and np.all(center == self.prev_center):
            return

        # flush BEFORE recentring: the roll invalidates cubes leaving the
        # window, so their contents must be on disk first
        self._flush_all_occupied()
        self.state = fm.recenter(self.state, jnp.asarray(sensor_pos), cfg)
        new_origin = np.asarray(self.state.origin)
        nx, ny, nz = cfg.n_cubes

        # load cubes newly inside the window
        for key, _ in list(self.on_disk.items()):
            local = np.array(key) - new_origin
            if np.all(local >= 0) and np.all(local < np.array([nx, ny, nz])):
                self._load_cube(key)
        self.prev_center = center

    def _flush_all_occupied(self) -> None:
        cfg = self.cfg
        nx, ny, nz = cfg.n_cubes
        origin = np.asarray(self.state.origin)
        for type_id, cc in ((0, self.state.corner), (1, self.state.surf)):
            counts = np.asarray(cc.count)
            xyz = None
            mask = None
            for flat in np.nonzero(counts > 0)[0]:
                if xyz is None:
                    xyz = np.asarray(cc.xyz)
                    mask = np.asarray(cc.mask)
                i, rem = divmod(int(flat), ny * nz)
                j, k = divmod(rem, nz)
                key = (int(origin[0] + i), int(origin[1] + j), int(origin[2] + k))
                pts = xyz[flat][mask[flat]]
                pcd.write_pcd(self._cube_file(key, type_id), pts)
                self.on_disk[key] = True
        self._save_manifest()

    def _load_cube(self, key: Key) -> None:
        cfg = self.cfg
        for type_id in (0, 1):
            path = self._cube_file(key, type_id)
            if not os.path.exists(path):
                continue
            xyz, _ = pcd.read_pcd(path)
            if len(xyz) == 0:
                continue
            # skip if the window already holds points for this cube
            flat, ok = fm._grid_index(
                jnp.asarray(np.array(key), jnp.int32), self.state.origin, cfg
            )
            if not bool(ok):
                continue
            count_here = int(
                (self.state.corner if type_id == 0 else self.state.surf).count[int(flat)]
            )
            if count_here > 0:
                continue
            c = cloud_lib.from_points(jnp.asarray(xyz))
            empty = cloud_lib.empty(1)
            if type_id == 0:
                self.state = fm.add_feature_cloud(self.state, c, empty, cfg)
            else:
                self.state = fm.add_feature_cloud(self.state, empty, c, cfg)

    # -- delegation --------------------------------------------------------

    def add_feature_cloud(self, corner_world, surf_world) -> None:
        self.state = fm.add_feature_cloud(self.state, corner_world, surf_world, self.cfg)

    def get_surround(self, sensor_pos):
        return fm.get_surround(self.state, jnp.asarray(sensor_pos), self.cfg)

    def save(self) -> None:
        self._flush_all_occupied()
