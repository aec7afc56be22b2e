"""Out-of-core cube map with host-side disk paging.

Re-design of ``DynamicFeatureMap<PointT>``
(/root/reference/L_SLAM/src/util/DynamicFeatureMap.h): a fixed RAM/HBM window
of cubes rides with the sensor; on cube-crossings, cubes leaving the window
are flushed to per-cube PCD files and cubes entering it are loaded from disk
(setupPCDFileName/update, :129-161, :504-677).  The reference's ``_indexMap``
indirection table becomes the device grid of maps/feature_map plus a host
ledger of which world cubes are backed on disk.

The device window IS a FeatureMapState: recentring, insertion, surround
gather, and the scan-match all reuse the static-shape kernels.  Paging is an
explicit host step (``page``) the pipeline calls on sensor cube-crossings.
Where the reference blocks its mapping thread on PCD I/O inside update(),
this pager flushes ONLY the cubes rolling out of the window and — when the
native engine (native/cube_pager.cpp) is built — does so write-behind on a
C++ thread pool, with entering cubes prefetched in parallel (SURVEY.md §7.3
"out-of-core map paging -> async host-device transfer overlap").
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import MapConfig
from ..utils import cloud as cloud_lib
from . import feature_map as fm
from ..io import pcd
from ..io import native_pager


Key = Tuple[int, int, int]


@dataclasses.dataclass
class DynamicFeatureMap:
    cfg: MapConfig
    directory: str
    state: fm.FeatureMapState
    on_disk: Dict[Key, bool] = dataclasses.field(default_factory=dict)
    prev_center: Optional[np.ndarray] = None
    pager: Optional["native_pager.CubePager"] = None
    # lifetime paging counters (the reference's destructor-report style
    # accounting, SURVEY.md §4 item 4)
    n_flushed: int = 0
    n_loaded: int = 0

    @classmethod
    def create(cls, cfg: MapConfig, directory: str,
               use_native_pager: Optional[bool] = None) -> "DynamicFeatureMap":
        os.makedirs(directory, exist_ok=True)
        if use_native_pager is None:
            use_native_pager = (
                os.environ.get("COOPER_NATIVE_PAGER", "1") == "1"
                and native_pager.CubePager.available()
            )
        pager = native_pager.CubePager(directory) if use_native_pager else None
        dmap = cls(cfg=cfg, directory=directory, state=fm.create(cfg),
                   pager=pager)
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

    def _window_shift(self, sensor_pos: np.ndarray) -> np.ndarray:
        """Host mirror of fm.recenter's shift computation."""
        cfg = self.cfg
        dims = np.array(cfg.n_cubes, np.int64)
        m = cfg.margin_cubes
        local = (
            np.asarray(fm.world_to_cube(jnp.asarray(sensor_pos), cfg))
            - np.asarray(self.state.origin)
        )
        lo = np.minimum(local - m, 0)
        hi = np.maximum(local - (dims - 1 - m), 0)
        return lo + hi

    def page(self, sensor_pos: np.ndarray) -> None:
        """Flush cubes leaving the window, load cubes entering it.

        Call on sensor cube-crossings (the reference pages inside update(),
        DynamicFeatureMap.h:504-677).
        """
        cfg = self.cfg
        center = np.asarray(fm.world_to_cube(jnp.asarray(sensor_pos), cfg))
        if self.prev_center is not None and np.all(center == self.prev_center):
            return
        self.prev_center = center

        shift = self._window_shift(np.asarray(sensor_pos))
        if not np.any(shift != 0):
            return

        # flush BEFORE recentring: the toroidal recenter mask-clears the
        # slots of cubes leaving the window in place (and entering world
        # cubes immediately reuse them), so departing contents must be
        # queued for disk first
        self._flush_keys(self._leaving_keys(shift))
        self.state = fm.recenter(self.state, jnp.asarray(sensor_pos), cfg)
        self._load_entering()

    def _occupied_keys(self) -> List[Tuple[Key, int, int]]:
        """All (world key, type_id, flat slot) with stored points."""
        cfg = self.cfg
        slot_world = fm.slot_world_index(np.asarray(self.state.origin),
                                         cfg.n_cubes)
        out = []
        for type_id, cc in ((0, self.state.corner), (1, self.state.surf)):
            counts = np.asarray(cc.count)
            for flat in np.nonzero(counts > 0)[0]:
                key = tuple(int(v) for v in slot_world[int(flat)])
                out.append((key, type_id, int(flat)))
        return out

    def _leaving_keys(self, shift: np.ndarray) -> List[Tuple[Key, int, int]]:
        """Occupied cubes whose slots roll out of the window under shift."""
        dims = np.array(self.cfg.n_cubes, np.int64)
        origin = np.asarray(self.state.origin)
        leaving = []
        for key, type_id, flat in self._occupied_keys():
            local = np.array(key, np.int64) - origin - shift
            if np.any(local < 0) or np.any(local >= dims):
                leaving.append((key, type_id, flat))
        return leaving

    def _flush_keys(self, items: List[Tuple[Key, int, int]]) -> None:
        if not items:
            return
        xyz = {0: np.asarray(self.state.corner.xyz),
               1: np.asarray(self.state.surf.xyz)}
        mask = {0: np.asarray(self.state.corner.mask),
                1: np.asarray(self.state.surf.mask)}
        for key, type_id, flat in items:
            pts = xyz[type_id][flat][mask[type_id][flat]]
            if self.pager is not None:
                self.pager.flush(type_id, key, pts)  # write-behind
            else:
                pcd.write_pcd(self._cube_file(key, type_id), pts)
            self.on_disk[key] = True
            self.n_flushed += 1
        self._save_manifest()

    def _flush_all_occupied(self) -> None:
        self._flush_keys(self._occupied_keys())

    def _entering_keys(self) -> List[Key]:
        """Disk-backed cubes inside the (post-recenter) window whose slot is
        empty (never double-insert over resident points)."""
        cfg = self.cfg
        dims = np.array(cfg.n_cubes, np.int64)
        origin = np.asarray(self.state.origin)
        corner_counts = np.asarray(self.state.corner.count)
        surf_counts = np.asarray(self.state.surf.count)
        nx, ny, nz = cfg.n_cubes
        keys = []
        for key in self.on_disk:
            local = np.array(key, np.int64) - origin
            if np.any(local < 0) or np.any(local >= dims):
                continue
            flat = (key[0] % nx * ny + key[1] % ny) * nz + key[2] % nz
            if corner_counts[flat] == 0 and surf_counts[flat] == 0:
                keys.append(key)
        return keys

    def _load_entering(self) -> None:
        cfg = self.cfg
        keys = self._entering_keys()
        if not keys:
            return
        caps = {0: cfg.corner_cube_capacity, 1: cfg.surf_cube_capacity}
        if self.pager is not None:
            # barrier first: a cube may re-enter while its write-behind
            # flush is still queued; reads must not race those writes
            self.pager.sync()
            # overlap all cube reads across the native thread pool
            tickets = [(key, t, self.pager.prefetch(t, key))
                       for key in keys for t in (0, 1)]
            loaded = {(key, t): self.pager.fetch(tk, caps[t])
                      for key, t, tk in tickets}
        else:
            loaded = {}
            for key in keys:
                for t in (0, 1):
                    path = self._cube_file(key, t)
                    if os.path.exists(path):
                        loaded[(key, t)] = pcd.read_pcd(path)[0]
                    else:
                        loaded[(key, t)] = np.zeros((0, 3), np.float32)
        for key in keys:
            self._insert_loaded(loaded.get((key, 0)), loaded.get((key, 1)))
            self.n_loaded += 1

    def _insert_loaded(self, corner_xyz, surf_xyz) -> None:
        """Insert disk-loaded points at FIXED capacities (one jit shape)."""
        cfg = self.cfg

        def pad(xyz, cap):
            if xyz is None or len(xyz) == 0:
                return cloud_lib.empty(cap)
            return cloud_lib.from_points(jnp.asarray(xyz[:cap]), capacity=cap)

        c = pad(corner_xyz, cfg.corner_cube_capacity)
        s = pad(surf_xyz, cfg.surf_cube_capacity)
        self.state = fm.add_feature_cloud(self.state, c, s, cfg)

    # -- delegation --------------------------------------------------------

    def add_feature_cloud(self, corner_world, surf_world) -> None:
        self.state = fm.add_feature_cloud(self.state, corner_world, surf_world, self.cfg)

    def get_surround(self, sensor_pos):
        return fm.get_surround(self.state, jnp.asarray(sensor_pos), self.cfg)

    def save(self) -> None:
        self._flush_all_occupied()
        if self.pager is not None:
            self.pager.sync()  # write-behind barrier: everything durable
