"""Device-resident cube-grid feature map.

TPU-native re-design of ``FeatureMap<PointT>``
(/root/reference/L_SLAM/src/util/FeatureMap.h:52-691): a 3D grid of fixed
capacity point cubes holding separate corner and surface feature clouds, with

* world->cube indexing (worldToCube, FeatureMap.h:475-487),
* recentring so the sensor stays >= ``margin`` cubes from the boundary
  (update/shift, :232-254, :354-376) — implemented with TOROIDAL slot
  addressing (slot = world cube index mod grid dims): the window origin
  moves and departing cubes are mask-cleared, but no data ever moves.  The
  reference physically shifts cube pointers (:354-376); a roll-based port
  of that (rounds 1-3) moved the whole map through HBM three times per
  recenter and pinned every cube to a device-dependent slot — the mod
  addressing deletes the data movement and keeps each world cube's slot
  (and therefore its shard, see sharded_map.py) stable for the map's
  lifetime,
* active-area surround gather (computeActiveAera/getSurroundFeature,
  :256-352) — a static neighborhood of cube slots around the sensor gathered
  into one fixed-capacity Cloud,
* voxel re-deduplication of cubes (downsizeValidCloud, :289-306),
* scatter insertion of registered feature clouds (addFeatureCloud, :219-230).

Everything is jit-compatible: cube counts are dense arrays, insertion is a
sort + rank + scatter, no host round trips.  Persistence to the reference's
one-file-per-cube manifest format lives in io/map_io.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import MapConfig
from ..utils import cloud as cloud_lib
from ..utils.cloud import Cloud
from ..ops.voxel import voxel_downsample


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CubeCloud:
    """One feature class stored across all cubes: [NC, cap, ...]."""

    xyz: jax.Array    # [NC, cap, 3]
    mask: jax.Array   # [NC, cap]
    count: jax.Array  # [NC] valid points, packed to the front


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FeatureMapState:
    corner: CubeCloud
    surf: CubeCloud
    origin: jax.Array  # [3] int32 — world cube index of grid slot (0, 0, 0)


def _empty_cube_cloud(nc: int, cap: int) -> CubeCloud:
    return CubeCloud(
        xyz=jnp.full((nc, cap, 3), cloud_lib.FAR, jnp.float32),
        mask=jnp.zeros((nc, cap), bool),
        count=jnp.zeros((nc,), jnp.int32),
    )


def create(cfg: MapConfig) -> FeatureMapState:
    nx, ny, nz = cfg.n_cubes
    nc = nx * ny * nz
    # center the grid on the world origin
    origin = -jnp.array([nx // 2, ny // 2, nz // 2], jnp.int32)
    return FeatureMapState(
        corner=_empty_cube_cloud(nc, cfg.corner_cube_capacity),
        surf=_empty_cube_cloud(nc, cfg.surf_cube_capacity),
        origin=origin,
    )


def world_to_cube(xyz, cfg: MapConfig):
    """World coords -> integer world-cube indices (floor at cube centers).

    Matches worldToCube's rounding: cube i covers
    [ (i - 0.5)*size, (i + 0.5)*size ) (FeatureMap.h:475-487).
    """
    return jnp.floor(xyz / cfg.cube_size + 0.5).astype(jnp.int32)


def _grid_index(cube_idx, origin, cfg: MapConfig):
    """World cube index [.., 3] -> flat grid slot + in-window mask.

    Toroidal: the slot is the world index mod the grid dims, so a world
    cube keeps its slot across recenters (the window test against
    ``origin`` decides membership; the slot does not depend on it).
    """
    nx, ny, nz = cfg.n_cubes
    local = cube_idx - origin
    in_grid = (
        (local[..., 0] >= 0) & (local[..., 0] < nx)
        & (local[..., 1] >= 0) & (local[..., 1] < ny)
        & (local[..., 2] >= 0) & (local[..., 2] < nz)
    )
    flat = (
        jnp.mod(cube_idx[..., 0], nx) * ny + jnp.mod(cube_idx[..., 1], ny)
    ) * nz + jnp.mod(cube_idx[..., 2], nz)
    return jnp.where(in_grid, flat, nx * ny * nz), in_grid


def slot_world_index(origin, n_cubes):
    """Per-slot world cube index [NC, 3] under the window at ``origin``.

    The inverse of the toroidal slot map: slot coord s on an axis of length
    n holds the unique world index w = origin + ((s - origin) mod n) inside
    the window [origin, origin + n).  Host-side numpy (map_io / the dynamic
    pager use it to name cube files by world index).
    """
    import numpy as np

    nx, ny, nz = (int(v) for v in n_cubes)
    s = np.stack(
        np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                    indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    o = np.asarray(origin).reshape(1, 3)
    return o + np.mod(s - o, np.array([nx, ny, nz]))


def _insert(cc: CubeCloud, xyz, mask, cube_flat, nc: int) -> CubeCloud:
    """Scatter points into their cubes behind existing counts."""
    cap = cc.xyz.shape[1]
    n = xyz.shape[0]
    key = jnp.where(mask, cube_flat, nc)       # invalid -> overflow bucket
    order = jnp.argsort(key)
    key_s = key[order]
    xyz_s = xyz[order]
    ok_s = key_s < nc

    new_seg = jnp.concatenate([jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])
    # rank within segment = index - index of segment start
    idx = jnp.arange(n)
    seg_start = jnp.where(new_seg, idx, 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
    rank = idx - seg_start

    slot = cc.count[jnp.clip(key_s, 0, nc - 1)] + rank
    keep = ok_s & (slot < cap)
    flat_pos = jnp.where(keep, jnp.clip(key_s, 0, nc - 1) * cap + slot, nc * cap)

    xyz_flat = cc.xyz.reshape(nc * cap, 3)
    mask_flat = cc.mask.reshape(nc * cap)
    # one guard row absorbs dropped points
    xyz_flat = jnp.concatenate([xyz_flat, jnp.zeros((1, 3), xyz.dtype)])
    mask_flat = jnp.concatenate([mask_flat, jnp.zeros((1,), bool)])
    xyz_flat = xyz_flat.at[flat_pos].set(xyz_s)
    mask_flat = mask_flat.at[flat_pos].set(keep)

    added = jax.ops.segment_sum(
        keep.astype(jnp.int32), jnp.clip(key_s, 0, nc), num_segments=nc + 1
    )[:nc]
    return CubeCloud(
        xyz=xyz_flat[:-1].reshape(nc, cap, 3),
        mask=mask_flat[:-1].reshape(nc, cap),
        count=cc.count + added,
    )


@partial(jax.jit, static_argnames=("cfg",))
def add_feature_cloud(
    state: FeatureMapState, corner_world: Cloud, surf_world: Cloud, cfg: MapConfig
) -> FeatureMapState:
    """Insert registered (world-frame) feature clouds (addFeatureCloud)."""
    nx, ny, nz = cfg.n_cubes
    nc = nx * ny * nz
    c_flat, c_ok = _grid_index(world_to_cube(corner_world.xyz, cfg), state.origin, cfg)
    s_flat, s_ok = _grid_index(world_to_cube(surf_world.xyz, cfg), state.origin, cfg)
    return FeatureMapState(
        corner=_insert(state.corner, corner_world.xyz, corner_world.mask & c_ok, c_flat, nc),
        surf=_insert(state.surf, surf_world.xyz, surf_world.mask & s_ok, s_flat, nc),
        origin=state.origin,
    )


def _clear_slots(cc: CubeCloud, keep) -> CubeCloud:
    """Mask-clear cubes where ``keep`` [NC] is False (no data movement)."""
    return CubeCloud(
        xyz=jnp.where(keep[:, None, None], cc.xyz, cloud_lib.FAR),
        mask=cc.mask & keep[:, None],
        count=jnp.where(keep, cc.count, 0),
    )


def window_shift(origin, sensor_pos, cfg: MapConfig):
    """Cubes to move the window by so the sensor stays >= margin inside
    (the shift loop of FeatureMap::update, FeatureMap.h:232-254)."""
    nx, ny, nz = cfg.n_cubes
    dims = jnp.array([nx, ny, nz], jnp.int32)
    m = cfg.margin_cubes
    local = world_to_cube(sensor_pos, cfg) - origin
    lo = jnp.minimum(local - m, 0)               # how far below margin
    hi = jnp.maximum(local - (dims - 1 - m), 0)  # how far above
    return lo + hi


def keep_mask_for_window(origin, new_origin, cfg: MapConfig):
    """Per-slot keep mask [NC]: True iff the slot's world cube under the
    OLD window also lies inside the NEW window.  Slots that leave are
    cleared and immediately re-addressable by the entering world cubes
    (which map to exactly those slots under the mod addressing)."""
    nx, ny, nz = cfg.n_cubes

    def axis(n_ax, o, no):
        s = jnp.arange(n_ax, dtype=jnp.int32)
        w = o + jnp.mod(s - o, n_ax)             # world index per slot coord
        return (w >= no) & (w < no + n_ax)

    kx = axis(nx, origin[0], new_origin[0])
    ky = axis(ny, origin[1], new_origin[1])
    kz = axis(nz, origin[2], new_origin[2])
    return (kx[:, None, None] & ky[None, :, None] & kz[None, None, :]).reshape(-1)


@partial(jax.jit, static_argnames=("cfg",))
def recenter(state: FeatureMapState, sensor_pos, cfg: MapConfig) -> FeatureMapState:
    """Keep the sensor >= margin cubes inside the grid (update/shift).

    Toroidal: only the origin moves; departing cubes are mask-cleared in
    place.  Zero HBM traffic beyond the masked writes — the roll formulation
    this replaces moved every cube through HBM three times per recenter.
    """
    shift = window_shift(state.origin, sensor_pos, cfg)
    new_origin = state.origin + shift
    keep = keep_mask_for_window(state.origin, new_origin, cfg)
    return FeatureMapState(
        corner=_clear_slots(state.corner, keep),
        surf=_clear_slots(state.surf, keep),
        origin=new_origin,
    )


def _surround_offsets(cfg: MapConfig):
    """Static neighborhood of cube offsets gathered as the surround."""
    import numpy as np

    r = int(np.ceil(cfg.valid_distance / cfg.cube_size))
    nx, ny, nz = cfg.n_cubes
    rx, ry, rz = min(r, nx // 2), min(r, ny // 2), min(r, nz // 2)
    offs = [
        (dx, dy, dz)
        for dx in range(-rx, rx + 1)
        for dy in range(-ry, ry + 1)
        for dz in range(-rz, rz + 1)
        if (dx * dx + dz * dz) * cfg.cube_size**2 <= (cfg.valid_distance + cfg.cube_size) ** 2
    ]
    return np.array(offs, np.int32)


def _vfov_mask(offs, sensor_pos, cfg: MapConfig):
    """Vertical-FOV cube cull (InVerticalFov, DynamicFeatureMap.h:748-777).

    Per the reference, each of a cube's 8 corners gets an elevation angle
    (90 deg minus the angle to the sensor's up direction) measured from the
    sensor's fractional position within its own cube, all in cube-index
    units; a cube is outside the FOV when ALL 8 corners lie above the +up
    edge or all below the -down edge.  The reference computes exactly these
    counts but ships with the exclusion commented out
    (``// upNum == 8 || downNum == 8``, DynamicFeatureMap.h:774) — enabling
    ``vfov_up_deg``/``vfov_down_deg`` in MapConfig activates the intended
    cull here.  The sensor's own cube is always kept (:795).
    """
    center = world_to_cube(sensor_pos, cfg)
    frac = sensor_pos / cfg.cube_size - center.astype(jnp.float32)   # [3]
    d = jnp.array([-0.5, 0.5], jnp.float32)
    corners = jnp.stack(jnp.meshgrid(d, d, d, indexing="ij"), -1).reshape(8, 3)
    v = offs.astype(jnp.float32)[:, None, :] + corners[None] - frac  # [A,8,3]
    elev = jnp.rad2deg(
        jnp.arcsin(v[..., 1] / jnp.linalg.norm(v, axis=-1))
    )                                                                 # [A,8]
    up_all = jnp.all(elev >= cfg.vfov_up_deg, axis=-1)
    down_all = jnp.all(elev <= -cfg.vfov_down_deg, axis=-1)
    own = jnp.all(offs == 0, axis=-1)
    return own | ~(up_all | down_all)


def _active_cube_slots(state: FeatureMapState, sensor_pos, cfg: MapConfig):
    """(flat slot [A], active mask [A]) for the surround neighborhood —
    static distance-culled offsets + in-grid check + optional vertical-FOV
    cull (computeActiveAera, FeatureMap.h:308-352 / DynamicFeatureMap.h:779)."""
    offs = jnp.asarray(_surround_offsets(cfg))            # [A, 3]
    center = world_to_cube(sensor_pos, cfg)
    flat, ok = _grid_index(center[None, :] + offs, state.origin, cfg)  # [A]
    if cfg.vfov_up_deg > 0.0 or cfg.vfov_down_deg > 0.0:
        ok = ok & _vfov_mask(offs, sensor_pos, cfg)
    return flat, ok


@partial(jax.jit, static_argnames=("cfg",))
def get_surround(state: FeatureMapState, sensor_pos, cfg: MapConfig):
    """Gather active cubes around the sensor into (corner, surf) Clouds.

    The fixed offset neighborhood replaces computeActiveAera's per-corner
    150 m check; out-of-grid slots contribute nothing.
    """
    flat, ok = _active_cube_slots(state, sensor_pos, cfg)
    flat = jnp.where(ok, flat, 0)

    def gather(cc: CubeCloud, capacity):
        xyz = cc.xyz[flat]                                # [A, cap, 3]
        mask = cc.mask[flat] & ok[:, None]
        c = cloud_lib.make(
            jnp.where(mask[..., None], xyz, cloud_lib.FAR).reshape(-1, 3),
            mask.reshape(-1),
        )
        return cloud_lib.compact(c, capacity)

    return (
        gather(state.corner, cfg.surround_corner_capacity),
        gather(state.surf, cfg.surround_surf_capacity),
    )


@partial(jax.jit, static_argnames=("cfg",))
def dedup_active(state: FeatureMapState, sensor_pos, cfg: MapConfig) -> FeatureMapState:
    """Voxel re-deduplicate the cubes around the sensor (downsizeValidCloud).

    Applied periodically by the mapping pipeline to bound cube growth
    (the reference runs it every mapping pass over the same vfov-culled
    active set, FeatureMap.h:289-306 / DynamicFeatureMap.h:718-735).

    ``cfg.dedup_policy == "anchor"`` keeps each voxel's OLDEST point instead
    of the centroid: inserts append behind existing points and both the
    voxel lexsort and compact() are stable, so the survivor of every pass is
    inductively the first-ever observation of that voxel.  This pins the map
    to early (low-drift) geometry — the centroid policy lets every new
    drift-carrying frame drag its voxel ~halfway toward itself, which on
    yaw-varying trajectories made scan-to-map AMPLIFY odometry error
    (measured: figure-eight ATE 0.76 m centroid vs 0.40 m odometry-only).
    "centroid" restores the reference's pcl::VoxelGrid parity semantics.
    """
    nx, ny, nz = cfg.n_cubes
    nc = nx * ny * nz
    flat, ok = _active_cube_slots(state, sensor_pos, cfg)
    flat = jnp.where(ok, flat, nc)  # out-of-grid -> guard row
    keep_first = cfg.dedup_policy == "anchor"

    def process(cc: CubeCloud, leaf):
        cap = cc.xyz.shape[1]
        # gather cubes (+guard), dedup each, scatter back
        xyz_g = jnp.concatenate([cc.xyz, jnp.full((1, cap, 3), cloud_lib.FAR)], 0)
        mask_g = jnp.concatenate([cc.mask, jnp.zeros((1, cap), bool)], 0)
        sub = jax.vmap(
            lambda x, m: voxel_downsample(cloud_lib.make(x, m), leaf,
                                          keep_first=keep_first)
        )(xyz_g[flat], mask_g[flat])
        xyz_new = xyz_g.at[flat].set(sub.xyz)[:-1]
        mask_new = mask_g.at[flat].set(sub.mask)[:-1]
        count_new = jnp.sum(mask_new, axis=-1, dtype=jnp.int32)
        return CubeCloud(xyz=xyz_new, mask=mask_new, count=count_new)

    return FeatureMapState(
        corner=process(state.corner, cfg.corner_leaf),
        surf=process(state.surf, cfg.surf_leaf),
        origin=state.origin,
    )
