"""Device-sharded cube-grid feature map: per-device cube shards with a
cross-device surround gather.

The last SURVEY.md §5 scaling axis ("sharding the map/pose-graph across
hosts — per-device cube shards with gather of surround features"): the
reference bounds its working set with the cube window and extends map size
beyond RAM by disk paging through an indirection table
(/root/reference/L_SLAM/src/util/DynamicFeatureMap.h:504-677).  On TPU the
corresponding axis is HBM: the cube arrays dominate map memory, so the flat
cube axis is sharded over the mesh and aggregate map capacity scales with
the device count.

Design (enabled by feature_map's toroidal slot addressing — slots never
move, so a cube's owner device is FIXED for the map's lifetime):

* **Striped ownership.**  Flat slot ``s`` lives on device ``s % ndev`` at
  local position ``s // ndev``.  The innermost grid axis (z) strides the
  stripe, so the cubes of any localized surround neighborhood spread almost
  uniformly across devices — contiguous-block ownership would idle every
  device whose slab the sensor is not in.
* **Insert: zero communication.**  The registered frame is replicated (it
  is tiny next to the map); each device scatters exactly the points whose
  cube it owns, reusing feature_map._insert on its local slot range.
* **Surround gather: one all_gather.**  Each device compacts the active
  cubes it owns into ``capacity / ndev`` points; one all_gather over ICI
  assembles the replicated surround Cloud the (replicated) scan-match
  solver consumes.  Communication is O(surround capacity), independent of
  map size.
* **Recenter/dedup: local.**  The toroidal keep-mask clear and the per-cube
  re-voxelization touch only device-local cubes.

Equality with the single-device map is tested structurally
(tests/test_sharded_map.py): to_single(insert/recenter/dedup) returns
bit-identical FeatureMapState arrays, and the surround gather returns the
same point set.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import MapConfig
from ..utils import cloud as cloud_lib
from ..utils.cloud import Cloud
from . import feature_map as fm


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardedMapState:
    """FeatureMapState with the cube axis in striped storage order.

    Storage index ``k = d * S + p`` holds flat slot ``s = p * ndev + d``
    (S = padded_nc / ndev); under ``P(axis)`` on the leading axis device d
    holds exactly the slots with ``s % ndev == d``.  ``origin`` is
    replicated.
    """

    corner: fm.CubeCloud
    surf: fm.CubeCloud
    origin: jax.Array


def _padded_nc(cfg: MapConfig, ndev: int) -> int:
    nx, ny, nz = cfg.n_cubes
    nc = nx * ny * nz
    return -(-nc // ndev) * ndev


def _axis(mesh) -> str:
    return mesh.axis_names[0]


def create_sharded(cfg: MapConfig, mesh) -> ShardedMapState:
    ndev = mesh.devices.size
    nc_pad = _padded_nc(cfg, ndev)
    sh = NamedSharding(mesh, P(_axis(mesh)))
    rep = NamedSharding(mesh, P())

    def empty(cap):
        return fm.CubeCloud(
            xyz=jax.device_put(
                jnp.full((nc_pad, cap, 3), cloud_lib.FAR, jnp.float32), sh),
            mask=jax.device_put(jnp.zeros((nc_pad, cap), bool), sh),
            count=jax.device_put(jnp.zeros((nc_pad,), jnp.int32), sh),
        )

    nx, ny, nz = cfg.n_cubes
    origin = jax.device_put(
        -jnp.array([nx // 2, ny // 2, nz // 2], jnp.int32), rep)
    return ShardedMapState(
        corner=empty(cfg.corner_cube_capacity),
        surf=empty(cfg.surf_cube_capacity),
        origin=origin,
    )


# ---------------------------------------------------------------------------
# striped layout converters (tests / interop with the single-device map)
# ---------------------------------------------------------------------------


def _stripe_perm(nc_pad: int, ndev: int):
    """storage index k -> flat slot s (k = d*S + p  <->  s = p*ndev + d)."""
    import numpy as np

    k = np.arange(nc_pad)
    s_of_k = (k % (nc_pad // ndev)) * ndev + k // (nc_pad // ndev)
    return s_of_k


def to_single(state: ShardedMapState, cfg: MapConfig, ndev: int) -> fm.FeatureMapState:
    """De-stripe into a single-device FeatureMapState (exact layout)."""
    import numpy as np

    nx, ny, nz = cfg.n_cubes
    nc = nx * ny * nz
    s_of_k = _stripe_perm(_padded_nc(cfg, ndev), ndev)
    inv = np.argsort(s_of_k)          # flat slot s -> storage index k

    def unstripe(cc: fm.CubeCloud) -> fm.CubeCloud:
        return fm.CubeCloud(
            xyz=jnp.asarray(cc.xyz)[inv][:nc],
            mask=jnp.asarray(cc.mask)[inv][:nc],
            count=jnp.asarray(cc.count)[inv][:nc],
        )

    return fm.FeatureMapState(
        corner=unstripe(state.corner), surf=unstripe(state.surf),
        origin=jnp.asarray(state.origin),
    )


def from_single(state: fm.FeatureMapState, cfg: MapConfig, mesh) -> ShardedMapState:
    """Stripe + shard a single-device FeatureMapState over the mesh."""
    ndev = mesh.devices.size
    nc_pad = _padded_nc(cfg, ndev)
    nx, ny, nz = cfg.n_cubes
    nc = nx * ny * nz
    s_of_k = _stripe_perm(nc_pad, ndev)
    sh = NamedSharding(mesh, P(_axis(mesh)))
    rep = NamedSharding(mesh, P())

    def stripe(cc: fm.CubeCloud, cap) -> fm.CubeCloud:
        def pad_perm(a, fill):
            pad_row = jnp.full((nc_pad - nc,) + a.shape[1:], fill, a.dtype)
            ap = jnp.concatenate([a, pad_row], axis=0)
            return ap[s_of_k]

        return fm.CubeCloud(
            xyz=jax.device_put(pad_perm(cc.xyz, cloud_lib.FAR), sh),
            mask=jax.device_put(pad_perm(cc.mask, False), sh),
            count=jax.device_put(pad_perm(cc.count, 0), sh),
        )

    return ShardedMapState(
        corner=stripe(state.corner, cfg.corner_cube_capacity),
        surf=stripe(state.surf, cfg.surf_cube_capacity),
        origin=jax.device_put(state.origin, rep),
    )


# ---------------------------------------------------------------------------
# sharded map operations
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _insert_jit(cfg: MapConfig, mesh):
    axis = _axis(mesh)
    ndev = mesh.devices.size
    nc_local = _padded_nc(cfg, ndev) // ndev

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(), P()),
        out_specs=(P(axis), P(axis)),
    )
    def run(corner_cc, surf_cc, corner_world, surf_world, origin):
        d = jax.lax.axis_index(axis)

        def insert_one(cc: fm.CubeCloud, cloud: Cloud):
            flat, ok = fm._grid_index(
                fm.world_to_cube(cloud.xyz, cfg), origin, cfg)
            mine = ok & cloud.mask & (flat % ndev == d)
            local = jnp.where(mine, flat // ndev, nc_local)
            return fm._insert(cc, cloud.xyz, mine, local, nc_local)

        return insert_one(corner_cc, corner_world), insert_one(surf_cc, surf_world)

    return jax.jit(run)


def _single_view(state: ShardedMapState) -> fm.FeatureMapState:
    """Zero-copy FeatureMapState view for the ndev == 1 fast path.

    With one device the stripe permutation is the identity and nc_pad == nc,
    so the storage layout IS the single-device layout; the shard_map
    machinery (compact + all_gather in the surround, axis bookkeeping
    everywhere) measured 415 ms vs 241 ms per mapping step at mesh size 1
    (bench_artifacts/r4_chip6.log) for identical numerics.
    """
    return fm.FeatureMapState(corner=state.corner, surf=state.surf,
                              origin=state.origin)


def _from_single_view(st: fm.FeatureMapState) -> ShardedMapState:
    return ShardedMapState(corner=st.corner, surf=st.surf, origin=st.origin)


def add_feature_cloud(state: ShardedMapState, corner_world: Cloud,
                      surf_world: Cloud, cfg: MapConfig, mesh) -> ShardedMapState:
    """Sharded addFeatureCloud: each device scatters only the cubes it owns
    (zero cross-device communication)."""
    if mesh.devices.size == 1:
        return _from_single_view(fm.add_feature_cloud(
            _single_view(state), corner_world, surf_world, cfg))
    corner, surf = _insert_jit(cfg, mesh)(
        state.corner, state.surf, corner_world, surf_world, state.origin)
    return ShardedMapState(corner=corner, surf=surf, origin=state.origin)


@lru_cache(maxsize=None)
def _recenter_jit(cfg: MapConfig, mesh):
    axis = _axis(mesh)
    ndev = mesh.devices.size
    nc_pad = _padded_nc(cfg, ndev)
    nc_local = nc_pad // ndev
    nx, ny, nz = cfg.n_cubes
    nc = nx * ny * nz

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(axis), P(axis), P()),
    )
    def run(corner_cc, surf_cc, origin, sensor_pos):
        d = jax.lax.axis_index(axis)
        shift = fm.window_shift(origin, sensor_pos, cfg)
        new_origin = origin + shift
        keep_full = fm.keep_mask_for_window(origin, new_origin, cfg)
        # my storage positions p hold flat slots s = p*ndev + d
        slots = jnp.arange(nc_local, dtype=jnp.int32) * ndev + d
        keep = jnp.where(slots < nc, keep_full[jnp.clip(slots, 0, nc - 1)],
                         False)
        return (fm._clear_slots(corner_cc, keep),
                fm._clear_slots(surf_cc, keep), new_origin)

    return jax.jit(run)


def recenter(state: ShardedMapState, sensor_pos, cfg: MapConfig, mesh) -> ShardedMapState:
    if mesh.devices.size == 1:
        return _from_single_view(
            fm.recenter(_single_view(state), jnp.asarray(sensor_pos), cfg))
    corner, surf, origin = _recenter_jit(cfg, mesh)(
        state.corner, state.surf, state.origin, jnp.asarray(sensor_pos))
    return ShardedMapState(corner=corner, surf=surf, origin=origin)


@lru_cache(maxsize=None)
def _surround_jit(cfg: MapConfig, mesh):
    axis = _axis(mesh)
    ndev = mesh.devices.size
    nc_local = _padded_nc(cfg, ndev) // ndev
    cap_c = cfg.surround_corner_capacity
    cap_s = cfg.surround_surf_capacity
    # per-device share of the surround capacity (gathered back to full)
    cap_c_loc = -(-cap_c // ndev)
    cap_s_loc = -(-cap_s // ndev)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(), P()),
        # the all_gather output is identical on every device by
        # construction, but the varying-axes inference cannot prove it
        check_vma=False,
    )
    def run(corner_cc, surf_cc, origin, sensor_pos):
        d = jax.lax.axis_index(axis)
        offs = jnp.asarray(fm._surround_offsets(cfg))
        center = fm.world_to_cube(sensor_pos, cfg)
        flat, ok = fm._grid_index(center[None, :] + offs, origin, cfg)
        if cfg.vfov_up_deg > 0.0 or cfg.vfov_down_deg > 0.0:
            ok = ok & fm._vfov_mask(offs, sensor_pos, cfg)
        own = ok & (flat % ndev == d)
        local = jnp.where(own, flat // ndev, 0)

        def gather(cc: fm.CubeCloud, cap_local):
            xyz = cc.xyz[local]                      # [A, cap, 3]
            mask = cc.mask[local] & own[:, None]
            c = cloud_lib.make(
                jnp.where(mask[..., None], xyz, cloud_lib.FAR).reshape(-1, 3),
                mask.reshape(-1),
            )
            c = cloud_lib.compact(c, cap_local)
            # all_gather my compacted share -> the full surround, replicated
            xyz_all = jax.lax.all_gather(c.xyz, axis)      # [ndev, capL, 3]
            mask_all = jax.lax.all_gather(c.mask, axis)
            return cloud_lib.make(
                xyz_all.reshape(-1, 3), mask_all.reshape(-1))

        return (gather(corner_cc, cap_c_loc), gather(surf_cc, cap_s_loc))

    return jax.jit(run)


def get_surround(state: ShardedMapState, sensor_pos, cfg: MapConfig, mesh):
    """Cross-device surround gather: (corner, surf) Clouds, replicated.

    Capacity note: each device contributes at most ``ceil(capacity / ndev)``
    points, so the gather can truncate points the single-device gather would
    keep whenever any ONE device owns more than its share — i.e. whenever
    the per-device active-point ownership is uneven enough that
    ``max_d(points on d) > capacity / ndev``, even with the total below
    ``capacity``.  The stripe spreads a localized surround ~uniformly (the z
    axis strides the stripe), but dense near-sensor cubes skew ownership:
    one full surf cube (``surf_cube_capacity`` points) saturates a device's
    share once ``capacity / ndev`` drops below the cube capacity.  Size
    ``surround_*_capacity`` with headroom (>= ndev * cube capacity keeps a
    single hot cube from ever truncating); the all-in-one-z-column map is
    just the pathological extreme of the same condition.
    """
    if mesh.devices.size == 1:
        return fm.get_surround(_single_view(state), jnp.asarray(sensor_pos),
                               cfg)
    return _surround_jit(cfg, mesh)(
        state.corner, state.surf, state.origin, jnp.asarray(sensor_pos))


@lru_cache(maxsize=None)
def _dedup_jit(cfg: MapConfig, mesh):
    from ..ops.voxel import voxel_downsample

    axis = _axis(mesh)
    ndev = mesh.devices.size
    nc_local = _padded_nc(cfg, ndev) // ndev
    keep_first = cfg.dedup_policy == "anchor"

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(axis), P(axis)),
    )
    def run(corner_cc, surf_cc, origin, sensor_pos):
        d = jax.lax.axis_index(axis)
        offs = jnp.asarray(fm._surround_offsets(cfg))
        center = fm.world_to_cube(sensor_pos, cfg)
        flat, ok = fm._grid_index(center[None, :] + offs, origin, cfg)
        if cfg.vfov_up_deg > 0.0 or cfg.vfov_down_deg > 0.0:
            ok = ok & fm._vfov_mask(offs, sensor_pos, cfg)
        own = ok & (flat % ndev == d)
        local = jnp.where(own, flat // ndev, nc_local)  # guard row

        def process(cc: fm.CubeCloud, leaf):
            cap = cc.xyz.shape[1]
            xyz_g = jnp.concatenate(
                [cc.xyz, jnp.full((1, cap, 3), cloud_lib.FAR)], 0)
            mask_g = jnp.concatenate([cc.mask, jnp.zeros((1, cap), bool)], 0)
            sub = jax.vmap(
                lambda x, m: voxel_downsample(cloud_lib.make(x, m), leaf,
                                              keep_first=keep_first)
            )(xyz_g[local], mask_g[local])
            xyz_new = xyz_g.at[local].set(sub.xyz)[:-1]
            mask_new = mask_g.at[local].set(sub.mask)[:-1]
            count_new = jnp.sum(mask_new, axis=-1, dtype=jnp.int32)
            return fm.CubeCloud(xyz=xyz_new, mask=mask_new, count=count_new)

        return (process(corner_cc, cfg.corner_leaf),
                process(surf_cc, cfg.surf_leaf))

    return jax.jit(run)


def dedup_active(state: ShardedMapState, sensor_pos, cfg: MapConfig, mesh) -> ShardedMapState:
    """Sharded downsizeValidCloud: per-cube re-voxelization, device-local."""
    if mesh.devices.size == 1:
        return _from_single_view(
            fm.dedup_active(_single_view(state), jnp.asarray(sensor_pos), cfg))
    corner, surf = _dedup_jit(cfg, mesh)(
        state.corner, state.surf, state.origin, jnp.asarray(sensor_pos))
    return ShardedMapState(corner=corner, surf=surf, origin=state.origin)


# ---------------------------------------------------------------------------
# sharded mapping step (the LaserMapping loop against the sharded map)
# ---------------------------------------------------------------------------


def mapping_step(matcher, map_state: ShardedMapState, corner: Cloud,
                 surf: Cloud, L_now, sm_cfg, matcher_cfg, map_cfg: MapConfig,
                 mesh):
    """LaserMapping step against the device-sharded map.

    Same dataflow as models/laser_mapping.mapping_step: merge guess ->
    recenter -> surround gather (all_gather across shards) -> replicated
    scan-match solve -> commit policy -> sharded insert.  The solve is
    replicated (it is small); the map state and its bandwidth-heavy
    gather/scatter are sharded.
    """
    from ..models import laser_mapping as lm_mod
    from ..ops import scan_match as sm
    from ..utils import se3, twist

    if mesh.devices.size == 1:
        # whole-step fast path: the per-op bypasses still pay one relay
        # dispatch per stage (measured 667 ms/step vs 239 for the
        # single-jit step on chip); at mesh 1 the entire step IS the
        # single-device jitted program
        matcher_new, st, out = lm_mod.mapping_step(
            matcher, _single_view(map_state), corner, surf, L_now,
            sm_cfg, matcher_cfg, map_cfg,
        )
        return matcher_new, _from_single_view(st), out

    T_guess = se3.transform_associate(matcher.L_last, L_now, matcher.W_last)
    corner_ds, surf_ds = lm_mod.prepare_frame(corner, surf, matcher_cfg)
    sensor_pos = T_guess[:3, 3]
    map_state = recenter(map_state, sensor_pos, map_cfg, mesh)
    ref_corner, ref_surf = get_surround(map_state, sensor_pos, map_cfg, mesh)

    res = sm.scan_match(
        corner_ds, surf_ds, ref_corner, ref_surf, twist.from_mat(T_guess),
        sm_cfg,
    )
    if matcher_cfg.commit_rejected_solves:
        W_new = twist.to_mat(res.x)
    else:
        W_new = jnp.where(res.success, twist.to_mat(res.x), T_guess)
    map_state = add_feature_cloud(
        map_state, lm_mod._to_world(corner_ds, W_new),
        lm_mod._to_world(surf_ds, W_new), map_cfg, mesh,
    )
    matcher_new = lm_mod.MatcherState(L_last=L_now, W_last=W_new)
    return matcher_new, map_state, lm_mod.MappingOutput(
        W=W_new, result=res, corner_ds=corner_ds, surf_ds=surf_ds
    )
