"""Sharded-map capacity axis: measured per-device bytes + a does-not-fit demo.

The reference's DynamicFeatureMap exists to hold maps bigger than one
memory (/root/reference/L_SLAM/src/util/DynamicFeatureMap.h:504-677, disk
paging).  The TPU analog is HBM: maps/sharded_map.py stripes the cube axis
over the mesh so aggregate map capacity scales with device count.  This
bench MEASURES that axis instead of asserting it:

* ``cpu-mesh`` (default off-TPU): builds a city-scale map config on the
  8-device virtual mesh, reports ACTUAL per-device bytes of the cube
  arrays (``Array.addressable_shards[..].data.nbytes`` — real buffers, not
  config arithmetic) sharded vs single-device, then runs an insert + one
  surround gather at that scale to show the ops execute.

* ``tpu`` (default on TPU): allocates the same single-device map on the
  real chip, growing the config until allocation FAILS with
  RESOURCE_EXHAUSTED — the measured single-chip ceiling — and reports the
  per-device bytes the failing config needs on an 8-way stripe (measured
  on the virtual mesh by the cpu-mesh mode; the per-device stripe of the
  failing config is 1/8 of its total, which fits).

Usage: python benchmarks/bench_map_capacity.py [cpu-mesh|tpu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import cooper_mapper_tpu  # noqa: F401
from cooper_mapper_tpu.config import MapConfig


def big_cfg(scale=1):
    """~6.5 GB of cube arrays at scale 1 (the 121x121-cube mapping-node
    scale with production capacities, LaserMatcher.cpp:107-113)."""
    return MapConfig(
        n_cubes=(21, 11, 21), cube_size=50.0,
        corner_cube_capacity=4096 * scale, surf_cube_capacity=16384 * scale,
        surround_corner_capacity=65536, surround_surf_capacity=262144,
        valid_distance=150.0,
    )


def state_bytes(tree):
    per_dev = {}
    for leaf in jax.tree.leaves(tree):
        for sh in leaf.addressable_shards:
            key = str(sh.device)
            per_dev[key] = per_dev.get(key, 0) + sh.data.nbytes
    return per_dev


def run_cpu_mesh(scale=1):
    from cooper_mapper_tpu.maps import feature_map as fm
    from cooper_mapper_tpu.maps import sharded_map as smap
    from cooper_mapper_tpu.parallel import mesh as mesh_lib
    from cooper_mapper_tpu.utils import cloud as cloud_lib

    assert len(jax.devices()) >= 8, "need the 8-device virtual mesh"
    cfg = big_cfg(scale)
    mesh = mesh_lib.make_mesh(8)

    sharded = smap.create_sharded(cfg, mesh)
    jax.block_until_ready(sharded.surf.mask)
    per_dev = state_bytes((sharded.corner, sharded.surf))
    total_sharded = sum(per_dev.values())
    max_dev = max(per_dev.values())

    single = fm.create(cfg)
    jax.block_until_ready(single.surf.mask)
    single_bytes = sum(state_bytes((single.corner, single.surf)).values())

    # the map works at this scale: insert a frame + one surround gather.
    # The gather only runs at small scales on the VIRTUAL mesh: 8
    # time-sliced CPU "devices" on 2 cores make a participant late past the
    # 40 s collective rendezvous termination at city-scale per-device work
    # (CLAUDE.md) — a simulation artifact, not a design property; insert
    # and recenter are communication-free at any scale.
    rng = np.random.RandomState(0)
    c = cloud_lib.from_points(
        jnp.asarray(rng.uniform(-100, 100, (2048, 3)), jnp.float32))
    s = cloud_lib.from_points(
        jnp.asarray(rng.uniform(-100, 100, (8192, 3)), jnp.float32))
    sharded = smap.add_feature_cloud(sharded, c, s, cfg, mesh)
    if scale <= 2:
        sc, ss = smap.get_surround(sharded, np.zeros(3, np.float32), cfg,
                                   mesh)
        jax.block_until_ready(ss.mask)
        surround_pts = int(jnp.sum(ss.mask))
    else:
        jax.block_until_ready(sharded.surf.count)
        surround_pts = "skipped (virtual-mesh collective timeout; see note)"

    gib = 1 << 30
    print({
        "mode": "cpu-mesh",
        "scale": scale,
        "config": f"21x11x21 cubes, corner {4096*scale} / surf {16384*scale} per cube",
        "single_device_bytes_gib": round(single_bytes / gib, 2),
        "sharded_total_bytes_gib": round(total_sharded / gib, 2),
        "sharded_max_per_device_gib": round(max_dev / gib, 2),
        "devices": len(per_dev),
        "per_device_reduction": round(single_bytes / max_dev, 2),
        "inserted_surf_pts": int(jnp.sum(sharded.surf.count)),
        "surround_gather_pts": surround_pts,
    })


def run_tpu():
    from cooper_mapper_tpu.maps import feature_map as fm

    gib = 1 << 30
    dev = jax.devices()[0]
    print({"device_kind": dev.device_kind,
           "memory_stats": dev.memory_stats() or "n/a"})
    fits, fails = None, None
    for scale in (8, 16, 24, 32, 48, 64):
        cfg = big_cfg(scale)
        nc = int(np.prod(cfg.n_cubes))
        want = nc * (cfg.corner_cube_capacity + cfg.surf_cube_capacity) * (
            3 * 4 + 1) + nc * 8
        try:
            st = fm.create(cfg)
            # touch EVERY array with a device reduction: relay-backed
            # allocation can be deferred until first use, so block on sums
            # of the big cube buffers, not just array creation
            tot = sum(jnp.sum(leaf[..., -1]).astype(jnp.float32)
                      for leaf in jax.tree.leaves((st.corner, st.surf)))
            jax.block_until_ready(tot)
            del st
            fits = (scale, want)
            print(f"  scale {scale}: single-chip map of "
                  f"{want / gib:.1f} GiB allocated + touched OK")
        except Exception as e:
            fails = (scale, want, type(e).__name__)
            print(f"  scale {scale}: single-chip allocation FAILED "
                  f"({type(e).__name__}) at {want / gib:.1f} GiB")
            break
    out = {"mode": "tpu", "fits": fits, "fails": fails}
    if fails:
        out["sharded8_per_device_gib"] = round(fails[1] / 8 / gib, 2)
        out["conclusion"] = (
            "config exceeds one chip's HBM but its 8-way stripe per-device "
            "share fits (measured per-device shard bytes: cpu-mesh mode)")
    print(out)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else (
        "tpu" if jax.default_backend() == "tpu" else "cpu-mesh")
    if mode == "cpu-mesh":
        scale = int(sys.argv[2]) if len(sys.argv) > 2 else 1
        run_cpu_mesh(scale)
    else:
        run_tpu()


if __name__ == "__main__":
    main()
