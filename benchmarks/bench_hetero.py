"""Heterogeneous concurrent sweep solves (BASELINE config 5 realism).

bench.py broadcasts ONE sweep pair across the batch (identical correspondence
structure, only the initial guesses vary).  This bench builds a batch of
GENUINELY distinct problems — different worlds (pillar layouts), different
start poses, different per-problem motions — so every solve races its own
correspondence structure through the gathers.  This is the honest shape of
"4096 concurrent sweep solves" (BASELINE.md config 5).

Capacities are snugged to the batch-max valid count (rounded up to 256);
the un-snugged (sensor-generic extractor bound) number is reported alongside
(VERDICT round-1 item 8).

Usage: python benchmarks/bench_hetero.py [batch] [n_worlds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import cooper_mapper_tpu  # noqa: F401
from cooper_mapper_tpu.config import OdometryConfig, RegistrationConfig
from cooper_mapper_tpu.io import sim
from cooper_mapper_tpu.ops import features, odometry as odo_ops
from cooper_mapper_tpu.utils import cloud as cloud_lib

BASELINE_SOLVES_PER_S = 10.0


def build_batch(batch, n_worlds=16, width=1024, n_rings=16, seed=0):
    """[batch] distinct sweep-pair problems: world w = seed w, per-problem
    start pose scattered in the room, per-problem motion."""
    rng = np.random.RandomState(seed)
    worlds = [sim.make_room_world(seed=w, n_pillars=6) for w in range(n_worlds)]
    world_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *worlds)
    widx = jnp.asarray(rng.randint(0, n_worlds, size=batch))

    p0 = np.tile(np.eye(4, dtype=np.float32), (batch, 1, 1))
    p0[:, 0, 3] = rng.uniform(-8, 8, batch)
    p0[:, 1, 3] = rng.uniform(1.0, 2.5, batch)
    p0[:, 2, 3] = rng.uniform(-12, 12, batch)
    yaw0 = rng.uniform(0, 2 * np.pi, batch)
    p0[:, 0, 0] = np.cos(yaw0); p0[:, 0, 2] = np.sin(yaw0)
    p0[:, 2, 0] = -np.sin(yaw0); p0[:, 2, 2] = np.cos(yaw0)

    dyaw = rng.uniform(-0.05, 0.05, batch).astype(np.float32)
    fwd = rng.uniform(0.1, 0.5, batch).astype(np.float32)
    step = np.tile(np.eye(4, dtype=np.float32), (batch, 1, 1))
    step[:, 0, 0] = np.cos(dyaw); step[:, 0, 2] = np.sin(dyaw)
    step[:, 2, 0] = -np.sin(dyaw); step[:, 2, 2] = np.cos(dyaw)
    step[:, 2, 3] = fwd
    p1 = np.einsum("bij,bjk->bik", p0, step)
    p2 = np.einsum("bij,bjk->bik", p1, step)

    cfg_reg = RegistrationConfig(n_rings=n_rings, max_points_per_ring=width)

    def one_problem(args):
        wi, a, b, c = args
        w = jax.tree.map(lambda x: x[wi], world_stack)
        s_prev = sim.scan_sweep(w, a, b, n_rings=n_rings, width=width)
        s_cur = sim.scan_sweep(w, b, c, n_rings=n_rings, width=width)
        f_prev = features.extract_features(s_prev, cfg_reg)
        f_cur = features.extract_features(s_cur, cfg_reg)
        return (f_cur.sharp, f_cur.flat, f_prev.less_sharp, f_prev.less_flat)

    # generate in chunks: the ray-cast intermediate is [chunk, R, W, M]
    chunk = min(64, batch)
    pad = (-batch) % chunk

    def padded(a):
        a = np.asarray(a)
        reps = np.resize(np.arange(batch), batch + pad)
        return jnp.asarray(a[reps])

    args = (padded(widx), padded(p0), padded(p1), padded(p2))
    args = jax.tree.map(lambda a: a.reshape((-1, chunk) + a.shape[1:]), args)
    out = jax.lax.map(lambda a: jax.vmap(one_problem)(a), args)
    out = jax.tree.map(
        lambda a: a.reshape((-1,) + a.shape[2:])[:batch], out
    )
    return out


def snug_batch(c, granule=256):
    """Compact every problem and truncate to the batch-max count."""
    n = int(jnp.max(jnp.sum(c.mask, axis=-1)))
    cap = -(-n // granule) * granule
    return jax.vmap(lambda ci: cloud_lib.compact(ci, cap))(c)


def _cache_path(batch, n_worlds):
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f".hetero_cache_b{batch}_w{n_worlds}.npz")


def load_or_build(batch, n_worlds):
    """Problem generation is ~0.9 s/problem through the relay; cache the
    generated batch to disk so 4096-problem runs don't re-pay ~1 h of
    ray-casting per measurement."""
    path = _cache_path(batch, n_worlds)
    names = ("sharp", "flat", "ref_c", "ref_s")
    if os.path.exists(path):
        z = np.load(path)
        from cooper_mapper_tpu.utils.cloud import Cloud
        clouds = tuple(
            Cloud(jnp.asarray(z[f"{n}_xyz"]), jnp.asarray(z[f"{n}_mask"]),
                  jnp.asarray(z[f"{n}_ring"]), jnp.asarray(z[f"{n}_rel"]))
            for n in names
        )
        return clouds, tuple(z["raw_caps"].tolist()), 0.0
    t0 = time.time()
    raw = build_batch(batch, n_worlds)
    raw_caps = tuple(c.capacity for c in raw)
    clouds = tuple(snug_batch(c) for c in raw)
    jax.block_until_ready(clouds[0].xyz)
    gen_s = time.time() - t0
    arrs = {}
    for n, c in zip(names, clouds):
        arrs[f"{n}_xyz"] = np.asarray(c.xyz)
        arrs[f"{n}_mask"] = np.asarray(c.mask)
        arrs[f"{n}_ring"] = np.asarray(c.ring)
        arrs[f"{n}_rel"] = np.asarray(c.rel_time)
    np.savez_compressed(path, raw_caps=np.asarray(raw_caps), **arrs)
    return clouds, raw_caps, gen_s


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_worlds = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    # HETERO_MODE=bucketed (default): the self-tuning dispatch planner
    # (parallel/batch.bucket_plan) — per-problem bucket capacities when the
    # size distribution pays, an automatic homogeneous fallback with
    # dynamic-slice row selection when it doesn't (never worse than the
    # chunk loop by construction; measured 1532 vs 1490 same-session at
    # b512).  HETERO_MODE=chunk keeps the plain host chunk loop for A/Bs.
    mode = os.environ.get("HETERO_MODE", "bucketed")
    chunk = min(batch, int(os.environ.get("HETERO_CHUNK", "256")))
    granule = int(os.environ.get("HETERO_GRANULE", "512"))
    cfg = OdometryConfig()

    (sharp, flat, ref_c, ref_s), raw_caps, gen_s = load_or_build(batch, n_worlds)

    rng = np.random.RandomState(0)
    if mode == "bucketed":
        from cooper_mapper_tpu.parallel import batch as pbatch

        # the plan (valid counts -> bucket signatures) is a property of the
        # problem set, not of a solve: computed once, reused every rep —
        # one device sync per batch of problems, amortized to noise
        plan = pbatch.bucket_plan(sharp, flat, ref_c, ref_s,
                                  granule=granule, chunk=chunk)

        def solve_all(x0):
            # with_states=False matches the chunk path, which DCEs the
            # diagnostic states inside its jit ([0] indexing)
            x, _ = pbatch.bucketed_odometry_solve(
                sharp, flat, ref_c, ref_s, x0, cfg,
                granule=granule, chunk=chunk, plan=plan, with_states=False)
            return x
    else:
        solve = jax.jit(
            lambda a, b, c, d, x: odo_ops.batch_odometry_solve(a, b, c, d, x, cfg)[0]
        )

        def solve_all(x0):
            outs = []
            for s0 in range(0, batch, chunk):
                sl = lambda c: jax.tree.map(lambda a: a[s0:s0 + chunk], c)
                outs.append(solve(sl(sharp), sl(flat), sl(ref_c), sl(ref_s),
                                  x0[s0:s0 + chunk]))
            return outs

    jax.device_get(solve_all(jnp.asarray(0.02 * rng.randn(batch, 6), jnp.float32)))

    reps = 5 if batch <= 1024 else 3
    dts = []
    for _ in range(reps):
        x0r = jnp.asarray(0.02 * rng.randn(batch, 6), jnp.float32)
        t0 = time.perf_counter()
        jax.device_get(solve_all(x0r))
        dts.append(time.perf_counter() - t0)
    dt = min(dts)

    print({
        "batch": batch,
        "n_worlds": n_worlds,
        "mode": mode,
        "chunk": chunk,
        "generation_s": round(gen_s, 1),
        "capacities_unsnug": raw_caps,
        "capacities_snug": (sharp.capacity, flat.capacity,
                            ref_c.capacity, ref_s.capacity),
        "hetero_solves_per_s": round(batch / dt, 1),
        "vs_baseline_10hz": round(batch / dt / BASELINE_SOLVES_PER_S, 1),
    })


if __name__ == "__main__":
    main()
