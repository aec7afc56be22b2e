"""Sharded batched solvers — the BASELINE config-5 workload.

4096 concurrent scan-match solves shard over the mesh batch axis (pure data
parallelism: each device solves its slice, zero cross-device traffic in the
solve itself), and the global pose-graph LM reduces per-edge Hessian/gradient
block contributions with psum over the same mesh (SURVEY.md §2.8, §5
"long-context" analog).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import OdometryConfig, PoseGraphConfig, ScanMatchConfig
from ..ops import odometry as odo_ops
from ..ops import pose_graph as pg
from ..ops import scan_match as sm_ops
from ..utils import se3
from . import mesh as mesh_lib


@lru_cache(maxsize=None)
def _odometry_jit(cfg: OdometryConfig, mesh):
    """Cached jitted sharded odometry solve.

    jit caches key on the function object, so building ``jax.jit(lambda ...)``
    per call retraced + recompiled every invocation (measured 62x throughput
    loss through the axon relay).  Keyed on (cfg, mesh) — both hashable.
    """
    return jax.jit(
        lambda a, b, c, d, x: odo_ops.batch_odometry_solve(a, b, c, d, x, cfg),
        out_shardings=mesh_lib.batch_sharding(mesh),
    )


@lru_cache(maxsize=None)
def _scan_match_jit(cfg: ScanMatchConfig, mesh, chunk: int):
    return jax.jit(
        lambda a, b, c, d, x: sm_ops.batch_scan_match(a, b, c, d, x, cfg, chunk),
        out_shardings=mesh_lib.batch_sharding(mesh),
    )


def sharded_odometry_solve(sharp, flat, last_corner, last_surf, x0, cfg: OdometryConfig,
                           mesh):
    """Batch-parallel scan-to-scan solves over the mesh.

    All cloud pytrees carry a leading batch dim divisible by the mesh size.
    """
    sharp, flat, last_corner, last_surf, x0 = mesh_lib.shard_batch(
        (sharp, flat, last_corner, last_surf, x0), mesh
    )
    return _odometry_jit(cfg, mesh)(sharp, flat, last_corner, last_surf, x0)


def sharded_scan_match(corner, surf, ref_corner, ref_surf, x0,
                       cfg: ScanMatchConfig, mesh, chunk: int = 512):
    """Batch-parallel scan-to-map solves over the mesh.

    Unbatched reference clouds (xyz [M, 3]) are REPLICATED across the mesh
    and shared by every problem (batch_scan_match's shared-reference mode);
    batched references shard with the batch like every other operand.
    """
    corner, surf, x0 = mesh_lib.shard_batch((corner, surf, x0), mesh)
    if ref_corner.xyz.ndim == 2:
        rep = mesh_lib.replicated(mesh)
        ref_corner, ref_surf = jax.tree.map(
            lambda a: jax.device_put(a, rep), (ref_corner, ref_surf)
        )
    else:
        ref_corner, ref_surf = mesh_lib.shard_batch((ref_corner, ref_surf), mesh)
    return _scan_match_jit(cfg, mesh, chunk)(corner, surf, ref_corner, ref_surf, x0)


# ---------------------------------------------------------------------------
# Capacity-bucketed heterogeneous dispatch: the production shape of BASELINE
# config 5 ("4096 concurrent sweep solves") is heterogeneous by construction
# — distinct worlds with distinct per-problem cloud sizes.  Padding every
# problem to the batch max wastes race work quadratically on the small ones,
# and a host-side chunk loop (the round-4 bench harness) serializes dispatch.
# Here every problem is compacted to the next capacity BUCKET of a small
# static set, problems sharing a bucket signature solve in ONE homogeneous
# vmapped dispatch, and results scatter back in input order.  One compile per
# signature, cached for the process lifetime.
# ---------------------------------------------------------------------------


def _bucket_cap(n: int, granule: int) -> int:
    """Smallest bucket >= n: granule doublings (granule, 2g, 4g, ...) keep
    the compiled-variant count logarithmic in the size spread."""
    cap = granule
    while cap < n:
        cap *= 2
    return cap


@lru_cache(maxsize=None)
def _bucket_odometry_jit(cfg: OdometryConfig, caps: tuple, chunk: int,
                         front_packed: bool, contiguous: bool,
                         with_states: bool = True):
    """One compiled variant per (bucket signature, chunk): gather the
    member problems' rows, truncate each cloud to its bucket capacity,
    solve — a single device dispatch.

    ``front_packed``: every cloud's valid points sit at the front (checked
    once per call on device) — truncation is a static slice.  Otherwise a
    vmapped compact (argsort) front-packs first; sorting is expensive on
    TPU, so pipelines should hand in front-packed clouds (the extractor and
    cloud_lib.compact both produce them).

    ``contiguous``: the member run is a consecutive index range — row
    selection is a dynamic_slice (no gather copy; the homogeneous-fallback
    plan's chunks are always contiguous).
    """
    from ..utils import cloud as cloud_lib

    cs, cf, crc, crs = caps

    def trunc(t, cap):
        if front_packed:
            return jax.tree.map(lambda a: a[:, :cap], t)
        return jax.vmap(lambda c: cloud_lib.compact(c, cap))(t)

    def run(sharp, flat, ref_c, ref_s, x0, idx):
        if contiguous:
            take = lambda t: jax.tree.map(
                lambda a: jax.lax.dynamic_slice_in_dim(a, idx[0], chunk, 0),
                t)
            x0c = jax.lax.dynamic_slice_in_dim(x0, idx[0], chunk, 0)
        else:
            take = lambda t: jax.tree.map(
                lambda a: jnp.take(a, idx, axis=0), t)
            x0c = x0[idx]
        x, st = odo_ops.batch_odometry_solve(
            trunc(take(sharp), cs), trunc(take(flat), cf),
            trunc(take(ref_c), crc), trunc(take(ref_s), crs),
            x0c, cfg,
        )
        # with_states=False lets XLA dead-code-eliminate the diagnostic
        # state outputs inside the dispatch (pose-only callers skip
        # computing + concatenating ~8 per-problem diagnostic arrays)
        return (x, st) if with_states else (x, None)

    return jax.jit(run)


def bucket_plan(sharp, flat, ref_c, ref_s, granule: int = 512,
                chunk: int = 256):
    """Host-side dispatch plan for bucketed_odometry_solve: ONE device sync
    (valid counts + front-packedness), then pure bookkeeping.

    The plan depends only on the clouds' valid counts, so it is reusable
    across solves of the same problem set (fresh x0s, repeated refinement)
    — pass it back via ``plan=`` to keep the steady-state dispatch
    sync-free.

    Small signatures coalesce upward: a fixed-shape dispatch pads its
    member list by repetition, so a 20-member signature would cost a full
    chunk of wasted solves.  Any signature below chunk/4 members merges
    into the element-wise max with the next signature (every problem
    solves correctly at >= its bucket caps); signatures are visited
    smallest-cost first so merges cascade upward.  Tails dispatch at the
    next multiple of 32 (pad waste < 32 solves per signature).  When the
    bucketed plan's padded work proxy is not at least 10% below a single
    homogeneous plan at the element-wise max caps, the homogeneous plan is
    emitted instead — bucketing never does worse than chunked dispatch.
    """
    import numpy as np

    B = sharp.mask.shape[0]

    def fp(c):
        n = c.count()
        ar = jnp.arange(c.capacity)
        return jnp.all(c.mask == (ar[None, :] < n[:, None]))

    clouds = (sharp, flat, ref_c, ref_s)
    got = jax.device_get([c.count() for c in clouds] + [fp(c) for c in clouds])
    counts, packed = got[:4], got[4:]
    front_packed = all(bool(p) for p in packed)
    counts = np.stack(counts, axis=1)                       # [B, 4]
    caps_full = tuple(c.capacity for c in clouds)
    sig = np.stack(
        [[min(_bucket_cap(int(n), granule), full)
          for n, full in zip(row, caps_full)] for row in counts]
    )                                                        # [B, 4]
    order: dict = {}
    for p in range(B):
        order.setdefault(tuple(int(v) for v in sig[p]), []).append(p)

    csz = min(chunk, B)
    min_members = max(1, csz // 4)
    sigs = sorted(order.items(), key=lambda kv: int(np.prod(kv[0])))
    coalesced: list = []
    for caps, members in sigs:
        if coalesced and len(coalesced[-1][1]) < min_members:
            prev_caps, prev_members = coalesced.pop()
            caps = tuple(max(a, b) for a, b in zip(prev_caps, caps))
            members = prev_members + members
        coalesced.append((caps, members))
    if len(coalesced) > 1 and len(coalesced[-1][1]) < min_members:
        caps_a, mem_a = coalesced.pop()
        caps_b, mem_b = coalesced.pop()
        coalesced.append(
            (tuple(max(a, b) for a, b in zip(caps_a, caps_b)), mem_b + mem_a)
        )

    def chunked(groups):
        out = []
        for caps, members in groups:
            s0 = 0
            while s0 < len(members):
                rem = len(members) - s0
                take_n = csz if rem >= csz else min(csz, -(-rem // 32) * 32)
                sl = members[s0:s0 + take_n]
                idx = np.resize(np.asarray(sl, np.int32), take_n)  # repeat-pad
                out.append((caps, take_n, sl, idx))
                s0 += take_n
        return out

    # Self-tuning fallback: when the size distribution is tail-heavy (most
    # problems in the top bucket), per-signature dispatch padding eats the
    # bucket savings — a single homogeneous plan at the element-wise max
    # caps is cheaper.  Compare a correspondence-race work proxy
    # (query_cap x ref_cap, padded dispatch sizes included) and emit
    # whichever plan costs less, so callers never do worse than the plain
    # chunked dispatch.
    cost = lambda caps: caps[0] * caps[2] + caps[1] * caps[3]
    bucketed = chunked(coalesced)
    flat_caps = tuple(int(np.max(sig[:, i])) for i in range(sig.shape[1]))
    flat = chunked([(flat_caps, list(range(B)))])
    work_b = sum(n * cost(caps) for caps, n, _, _ in bucketed)
    work_f = sum(n * cost(caps) for caps, n, _, _ in flat)
    # threshold calibrated on chip: the linear race-work proxy overstates
    # bucket savings (the NN races carry capacity-independent issue
    # latency, and bucketed member gathers are non-contiguous), so a
    # predicted-0.89 plan measured 6% SLOWER than flat — demand a sizable
    # predicted margin before paying bucketing's dispatch diversity
    dispatches = bucketed if work_b < 0.75 * work_f else flat
    return front_packed, tuple(dispatches)


def bucketed_odometry_solve(sharp, flat, ref_c, ref_s, x0,
                            cfg: OdometryConfig, granule: int = 512,
                            chunk: int = 256, plan=None,
                            with_states: bool = True):
    """Heterogeneous batched scan-to-scan solves via capacity buckets.

    Inputs are batched Clouds at any (possibly generous) capacities; the
    per-problem valid counts decide each problem's bucket signature
    (per-cloud bucket caps, see bucket_plan).  Each signature dispatches in
    fixed-size compiled chunks; results scatter back in input order —
    numerically identical to solving each problem alone at its bucket
    capacity.  ``plan`` (from bucket_plan) skips the per-call device sync;
    ``with_states=False`` returns (x, None) with the diagnostic states
    dead-code-eliminated inside each dispatch.
    """
    import numpy as np

    if plan is None:
        plan = bucket_plan(sharp, flat, ref_c, ref_s, granule, chunk)
    front_packed, dispatches = plan

    out_members: list = []
    out_x: list = []
    out_st: list = []
    for caps, take_n, sl, idx in dispatches:
        contiguous = (
            len(sl) == take_n
            and sl[-1] - sl[0] == take_n - 1
            and all(b - a == 1 for a, b in zip(sl, sl[1:]))
        )
        fn = _bucket_odometry_jit(cfg, caps, take_n, front_packed,
                                  contiguous, with_states)
        x, st = fn(sharp, flat, ref_c, ref_s, x0, jnp.asarray(idx))
        out_members.append(sl)
        out_x.append(x[: len(sl)])
        if with_states:
            out_st.append(jax.tree.map(lambda a: a[: len(sl)], st))
    perm = np.argsort(np.concatenate(out_members))
    x_out = jnp.concatenate(out_x)[perm]
    if not with_states:
        return x_out, None
    st_out = jax.tree.map(
        lambda *leaves: jnp.concatenate(leaves)[perm], *out_st
    )
    return x_out, st_out


# ---------------------------------------------------------------------------
# Sharded pose-graph LM: edges partitioned across devices, block Hessian and
# gradient psum-reduced, replicated solve (the BASELINE "per-block
# Hessian/gradient contributions reduced via psum/all-gather").
# ---------------------------------------------------------------------------


def _local_blocks(poses, edge_i, edge_j, edge_T, edge_info, edge_mask):
    """Per-shard assembly of the dense system from the local edge slice.

    Thin composition of the shared kernels (pose_graph.edge_blocks_from +
    dense_from_blocks) so the sharded numerics stay bit-identical to the
    single-device path by construction.
    """
    n = poses.shape[0]
    H_ii, H_jj, H_ij, g, cost = pg.edge_blocks_from(
        poses, edge_i, edge_j, edge_T, edge_info, edge_mask
    )
    H = pg.dense_from_blocks(H_ii, H_jj, H_ij, edge_i, edge_j, n)  # [6n, 6n]
    return H, g, cost


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def sharded_pose_graph_optimize(graph: pg.PoseGraph, cfg: PoseGraphConfig, mesh):
    """LM with edge-sharded assembly.  Edge capacity must be divisible by the
    mesh size.

    ``cfg.solver == "dense"``: each device builds dense blocks for its edge
    slice; H, g, and the cost psum across the mesh; the solve is replicated.

    ``cfg.solver == "cg"``: matrix-free — per-edge 6x6 blocks stay resident
    on their shard and only [N,6] vectors cross the ICI: the gradient, the
    node-diagonal preconditioner blocks, and one psum per CG iteration for
    the Hessian-vector product.  This is the scalable path: communication
    O(N) per step instead of the O(N^2) dense-Hessian reduction.
    """
    if cfg.solver == "cg":
        return _sharded_optimize_cg(graph, cfg, mesh)
    if cfg.solver != "dense":
        raise ValueError(f"unknown pose-graph solver {cfg.solver!r}")
    axis = mesh.axis_names[0]
    n = graph.poses.shape[0]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
    )
    def assemble(poses, ei, ej, eT, einfo, emask):
        H, g, cost = _local_blocks(poses, ei, ej, eT, einfo, emask)
        return (
            jax.lax.psum(H, axis),
            jax.lax.psum(g, axis),
            jax.lax.psum(cost, axis),
        )

    def body(it, carry):
        graph, lam, cost = carry
        H, g2, _ = assemble(
            graph.poses, graph.edge_i, graph.edge_j, graph.edge_T,
            graph.edge_info, graph.edge_mask,
        )
        g = g2.reshape(6 * n)
        damp = pg.gauge_damping(graph.node_mask,
                                jnp.diagonal(H).reshape(n, 6), lam)
        H = H + jnp.diag(damp.reshape(6 * n))
        # SPD damped system: Cholesky, not LU — TPU LU-with-pivoting measures
        # 62x slower at [1536, 1536] (benchmarks/exp_dense_solve.py)
        L = jnp.linalg.cholesky(H)
        y = jax.scipy.linalg.solve_triangular(L, -g, lower=True)
        dx = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        cand = pg._apply_update(graph, dx)
        _, _, new_cost = assemble(
            cand.poses, cand.edge_i, cand.edge_j, cand.edge_T,
            cand.edge_info, cand.edge_mask,
        )
        accept = new_cost < cost
        graph = jax.tree.map(
            lambda a, b: jnp.where(jnp.reshape(accept, (1,) * a.ndim), a, b),
            cand, graph,
        )
        lam = jnp.clip(
            jnp.where(accept, lam / cfg.lm_lambda_factor, lam * cfg.lm_lambda_factor),
            1e-9, 1e6,
        )
        cost = jnp.where(accept, new_cost, cost)
        return graph, lam, cost

    _, _, cost0 = assemble(
        graph.poses, graph.edge_i, graph.edge_j, graph.edge_T,
        graph.edge_info, graph.edge_mask,
    )
    graph, lam, cost = jax.lax.fori_loop(
        0, cfg.max_iterations, body, (graph, jnp.float32(cfg.lm_init_lambda), cost0)
    )
    return graph, {"initial_cost": cost0, "final_cost": cost, "lambda": lam}


def _sharded_optimize_cg(graph: pg.PoseGraph, cfg: PoseGraphConfig, mesh):
    """Edge-sharded LM with matrix-free block-Jacobi PCG (see caller doc)."""
    axis = mesh.axis_names[0]
    n = graph.poses.shape[0]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P(), P()),
    )
    def run(poses, node_mask, ei, ej, eT, einfo, emask):
        def local_blocks(poses):
            """Per-edge blocks + psum'd gradient/cost for the local slice
            (shared kernel: pose_graph.edge_blocks_from)."""
            H_ii, H_jj, H_ij, g, cost = pg.edge_blocks_from(
                poses, ei, ej, eT, einfo, emask
            )
            return H_ii, H_jj, H_ij, jax.lax.psum(g, axis), jax.lax.psum(cost, axis)

        def cost_at(poses):
            T_i = poses[ei]
            T_j = poses[ej]
            r = jax.vmap(pg.edge_residual)(T_i, T_j, eT)
            w = emask.astype(jnp.float32)[:, None] * einfo
            return jax.lax.psum(jnp.sum(w * r * r), axis)

        def hv(H_ii, H_jj, H_ij, damp, p):
            out = jnp.zeros_like(p)
            pi, pj = p[ei], p[ej]
            out = out.at[ei].add(
                jnp.einsum("epq,eq->ep", H_ii, pi)
                + jnp.einsum("epq,eq->ep", H_ij, pj)
            )
            out = out.at[ej].add(
                jnp.einsum("eqp,eq->ep", H_ij, pi)
                + jnp.einsum("epq,eq->ep", H_jj, pj)
            )
            return jax.lax.psum(out, axis) + damp * p

        def lm_body(it, carry):
            poses, lam, cost = carry
            H_ii, H_jj, H_ij, g, _ = local_blocks(poses)
            # preconditioner: psum'd node-diagonal blocks + shared damping
            D = jax.lax.psum(pg.node_diag_blocks(H_ii, H_jj, ei, ej, n), axis)
            diag_H = jnp.diagonal(D, axis1=-2, axis2=-1)
            damp = pg.gauge_damping(node_mask, diag_H, lam)
            Minv = jnp.linalg.inv(D + jax.vmap(jnp.diag)(damp))
            apply_M = lambda r: jnp.einsum("npq,nq->np", Minv, r)

            x = jnp.zeros_like(g)
            r = -g
            z = apply_M(r)
            p = z
            rz = jnp.sum(r * z)
            eps = jnp.float32(1e-20)

            def cg_body(i, c):
                x, r, p, rz = c
                Hp = hv(H_ii, H_jj, H_ij, damp, p)
                denom = jnp.sum(p * Hp)
                live = jnp.sum(r * r) > 1e-12
                alpha = jnp.where(live & (denom > 0), rz / jnp.maximum(denom, eps), 0.0)
                x = x + alpha * p
                r_new = r - alpha * Hp
                z_new = apply_M(r_new)
                rz_new = jnp.sum(r_new * z_new)
                beta = jnp.where(live, rz_new / jnp.maximum(rz, eps), 0.0)
                return x, r_new, z_new + beta * p, rz_new

            dx, _, _, _ = jax.lax.fori_loop(0, cfg.pcg_iters, cg_body, (x, r, p, rz))
            dx = jnp.where(jnp.isfinite(dx), dx, 0.0)

            d = jnp.where(node_mask[:, None], dx, 0.0).at[0].set(0.0)
            cand = poses @ se3.se3_exp(d)
            new_cost = cost_at(cand)
            accept = new_cost < cost
            poses = jnp.where(accept, cand, poses)
            lam = jnp.clip(
                jnp.where(accept, lam / cfg.lm_lambda_factor, lam * cfg.lm_lambda_factor),
                1e-9, 1e6,
            )
            return poses, lam, jnp.where(accept, new_cost, cost)

        cost0 = cost_at(poses)
        poses, lam, cost = jax.lax.fori_loop(
            0, cfg.max_iterations, lm_body,
            (poses, jnp.float32(cfg.lm_init_lambda), cost0),
        )
        return poses, cost0, cost, lam

    poses, cost0, cost, lam = run(
        graph.poses, graph.node_mask, graph.edge_i, graph.edge_j,
        graph.edge_T, graph.edge_info, graph.edge_mask,
    )
    graph = dataclasses.replace(graph, poses=poses)
    return graph, {"initial_cost": cost0, "final_cost": cost, "lambda": lam}
