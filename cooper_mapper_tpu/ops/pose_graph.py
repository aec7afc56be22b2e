"""SE(3) pose-graph optimization — batched Levenberg-Marquardt on device.

TPU-native replacement for the g2o backend
(/root/reference/L_SLAM/src/pose_graph/solver_g2o.{h,cpp}: ``lm_var``
Levenberg-Marquardt over SE3 nodes/edges with CSparse).  Design per
SURVEY.md §7.1: per-edge residual/Jacobian kernels (autodiff on the se(3)
manifold), 6x6 block Hessian assembled by scatter-add into a dense [6N, 6N]
system, batched Cholesky solve, diagonal LM damping with accept/reject.

The first node is gauge-fixed (add_se3_node fixes node 0,
solver_g2o.cpp:51-63).  Masks make node/edge counts dynamic under a static
capacity.  For multi-host scaling the per-edge Hessian contributions are the
natural psum unit (see parallel/).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import PoseGraphConfig
from ..utils import se3


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PoseGraph:
    """Fixed-capacity pose graph.

    poses:    [N, 4, 4] node estimates
    node_mask:[N]
    edge_i/j: [E] int32 node indices
    edge_T:   [E, 4, 4] relative measurements (i -> j)
    edge_info:[E, 6] diagonal information (translation 3, rotation 3)
    edge_mask:[E]
    """

    poses: jax.Array
    node_mask: jax.Array
    edge_i: jax.Array
    edge_j: jax.Array
    edge_T: jax.Array
    edge_info: jax.Array
    edge_mask: jax.Array


def create(max_nodes: int, max_edges: int) -> PoseGraph:
    return PoseGraph(
        poses=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (max_nodes, 4, 4)),
        node_mask=jnp.zeros(max_nodes, bool),
        edge_i=jnp.zeros(max_edges, jnp.int32),
        edge_j=jnp.zeros(max_edges, jnp.int32),
        edge_T=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (max_edges, 4, 4)),
        edge_info=jnp.ones((max_edges, 6), jnp.float32),
        edge_mask=jnp.zeros(max_edges, bool),
    )


def edge_residual(T_i, T_j, T_meas):
    """r = log( T_meas^-1 (T_i^-1 T_j) )  [..., 6] (v, w)."""
    return se3.se3_log(se3.inverse(T_meas) @ se3.inverse(T_i) @ T_j)


def _edge_residual_jac(T_i, T_j, T_meas):
    """Residual + Jacobians wrt right-perturbations of nodes i and j.

    r(d_i, d_j) = log(T_meas^-1 (T_i exp(d_i))^-1 (T_j exp(d_j)))
    Returns (r [6], J_i [6, 6], J_j [6, 6]).
    """

    def r_fn(d):
        di, dj = d[:6], d[6:]
        return edge_residual(T_i @ se3.se3_exp(di), T_j @ se3.se3_exp(dj), T_meas)

    r = r_fn(jnp.zeros(12))
    J = jax.jacfwd(r_fn)(jnp.zeros(12))  # [6, 12]
    return r, J[:, :6], J[:, 6:]


def edge_blocks_from(poses, edge_i, edge_j, edge_T, edge_info, edge_mask):
    """THE per-edge block assembly — every solver path builds on this one.

    Returns (H_ii, H_jj, H_ij [E,6,6], g [N,6], cost) for the edge slice
    given.  The dense [6N,6N] Hessian is never formed here: dense paths
    scatter the blocks via ``dense_from_blocks``; matrix-free paths apply
    their action via ``_hvp``.  The info-weighted einsum build and masking
    must stay bit-identical across the dense/CG/sharded paths for the
    CG==dense and sharded==unsharded equality tests to mean anything — which
    is why all four consumers (``_assemble``, ``_edge_blocks``,
    ``parallel.batch`` dense + CG) call this single kernel (ADVICE r3).
    """
    n = poses.shape[0]
    T_i = poses[edge_i]
    T_j = poses[edge_j]
    r, J_i, J_j = jax.vmap(_edge_residual_jac)(T_i, T_j, edge_T)
    w = edge_mask.astype(jnp.float32)[:, None] * edge_info  # [E, 6]
    r_w = jnp.where(edge_mask[:, None], r, 0.0)
    J_i = jnp.where(edge_mask[:, None, None], J_i, 0.0)
    J_j = jnp.where(edge_mask[:, None, None], J_j, 0.0)
    JiW = J_i * w[:, :, None]  # info-weighted rows: [E, 6(res), 6(param)]
    JjW = J_j * w[:, :, None]
    H_ii = jnp.einsum("erp,erq->epq", JiW, J_i)
    H_jj = jnp.einsum("erp,erq->epq", JjW, J_j)
    H_ij = jnp.einsum("erp,erq->epq", JiW, J_j)
    g = jnp.zeros((n, 6), jnp.float32)
    g = g.at[edge_i].add(jnp.einsum("erp,er->ep", JiW, r_w))
    g = g.at[edge_j].add(jnp.einsum("erp,er->ep", JjW, r_w))
    cost = jnp.sum(w * r * r)
    return H_ii, H_jj, H_ij, g, cost


def dense_from_blocks(H_ii, H_jj, H_ij, edge_i, edge_j, n: int):
    """Scatter per-edge blocks into the dense [6N, 6N] Hessian (no damping)."""
    H = jnp.zeros((n, n, 6, 6), jnp.float32)
    H = H.at[edge_i, edge_i].add(H_ii)
    H = H.at[edge_j, edge_j].add(H_jj)
    H = H.at[edge_i, edge_j].add(H_ij)
    H = H.at[edge_j, edge_i].add(jnp.swapaxes(H_ij, -1, -2))
    return jnp.transpose(H, (0, 2, 1, 3)).reshape(6 * n, 6 * n)


def node_diag_blocks(H_ii, H_jj, edge_i, edge_j, n: int):
    """Node-diagonal 6x6 blocks D [N,6,6] (the block-Jacobi preconditioner
    base and the source of the LM damping diagonal)."""
    D = jnp.zeros((n, 6, 6), jnp.float32)
    D = D.at[edge_i].add(H_ii)
    D = D.at[edge_j].add(H_jj)
    return D


def gauge_damping(node_mask, diag_H, lam):
    """Gauge boost + LM damping diagonal [N, 6] — THE damping formula.

    Gauge fixing: a strong prior on node 0 (first node fixed,
    solver_g2o.cpp:51-63); inactive nodes get the same boost so the system
    stays non-singular.  ``diag_H`` is the [N, 6] diagonal of the undamped
    Hessian (identical whether read off the dense matrix or the node-diagonal
    blocks).  Shared bit-identically by the dense, CG, and both sharded
    solver paths.
    """
    n = node_mask.shape[0]
    boost = jnp.zeros(n).at[0].set(1e6)
    boost = jnp.where(node_mask, boost, 1e6)
    return boost[:, None] + lam * (diag_H + 1.0)


def _assemble(graph: PoseGraph, damping):
    """Build the damped normal equations H dx = -g over all active edges."""
    n = graph.poses.shape[0]
    H_ii, H_jj, H_ij, g2, _ = _edge_blocks(graph)
    H = dense_from_blocks(H_ii, H_jj, H_ij, graph.edge_i, graph.edge_j, n)
    g = g2.reshape(6 * n)
    damp = gauge_damping(graph.node_mask,
                         jnp.diagonal(H).reshape(n, 6), damping)
    H = H + jnp.diag(damp.reshape(6 * n))
    return H, g


def _edge_blocks(graph: PoseGraph):
    """Per-edge 6x6 Hessian blocks + gradient — the matrix-free system
    (see edge_blocks_from).  Memory O(E+N), not O(N^2): the TPU-native
    replacement for g2o's CSparse factorization (SURVEY.md §7.3
    "block-structured dense-within-block CG")."""
    return edge_blocks_from(graph.poses, graph.edge_i, graph.edge_j,
                            graph.edge_T, graph.edge_info, graph.edge_mask)


def _hvp(H_ii, H_jj, H_ij, edge_i, edge_j, damp_diag, v):
    """Damped Hessian-vector product via edge scatter: v, out [N, 6]."""
    vi = v[edge_i]
    vj = v[edge_j]
    out = jnp.zeros_like(v)
    out = out.at[edge_i].add(
        jnp.einsum("epq,eq->ep", H_ii, vi) + jnp.einsum("epq,eq->ep", H_ij, vj)
    )
    out = out.at[edge_j].add(
        jnp.einsum("eqp,eq->ep", H_ij, vi) + jnp.einsum("epq,eq->ep", H_jj, vj)
    )
    return out + damp_diag * v


def _damping_terms(graph: PoseGraph, H_ii, H_jj, lam):
    """Gauge boost + LM damping as a diagonal [N, 6], and the block-Jacobi
    preconditioner blocks [N, 6, 6] (node-diagonal blocks + damping)."""
    n = graph.poses.shape[0]
    D = node_diag_blocks(H_ii, H_jj, graph.edge_i, graph.edge_j, n)
    diag_H = jnp.diagonal(D, axis1=-2, axis2=-1)  # [N, 6]
    damp = gauge_damping(graph.node_mask, diag_H, lam)
    M = D + jax.vmap(jnp.diag)(damp)
    return damp, M


def _pcg_solve(H_ii, H_jj, H_ij, edge_i, edge_j, damp, M, g, iters: int):
    """Block-Jacobi preconditioned CG for H dx = -g (all masked-static)."""
    Minv = jnp.linalg.inv(M)                      # [N, 6, 6] batched
    apply_M = lambda r: jnp.einsum("npq,nq->np", Minv, r)
    hv = lambda p: _hvp(H_ii, H_jj, H_ij, edge_i, edge_j, damp, p)

    x = jnp.zeros_like(g)
    r = -g                                         # b = -g, x0 = 0
    z = apply_M(r)
    p = z
    rz = jnp.sum(r * z)
    eps = jnp.float32(1e-20)

    def body(it, carry):
        x, r, p, rz = carry
        Hp = hv(p)
        denom = jnp.sum(p * Hp)
        alpha = rz / jnp.maximum(denom, eps)
        # freeze once the residual is tiny (fixed-iteration masked early out)
        live = jnp.sum(r * r) > 1e-12
        alpha = jnp.where(live & (denom > 0), alpha, 0.0)
        x = x + alpha * p
        r_new = r - alpha * Hp
        z_new = apply_M(r_new)
        rz_new = jnp.sum(r_new * z_new)
        beta = jnp.where(live, rz_new / jnp.maximum(rz, eps), 0.0)
        p = z_new + beta * p
        return x, r_new, p, rz_new

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rz))
    return x


def _cost(graph: PoseGraph):
    T_i = graph.poses[graph.edge_i]
    T_j = graph.poses[graph.edge_j]
    r = jax.vmap(edge_residual)(T_i, T_j, graph.edge_T)
    w = graph.edge_mask.astype(jnp.float32)[:, None] * graph.edge_info
    return jnp.sum(w * r * r)


def _apply_update(graph: PoseGraph, dx):
    n = graph.poses.shape[0]
    d = dx.reshape(n, 6)
    d = jnp.where(graph.node_mask[:, None], d, 0.0)
    d = d.at[0].set(0.0)
    return dataclasses.replace(graph, poses=graph.poses @ se3.se3_exp(d))


@partial(jax.jit, static_argnames=("cfg",))
def optimize(graph: PoseGraph, cfg: PoseGraphConfig = PoseGraphConfig()):
    """LM loop with multiplicative damping adaptation (lm_var equivalent).

    Returns (graph', diagnostics dict).  Jitted whole (static cfg): the LM
    accept/reject loop is a device-side fori_loop, so one dispatch covers
    all max_iterations — eager dispatch through the axon relay costs ~1 s
    of round trips per LM iteration (measured 0.8 iters/s eager).
    """

    if cfg.solver not in ("cg", "dense"):
        # "pcg" silently selecting the dense path cost a round of wrong
        # benchmark numbers (battery r2: "pcg" n=1024 measured the [6N,6N]
        # dense solve at 7.3 iters/s) — fail loudly instead
        raise ValueError(f"unknown pose-graph solver {cfg.solver!r}")

    n = graph.poses.shape[0]

    def solve_dense(graph, lam):
        # H is SPD by construction (J^T W J + positive gauge/LM diagonal), so
        # factor with Cholesky: TPU LU-with-partial-pivoting serializes on row
        # selection and measures 62x slower at [1536, 1536]
        # (benchmarks/exp_dense_solve.py: 2617 ms vs 42 ms per solve on chip)
        H, g = _assemble(graph, lam)
        L = jnp.linalg.cholesky(H)
        y = jax.scipy.linalg.solve_triangular(L, -g, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

    def solve_cg(graph, lam):
        H_ii, H_jj, H_ij, g, _ = _edge_blocks(graph)
        damp, M = _damping_terms(graph, H_ii, H_jj, lam)
        dx = _pcg_solve(H_ii, H_jj, H_ij, graph.edge_i, graph.edge_j,
                        damp, M, g, cfg.pcg_iters)
        return dx.reshape(6 * n)

    inner_solve = solve_cg if cfg.solver == "cg" else solve_dense

    def body(it, carry):
        graph, lam, cost = carry
        dx = gn_nan_guard(inner_solve(graph, lam))
        cand = _apply_update(graph, dx)
        new_cost = _cost(cand)
        accept = new_cost < cost
        graph = jax.tree.map(
            lambda a, b: jnp.where(jnp.reshape(accept, (1,) * a.ndim), a, b),
            cand, graph,
        )
        lam = jnp.where(accept, lam / cfg.lm_lambda_factor, lam * cfg.lm_lambda_factor)
        lam = jnp.clip(lam, 1e-9, 1e6)
        cost = jnp.where(accept, new_cost, cost)
        return graph, lam, cost

    cost0 = _cost(graph)
    graph, lam, cost = jax.lax.fori_loop(
        0, cfg.max_iterations, body, (graph, jnp.float32(cfg.lm_init_lambda), cost0)
    )
    return graph, {"initial_cost": cost0, "final_cost": cost, "lambda": lam}


def gn_nan_guard(x):
    return jnp.where(jnp.isfinite(x), x, 0.0)


# ---------------------------------------------------------------------------
# host-side graph construction helpers (used by models/graph.py)
# ---------------------------------------------------------------------------


def from_arrays(poses, edge_i, edge_j, edge_T, edge_info,
                max_nodes: int | None = None,
                max_edges: int | None = None) -> PoseGraph:
    """Build a PoseGraph from dense host arrays in one shot.

    The incremental add_node/add_edge path costs one device round trip per
    element — fine inside a jitted ingest, pathological for bulk loads over
    a remote device (one .g2o of 1k nodes = 3k round trips).  Here the
    padding/masking happens in numpy and the device sees one transfer.
    """
    import numpy as np

    poses = np.asarray(poses, np.float32)
    edge_i = np.asarray(edge_i, np.int32)
    edge_j = np.asarray(edge_j, np.int32)
    edge_T = np.asarray(edge_T, np.float32)
    edge_info = np.asarray(edge_info, np.float32)
    n, e = poses.shape[0], edge_i.shape[0]
    N = max_nodes or n
    E = max_edges or e

    def pad(a, cap, fill):
        out = np.empty((cap,) + a.shape[1:], a.dtype)
        out[:a.shape[0]] = a
        out[a.shape[0]:] = fill
        return out

    eye = np.eye(4, dtype=np.float32)
    return PoseGraph(
        poses=jnp.asarray(pad(poses, N, eye)),
        node_mask=jnp.asarray(np.arange(N) < n),
        edge_i=jnp.asarray(pad(edge_i, E, 0)),
        edge_j=jnp.asarray(pad(edge_j, E, 0)),
        edge_T=jnp.asarray(pad(edge_T, E, eye)),
        edge_info=jnp.asarray(pad(edge_info, E, 1.0)),
        edge_mask=jnp.asarray(np.arange(E) < e),
    )


def add_node(graph: PoseGraph, idx: int, pose) -> PoseGraph:
    return dataclasses.replace(
        graph,
        poses=graph.poses.at[idx].set(pose),
        node_mask=graph.node_mask.at[idx].set(True),
    )


def add_edge(graph: PoseGraph, slot: int, i, j, T_rel, info_diag) -> PoseGraph:
    return dataclasses.replace(
        graph,
        edge_i=graph.edge_i.at[slot].set(i),
        edge_j=graph.edge_j.at[slot].set(j),
        edge_T=graph.edge_T.at[slot].set(T_rel),
        edge_info=graph.edge_info.at[slot].set(info_diag),
        edge_mask=graph.edge_mask.at[slot].set(True),
    )
