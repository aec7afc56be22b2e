"""CPU reference point for the pose-graph LM (VERDICT r3 task 5).

Same drifted loop-closure graphs as bench_pose_graph.py, solved with a
straightforward scipy sparse-LU Levenberg-Marquardt in float64 — an honest
stand-in for g2o's CSparse lm_var backend (solver_g2o.cpp:79-95) running on
the host CPU.  Jacobians are the same closed-form-free numerics (numeric
se3 log via scipy Rotation), assembled in COO once per iteration.

Usage: python benchmarks/bench_pose_graph_cpu.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla
from scipy.spatial.transform import Rotation


def se3_log(T):
    w = Rotation.from_matrix(T[:3, :3]).as_rotvec()
    th2 = w @ w
    th = np.sqrt(th2)
    W = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if th < 1e-6:
        Vinv = np.eye(3) - 0.5 * W
    else:
        A = np.sin(th) / th
        B = (1 - np.cos(th)) / th2
        Vinv = np.eye(3) - 0.5 * W + (1 - A / (2 * B)) / th2 * (W @ W)
    return np.concatenate([Vinv @ T[:3, 3], w])


def se3_exp(xi):
    v, w = xi[:3], xi[3:]
    R = Rotation.from_rotvec(w).as_matrix()
    th2 = w @ w
    th = np.sqrt(th2)
    W = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if th < 1e-6:
        V = np.eye(3) + 0.5 * W
    else:
        V = (np.eye(3) + (1 - np.cos(th)) / th2 * W
             + (th - np.sin(th)) / (th2 * th) * (W @ W))
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = V @ v
    return T


def edge_residual_jac(T_i, T_j, T_meas):
    """Numeric 6x12 Jacobian by central differences (matches g2o's numeric
    fallback quality; analytic would only make the CPU point faster)."""
    M_inv = np.linalg.inv(T_meas)

    def r_fn(di, dj):
        return se3_log(M_inv @ np.linalg.inv(T_i @ se3_exp(di)) @ (T_j @ se3_exp(dj)))

    r0 = r_fn(np.zeros(6), np.zeros(6))
    eps = 1e-6
    J = np.zeros((6, 12))
    for k in range(6):
        d = np.zeros(6)
        d[k] = eps
        J[:, k] = (r_fn(d, np.zeros(6)) - r_fn(-d, np.zeros(6))) / (2 * eps)
        J[:, 6 + k] = (r_fn(np.zeros(6), d) - r_fn(np.zeros(6), -d)) / (2 * eps)
    return r0, J[:, :6], J[:, 6:]


def optimize(poses, ei, ej, eT, einfo, iters=20, lam0=1e-4):
    n = len(poses)
    poses = [p.copy() for p in poses]
    lam = lam0

    def cost_of(ps):
        c = 0.0
        for k in range(len(ei)):
            r = se3_log(np.linalg.inv(eT[k]) @ np.linalg.inv(ps[ei[k]]) @ ps[ej[k]])
            c += float(r @ (einfo[k] * r))
        return c

    cost = cost_of(poses)
    t_solve = 0.0
    for _ in range(iters):
        rows, cols, vals = [], [], []
        g = np.zeros(6 * n)
        for k in range(len(ei)):
            i, j = ei[k], ej[k]
            r, Ji, Jj = edge_residual_jac(poses[i], poses[j], eT[k])
            W = np.diag(einfo[k])
            for (a, Ja) in ((i, Ji), (j, Jj)):
                g[6 * a:6 * a + 6] += Ja.T @ W @ r
                for (b, Jb) in ((i, Ji), (j, Jj)):
                    blk = Ja.T @ W @ Jb
                    for p in range(6):
                        for q in range(6):
                            rows.append(6 * a + p)
                            cols.append(6 * b + q)
                            vals.append(blk[p, q])
        H = sp.coo_matrix((vals, (rows, cols)), shape=(6 * n, 6 * n)).tocsc()
        damp = sp.diags(lam * (H.diagonal() + 1.0))
        gauge = sp.diags(np.concatenate([np.full(6, 1e6), np.zeros(6 * n - 6)]))
        t0 = time.perf_counter()
        dx = spla.splu(H + damp + gauge).solve(-g)
        t_solve += time.perf_counter() - t0
        cand = [poses[a] @ se3_exp(dx[6 * a:6 * a + 6]) for a in range(n)]
        cand[0] = poses[0]
        new_cost = cost_of(cand)
        if new_cost < cost:
            poses, cost, lam = cand, new_cost, lam / 2
        else:
            lam *= 2
    return poses, cost, t_solve


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    from bench_pose_graph import build_graph  # reuse the exact graph
    import jax.numpy as jnp  # noqa: F401  (build_graph returns jnp arrays)

    g = build_graph(n)
    e = int(np.asarray(g.edge_mask).sum())
    poses = [np.asarray(p, np.float64) for p in np.asarray(g.poses)[:n]]
    ei = np.asarray(g.edge_i)[:e]
    ej = np.asarray(g.edge_j)[:e]
    eT = np.asarray(g.edge_T, np.float64)[:e]
    einfo = np.asarray(g.edge_info, np.float64)[:e]

    iters = 20
    t0 = time.perf_counter()
    _, cost, t_solve = optimize(poses, ei, ej, eT, einfo, iters=iters)
    dt = time.perf_counter() - t0
    print({
        "nodes": n, "edges": e, "solver": "scipy-spLU-f64 (CPU)",
        "lm_iters_per_s": round(iters / dt, 2),
        "linear_solve_ms_per_iter": round(t_solve / iters * 1e3, 2),
        "final_cost": round(cost, 6),
        "wall_per_optimize_ms": round(dt * 1e3, 1),
    })


if __name__ == "__main__":
    main()
