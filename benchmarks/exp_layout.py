"""One-off experiment: AoS [N, 3] vs SoA [3, N] layout for the GN iteration.

The odometry iteration pipeline (warp -> residual -> Jacobian -> assemble)
runs elementwise over [B, N, 3] arrays whose minor dimension is 3; if XLA
maps that axis to TPU lanes it pads 3 -> 128 (42.7x waste — the same trap as
the windowed gather, ops/neighbors._window_min docstring).  The races dodge
it by being matmuls.  This measures a representative per-iteration slice in
both layouts to decide whether the solver's hot loop should be transposed.

(i)  AoS: warp points [B, N, 3] by per-point angles, point-to-line residual
     against fixed A/B, closed-form Jacobian rows, masked JtJ/Jtb assemble.
(ii) SoA: identical math with coordinates as [B, 3, N] (N on lanes).

Usage: python benchmarks/exp_layout.py [batch] [n_points] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import cooper_mapper_tpu  # noqa: F401


def timeit(fn, arg_fn, reps=4):
    jax.block_until_ready(fn(*arg_fn(0)))
    dts = []
    for k in range(reps):
        a = arg_fn(k + 1)
        t0 = time.perf_counter()
        jax.device_get(fn(*a))
        dts.append(time.perf_counter() - t0)
    return min(dts)


def main():
    B = int(os.environ.get("BENCH_BATCH", sys.argv[1] if len(sys.argv) > 1 else 512))
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 2560
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    rng = np.random.RandomState(0)

    pts = jnp.asarray(rng.uniform(-10, 10, (B, N, 3)), jnp.float32)
    A = jnp.asarray(rng.uniform(-10, 10, (B, N, 3)), jnp.float32)
    Bp = jnp.asarray(rng.uniform(-10, 10, (B, N, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(0, 1, (B, N)), jnp.float32)
    ok = jnp.asarray(rng.rand(B, N) > 0.3)

    def one_iter_aos(x, pts, A, Bp, s, ok):
        # warp: per-point scaled yaw-only rotation + translation (stand-in
        # with the same op mix as twist.warp_to_start: sin/cos, muls, adds)
        a = s * x[:, None, 2:3][..., 0]
        ca, sa = jnp.cos(a), jnp.sin(a)
        px = ca * pts[..., 0] - sa * pts[..., 2] + s * x[:, None, 3]
        py = pts[..., 1] + s * x[:, None, 4]
        pz = sa * pts[..., 0] + ca * pts[..., 2] + s * x[:, None, 5]
        p = jnp.stack([px, py, pz], -1)                     # [B, N, 3]
        # point-to-line residual
        d1 = p - A
        d2 = p - Bp
        n = jnp.cross(d1, d2)
        l = Bp - A
        denom = jnp.maximum(jnp.linalg.norm(l, axis=-1), 1e-6)
        res = jnp.linalg.norm(n, axis=-1) / denom           # [B, N]
        coeff = jnp.cross(l, n) / (
            denom * jnp.maximum(jnp.linalg.norm(n, axis=-1), 1e-6)
        )[..., None]                                        # [B, N, 3]
        # jacobian rows (s-scaled rotation block stand-in) + assemble
        J = jnp.concatenate([s[..., None] * coeff, coeff], -1)  # [B, N, 6]
        w = ok.astype(jnp.float32)
        JtJ = jnp.einsum("bnp,bnq->bpq", J * w[..., None], J)
        Jtb = jnp.einsum("bnp,bn->bp", J * w[..., None], -res)
        dx = jnp.linalg.solve(JtJ + 1e-3 * jnp.eye(6), Jtb[..., None])[..., 0]
        return x + 0.001 * dx

    def one_iter_soa(x, ptsT, AT, BpT, s, ok):
        a = s * x[:, 2:3]                                   # [B, N]
        ca, sa = jnp.cos(a), jnp.sin(a)
        px = ca * ptsT[:, 0] - sa * ptsT[:, 2] + s * x[:, 3:4]
        py = ptsT[:, 1] + s * x[:, 4:5]
        pz = sa * ptsT[:, 0] + ca * ptsT[:, 2] + s * x[:, 5:6]
        d1x, d1y, d1z = px - AT[:, 0], py - AT[:, 1], pz - AT[:, 2]
        d2x, d2y, d2z = px - BpT[:, 0], py - BpT[:, 1], pz - BpT[:, 2]
        nx = d1y * d2z - d1z * d2y
        ny = d1z * d2x - d1x * d2z
        nz = d1x * d2y - d1y * d2x
        lx, ly, lz = (BpT[:, 0] - AT[:, 0], BpT[:, 1] - AT[:, 1],
                      BpT[:, 2] - AT[:, 2])
        denom = jnp.maximum(jnp.sqrt(lx * lx + ly * ly + lz * lz), 1e-6)
        nn = jnp.maximum(jnp.sqrt(nx * nx + ny * ny + nz * nz), 1e-6)
        res = nn / denom
        cx = (ly * nz - lz * ny) / (denom * nn)
        cy = (lz * nx - lx * nz) / (denom * nn)
        cz = (lx * ny - ly * nx) / (denom * nn)
        w = ok.astype(jnp.float32)
        # J rows: [s*c | c]; JtJ via stacked [B, 6, N] @ [B, N, 6] matmul
        Jrows = jnp.stack([s * cx, s * cy, s * cz, cx, cy, cz], 1)  # [B, 6, N]
        JtJ = jnp.einsum("bpn,bqn->bpq", Jrows * w[:, None, :], Jrows)
        Jtb = jnp.einsum("bpn,bn->bp", Jrows * w[:, None, :], -res)
        dx = jnp.linalg.solve(JtJ + 1e-3 * jnp.eye(6), Jtb[..., None])[..., 0]
        return x + 0.001 * dx

    def loop(step, *args):
        def body(i, x):
            return step(x, *args)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((B, 6), jnp.float32))

    aos = jax.jit(lambda p, A, Bp, s, ok: loop(one_iter_aos, p, A, Bp, s, ok))
    ptsT = jnp.swapaxes(pts, 1, 2)
    AT = jnp.swapaxes(A, 1, 2)
    BpT = jnp.swapaxes(Bp, 1, 2)
    soa = jax.jit(lambda p, A, Bp, s, ok: loop(one_iter_soa, p, A, Bp, s, ok))

    jitter = lambda k: s + 1e-6 * k
    dt_a = timeit(lambda sv: aos(pts, A, Bp, sv, ok), lambda k: (jitter(k),))
    print(f"AoS [B,N,3]: {dt_a*1e3:8.2f} ms / {iters} iters "
          f"({dt_a/iters*1e3:.3f} ms/iter)", flush=True)
    dt_s = timeit(lambda sv: soa(ptsT, AT, BpT, sv, ok), lambda k: (jitter(k),))
    print(f"SoA [B,3,N]: {dt_s*1e3:8.2f} ms / {iters} iters "
          f"({dt_s/iters*1e3:.3f} ms/iter)  speedup {dt_a/dt_s:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
