"""Batched 6-DoF Gauss-Newton machinery.

The shared skeleton of both LOAM solves (LaserOdometry.cpp:505-644,
ScanMatch.cpp:147-260): masked normal-equation assembly, the 6x6 solve, the
iteration-0 eigenvalue degeneracy guard, NaN scrubbing, and the
deltaR/deltaT convergence test.  Everything is batched over leading dims and
differentiable.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def assemble_normal_eqs(J, b, w_valid):
    """J: [..., N, 6], b: [..., N], w_valid: [..., N] bool or float.

    Invalid rows are hard-zeroed with jnp.where (not multiplied) — masked-out
    rows may hold NaN/Inf from sentinel geometry, and 0 * NaN = NaN would
    otherwise poison the whole system.

    Returns (JtJ [..., 6, 6], Jtb [..., 6], n_valid [...]).
    """
    valid = (w_valid if w_valid.dtype == bool else w_valid > 0)
    Jm = jnp.where(valid[..., None], J, 0.0)
    bm = jnp.where(valid, b, 0.0)
    JtJ = jnp.einsum("...ni,...nj->...ij", Jm, Jm)
    Jtb = jnp.einsum("...ni,...n->...i", Jm, bm)
    return JtJ, Jtb, jnp.sum(valid.astype(J.dtype), axis=-1)


def solve_6x6(JtJ, Jtb, damping=0.0, spd: bool = True):
    """Solve (JtJ + damping*diag) dx = Jtb.  [..., 6, 6] x [..., 6].

    ``spd=True`` (native mode): JtJ is symmetric PSD by construction, so the
    solve is Cholesky + two triangular solves — TPU LU serializes on partial
    pivoting (the pose-graph inner solve measured it 62x slower,
    BENCH.md config 3) and the 25 per-iteration 6x6 solves were 9% of the
    headline solve's device time as LU custom calls.  The Tikhonov floor is
    RELATIVE (1e-7 x mean diagonal) so a rank-deficient system stays
    positive definite in f32: the update along a null direction comes out
    huge-but-finite, exactly like LU's pivoted garbage, and the degeneracy
    projector then removes it (same observable behavior).

    ``spd=False`` (parity mode): the reference solves with
    ColPivHouseholderQR (LaserOdometry.cpp:577-581); LU keeps the golden
    iteration dynamics bit-stable against the float64 numpy oracle.
    """
    A = JtJ
    if damping:
        A = A + damping * jnp.eye(6, dtype=JtJ.dtype)
    if not spd:
        # tiny absolute floor keeps the solve finite when rows are all-masked
        A = A + 1e-12 * jnp.eye(6, dtype=JtJ.dtype)
        return jnp.linalg.solve(A, Jtb[..., None])[..., 0]
    tr = jnp.trace(A, axis1=-2, axis2=-1)[..., None, None]
    A = A + (1e-7 / 6.0 * tr + 1e-12) * jnp.eye(6, dtype=JtJ.dtype)
    return _cholesky6_solve(A, Jtb)


def _cholesky6_solve(A, b):
    """Unrolled batched 6x6 Cholesky solve — elementwise [...] ops only.

    ``lax.linalg.cholesky``/``triangular_solve`` are custom calls whose
    per-dispatch and [.., 6, 6]-layout overhead dwarfs the ~100 FLOPs of
    arithmetic at this size; the unrolled scalar-plane form fuses straight
    into the surrounding GN-iteration kernel.  Non-PSD input (impossible
    after the relative Tikhonov floor except via Inf/NaN rows) yields NaN
    from sqrt, exactly like the custom call, and nan_guard scrubs it.
    """
    n = 6
    a = [[A[..., i, j] for j in range(n)] for i in range(n)]
    L = [[None] * n for _ in range(n)]
    inv = [None] * n
    for j in range(n):
        s = a[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(s)
        L[j][j] = d
        inv[j] = 1.0 / d
        for i in range(j + 1, n):
            s = a[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv[j]
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s * inv[i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s * inv[i]
    return jnp.stack(x, axis=-1)


def degeneracy_projector(JtJ, eig_threshold, reference_mode: bool = False):
    """Projector that removes unconstrained update directions.

    Reference behavior (LaserOdometry.cpp:583-608, ScanMatch.cpp:211-235):
    eigendecompose JtJ at iteration 0, zero directions with eigenvalue below
    the threshold, and project every subsequent update through matP.

    ``reference_mode=False`` (default) uses the spectrally correct projector
    P = V diag(lam >= thr) V^T — what the original LOAM (OpenCV row-major
    eigenvectors) computed.  ``reference_mode=True`` replicates the Eigen
    port's literal matV.inverse() @ matV_rows_zeroed, which zeroes *rows*
    of the column-eigenvector matrix (a port quirk kept for bit parity).

    Returns (P [..., 6, 6], is_degenerate [...]).
    """
    evals, V = jnp.linalg.eigh(JtJ)          # ascending
    keep = evals >= eig_threshold            # [..., 6]
    is_degenerate = jnp.any(~keep, axis=-1)
    if reference_mode:
        Vz = jnp.where(keep[..., :, None], V, 0.0)     # zero rows i with small lam_i
        P = jnp.swapaxes(V, -1, -2) @ Vz               # V^-1 @ Vz (V orthogonal)
    else:
        P = jnp.einsum("...ik,...k,...jk->...ij", V, keep.astype(JtJ.dtype), V)
    return P, is_degenerate


def nan_guard(x):
    """Reset non-finite components to 0 (LaserOdometry.cpp:622-634)."""
    return jnp.where(jnp.isfinite(x), x, 0.0)


def convergence_deltas(dx):
    """(deltaR [deg], deltaT [cm]) from an update 6-vec (rx,ry,rz,tx,ty,tz).

    Matches LaserOdometry.cpp:636-640.
    """
    r = dx[..., :3]
    t = dx[..., 3:]
    delta_r = jnp.rad2deg(jnp.linalg.norm(r, axis=-1))
    delta_t = 100.0 * jnp.linalg.norm(t, axis=-1)
    return delta_r, delta_t


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GNState:
    """Carry for the iterative solve (batched)."""

    x: jax.Array            # [..., 6] current transform estimate
    P: jax.Array            # [..., 6, 6] degeneracy projector
    is_degenerate: jax.Array  # [...] bool
    converged: jax.Array    # [...] bool — freeze further updates
    n_matched: jax.Array    # [...] number of residuals in the last build
    iter_used: jax.Array    # [...] iterations actually applied


def gn_init(x0):
    batch = x0.shape[:-1]
    return GNState(
        x=x0,
        P=jnp.broadcast_to(jnp.eye(6, dtype=x0.dtype), batch + (6, 6)),
        is_degenerate=jnp.zeros(batch, bool),
        converged=jnp.zeros(batch, bool),
        n_matched=jnp.zeros(batch, x0.dtype),
        iter_used=jnp.zeros(batch, jnp.int32),
    )


def gn_step(
    state: GNState,
    JtJ,
    Jtb,
    n_valid,
    iteration,
    eig_threshold,
    delta_r_abort,
    delta_t_abort,
    min_matched,
    reference_mode=False,
    trust_region_t=0.0,
    trust_region_r=0.0,
    min_converge_iter=0,
    compute_projector: bool = False,
    lm_damping: float = 0.0,
):
    """One masked GN update with the reference's guards.

    The solve is evaluated unconditionally (SPMD); ``converged`` and
    too-few-matches lanes keep their state (the reference `continue`s at
    pointSelNum < 10, LaserOdometry.cpp:501, and breaks on convergence).

    ``trust_region_t/r`` clamp the per-step translation/rotation magnitude.
    Full GN steps with exact Jacobians can jump meters off a single bad
    correspondence set and then pass the convergence test before the next
    refresh repairs the set; the reference is protected only by its 0.05
    residual under-relaxation.  ``min_converge_iter`` additionally forbids
    declaring convergence before at least one correspondence refresh.

    ``compute_projector`` must be a *python* bool: callers peel iteration 0
    (the only one that eigendecomposes JtJ) out of their device loops — a
    traced ``lax.cond`` would evaluate the batched eigh on every iteration
    under vmap.
    """
    if compute_projector:
        P, is_degenerate = degeneracy_projector(JtJ, eig_threshold, reference_mode)
    else:
        P, is_degenerate = state.P, state.is_degenerate

    if lm_damping > 0.0:
        # Marquardt-scaled damping (ScanMatchConfig.lm_damping): contracts
        # the correspondence-flip limit cycle of the re-matched GN solve.
        # The projector stays computed from the UNDAMPED iteration-0 JtJ.
        diag = jnp.diagonal(JtJ, axis1=-2, axis2=-1)
        JtJ = JtJ + lm_damping * (
            diag[..., None] * jnp.eye(6, dtype=JtJ.dtype)
        )

    if reference_mode:
        # literal reference dynamics: full-system solve, then matP projection
        # (LaserOdometry.cpp:609-613)
        dx = solve_6x6(JtJ, Jtb, spd=False)
        dx = jnp.where(
            is_degenerate[..., None], (P @ dx[..., None])[..., 0], dx
        )
    else:
        # Degenerate lanes solve the PROJECTED system P JtJ P + (I - P)
        # with rhs P Jtb: null directions get dx ~ 0 by construction.
        # Projecting a full-system solve instead (the reference's scheme)
        # leaves f32 leakage ~ |dx_null| * eps — with the near-singular
        # solve producing |dx_null| ~ 1e5, that is ~0.01 of noise at the
        # 0.05-deg/0.1-cm convergence thresholds, enough to keep a
        # degenerate loop-closure fine-match from ever converging
        # (tests/test_graph_pipeline.py exercises exactly this).
        eye = jnp.eye(6, dtype=JtJ.dtype)
        deg_m = is_degenerate[..., None, None]
        A_eff = jnp.where(deg_m, P @ JtJ @ P + (eye - P), JtJ)
        b_eff = jnp.where(
            is_degenerate[..., None], (P @ Jtb[..., None])[..., 0], Jtb
        )
        dx = solve_6x6(A_eff, b_eff, spd=True)

    if trust_region_t > 0.0:
        tn = jnp.linalg.norm(dx[..., 3:], axis=-1, keepdims=True)
        dx = dx.at[..., 3:].multiply(jnp.minimum(1.0, trust_region_t / jnp.maximum(tn, 1e-12)))
    if trust_region_r > 0.0:
        rn = jnp.linalg.norm(dx[..., :3], axis=-1, keepdims=True)
        dx = dx.at[..., :3].multiply(jnp.minimum(1.0, trust_region_r / jnp.maximum(rn, 1e-12)))
    dx = nan_guard(dx)

    enough = n_valid >= min_matched
    active = (~state.converged) & enough
    x_new = nan_guard(state.x + jnp.where(active[..., None], dx, 0.0))

    delta_r, delta_t = convergence_deltas(dx)
    just_converged = (
        active
        & (delta_r < delta_r_abort)
        & (delta_t < delta_t_abort)
        & (iteration >= min_converge_iter)
    )

    return GNState(
        x=x_new,
        P=P,
        is_degenerate=is_degenerate,
        converged=state.converged | just_converged,
        n_matched=n_valid,
        iter_used=state.iter_used + active.astype(jnp.int32),
    )
