"""Fused per-ring nearest-neighbor minima.

The LOAM correspondence searches (LaserOdometry.cpp:355-497) need, for every
query point, the two nearest reference points *per scan ring* — A is the
global nearest, B the runner-up on A's ring, C the nearest on an adjacent
ring.  The dense formulation (ops/neighbors.py) materializes the full [Q, M]
distance matrix in HBM and runs several masked argmin passes over it; this
kernel instead streams reference tiles through VMEM and maintains running
(min1, idx1, min2, idx2) per (query, ring) — the [Q, M] matrix never exists.

Two implementations with identical semantics:
 * ``ring_minima_xla``   — pure-XLA oracle (CPU tests, fallback)
 * ``ring_minima_pallas``— the TPU Pallas kernel

Returns (min1, idx1, min2, idx2): each [Q, R] (squared distances; BIG where
a ring has no points).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = 1.0e12


def ring_minima_xla(q_xyz, ref_xyz, ref_ring, ref_mask, n_rings: int):
    """Fallback implementation via segment minima over the reference axis.

    One [M, Q] distance tile + a handful of segment passes (independent of
    the ring count).  Ties break toward the smallest reference index, same
    as argmin.
    """
    M = ref_xyz.shape[0]
    # distances with reference on the leading (segment) axis
    dT = (
        jnp.sum(ref_xyz * ref_xyz, -1)[:, None]
        - 2.0 * ref_xyz @ q_xyz.T
        + jnp.sum(q_xyz * q_xyz, -1)[None, :]
    )
    dT = jnp.where(ref_mask[:, None], dT, BIG)
    ring = jnp.where(ref_mask, ref_ring, n_rings).astype(jnp.int32)
    idx_col = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[:, None], dT.shape)
    BIG_I = jnp.int32(2**30)

    min1 = jax.ops.segment_min(dT, ring, num_segments=n_rings + 1)   # [R+1, Q]
    hit1 = dT == min1[ring]
    idx1 = jax.ops.segment_min(
        jnp.where(hit1, idx_col, BIG_I), ring, num_segments=n_rings + 1
    )
    d2 = jnp.where(idx_col == idx1[ring], BIG, dT)
    min2 = jax.ops.segment_min(d2, ring, num_segments=n_rings + 1)
    hit2 = d2 == min2[ring]
    idx2 = jax.ops.segment_min(
        jnp.where(hit2, idx_col, BIG_I), ring, num_segments=n_rings + 1
    )
    fix = lambda i: jnp.where(i >= BIG_I, 0, i)
    t = lambda a: jnp.swapaxes(a[:n_rings], 0, 1)
    return t(min1), t(fix(idx1)), t(min2), t(fix(idx2))


def _ring_minima_kernel(q_ref, r_ref, ring_ref, o_min1, o_idx1, o_min2, o_idx2,
                        *, n_rings: int, tile_m: int, total_m: int):
    from jax.experimental import pallas as pl

    q = q_ref[:, :]                                   # [TQ, 3]
    tq = q.shape[0]

    n_tiles = total_m // tile_m
    ring_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n_rings, 1), 1)

    def tile_body(t, carry):
        min1, idx1, min2, idx2 = carry               # [TQ, R] each
        off = t * tile_m
        r = r_ref[pl.ds(off, tile_m), :]             # [TM, 3]
        ring = ring_ref[pl.ds(off, tile_m), 0]       # [TM]

        # squared distances [TQ, TM] on the VPU/MXU
        d = (
            jnp.sum(q * q, -1)[:, None]
            - 2.0 * jax.lax.dot_general(
                q, r, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jnp.sum(r * r, -1)[None, :]
        )

        # one [TQ, R, TM] masked view; reductions over the minor axis give
        # all per-ring minima at once (no per-ring temporaries)
        sel = ring[None, None, :] == ring_iota               # [1, R, TM]
        dmask = jnp.where(sel, d[:, None, :], BIG)           # [TQ, R, TM]
        a1t = jnp.argmin(dmask, axis=-1)                     # [TQ, R]
        m1t = jnp.min(dmask, axis=-1)
        cols3 = jax.lax.broadcasted_iota(jnp.int32, (tq, n_rings, tile_m), 2)
        d2 = jnp.where(cols3 == a1t[:, :, None], BIG, dmask)
        a2t = jnp.argmin(d2, axis=-1)
        m2t = jnp.min(d2, axis=-1)
        g1t = off + a1t
        g2t = off + a2t

        new1 = jnp.minimum(min1, m1t)
        new1_idx = jnp.where(m1t < min1, g1t, idx1)
        # runner-up: best of {loser of the min1 race, both min2 candidates}
        loser = jnp.where(m1t < min1, min1, m1t)
        loser_idx = jnp.where(m1t < min1, idx1, g1t)
        cand2 = jnp.minimum(min2, m2t)
        cand2_idx = jnp.where(m2t < min2, g2t, idx2)
        new2 = jnp.minimum(loser, cand2)
        new2_idx = jnp.where(loser < cand2, loser_idx, cand2_idx)
        return new1, new1_idx, new2, new2_idx

    init = (
        jnp.full((tq, n_rings), BIG, jnp.float32),
        jnp.zeros((tq, n_rings), jnp.int32),
        jnp.full((tq, n_rings), BIG, jnp.float32),
        jnp.zeros((tq, n_rings), jnp.int32),
    )
    min1, idx1, min2, idx2 = jax.lax.fori_loop(0, n_tiles, tile_body, init)
    o_min1[:, :] = min1
    o_idx1[:, :] = idx1
    o_min2[:, :] = min2
    o_idx2[:, :] = idx2


def _pick_tile(n: int, candidates=(512, 256, 128)) -> int:
    for c in candidates:
        if n % c == 0:
            return c
    return 0


@functools.partial(jax.jit, static_argnames=("n_rings", "tile_q", "tile_m"))
def ring_minima_pallas(q_xyz, ref_xyz, ref_ring, ref_mask, n_rings: int,
                       tile_q: int = 128, tile_m: int = 512):
    """TPU kernel version.  Q and M must be multiples of the tile sizes
    (clouds are capacity-padded, so this holds by construction)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q = q_xyz.shape[0]
    M = ref_xyz.shape[0]
    assert Q % tile_q == 0 and M % tile_m == 0, (Q, M)

    ref_ring = jnp.where(ref_mask, ref_ring, n_rings + 1).astype(jnp.int32)

    grid = (Q // tile_q,)
    out_shape = [
        jax.ShapeDtypeStruct((Q, n_rings), jnp.float32),
        jax.ShapeDtypeStruct((Q, n_rings), jnp.int32),
        jax.ShapeDtypeStruct((Q, n_rings), jnp.float32),
        jax.ShapeDtypeStruct((Q, n_rings), jnp.int32),
    ]
    kernel = functools.partial(
        _ring_minima_kernel, n_rings=n_rings, tile_m=tile_m, total_m=M
    )
    qspec = pl.BlockSpec((tile_q, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((M, 3), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ringspec = pl.BlockSpec((M, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((tile_q, n_rings), lambda i: (i, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qspec, rspec, ringspec],
        out_specs=[ospec, ospec, ospec, ospec],
        out_shape=out_shape,
    )(q_xyz, ref_xyz, ref_ring[:, None])


def ring_minima(q_xyz, ref_xyz, ref_ring, ref_mask, n_rings: int):
    """Backend dispatch.

    The Pallas kernel is opt-in (COOPER_USE_PALLAS=1) until its Mosaic
    compile time is resolved on the axon remote-compile path — the XLA
    formulation is the default on every backend.
    """
    import os

    if jax.default_backend() == "tpu" and os.environ.get("COOPER_USE_PALLAS") == "1":
        tq = _pick_tile(q_xyz.shape[0], (128,))
        tm = _pick_tile(ref_xyz.shape[0])
        if tq and tm:
            return ring_minima_pallas(
                q_xyz, ref_xyz, ref_ring, ref_mask, n_rings,
                tile_q=tq, tile_m=tm,
            )
    return ring_minima_xla(q_xyz, ref_xyz, ref_ring, ref_mask, n_rings)
