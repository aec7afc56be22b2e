"""Streaming k-NN: VMEM-resident top-k for the scan-to-map 5-NN searches.

The scan-to-map solve (ops/scan_match.py) finds 5 nearest reference points
per query EVERY iteration (the reference re-finds correspondences per
iteration, ScanMatch.cpp:97-132); with surround-map-sized reference clouds
(8-16k points) the dense formulation's [Q, M] distance tile plus XLA's
``top_k`` over it dominate the mapping solve.  This kernel streams reference
tiles through VMEM and maintains a running sorted top-k per query, so the
[Q, M] tile never reaches HBM — the same design as the odometry race kernels
(nn1.py), extended from k=1 to small static k.

Selection semantics match ``ops.neighbors.knn`` (jax.lax.top_k over the
masked distance tile): ascending distances, ties broken toward the smaller
reference index.  Extraction uses min + index-min-over-ties + masking —
all elementwise/reduction ops (Mosaic has no value-domain gather; see
CLAUDE.md).  Invalid reference points carry ``||r||^2 = BIG`` so they can
never enter the top-k against any real candidate under the 1 m^2 acceptance
gate (d[:, -1] < nn_sq_dist_max, scan_match.py:67-68).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = 1.0e12
BIG_I = 2**30  # plain int: a jnp scalar here would be captured as a constant


def _knn_kernel(q_ref, qn_ref, r_ref, rn_ref, o_min, o_idx,
                *, k: int, tile_m: int, total_m: int):
    from jax.experimental import pallas as pl

    q = q_ref[:, :]                       # [TQ, 3]
    qn = qn_ref[:, :]                     # [TQ, 1]
    tq = q.shape[0]
    n_tiles = total_m // tile_m

    def tile_body(t, carry):
        best, bidx = carry                # [TQ, k] f32 asc, [TQ, k] i32
        off = t * tile_m
        r = r_ref[pl.ds(off, tile_m), :]  # [TM, 3]
        rn = rn_ref[:, pl.ds(off, tile_m)]  # [1, TM], BIG where invalid
        d = (
            qn
            - 2.0 * jax.lax.dot_general(
                q, r, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + rn
        )                                  # [TQ, TM]
        cols = off + jax.lax.broadcasted_iota(jnp.int32, (tq, tile_m), 1)

        # k extraction rounds over [d | running top-k].  Each round pulls the
        # global minimum of the concatenation (smallest index among exact
        # ties), appends it to the new sorted prefix, and masks it out.
        new_best = []
        new_bidx = []
        for _ in range(k):
            m_t = jnp.min(d, axis=-1, keepdims=True)         # [TQ, 1]
            m_r = jnp.min(best, axis=-1, keepdims=True)       # running min
            i_t = jnp.min(
                jnp.where(d == m_t, cols, BIG_I), axis=-1, keepdims=True
            )
            i_r = jnp.min(
                jnp.where(best == m_r, bidx, BIG_I), axis=-1, keepdims=True
            )
            # winner: strictly smaller distance, or equal with smaller index
            take_t = (m_t < m_r) | ((m_t == m_r) & (i_t < i_r))
            m = jnp.where(take_t, m_t, m_r)
            i = jnp.where(take_t, i_t, i_r)
            new_best.append(m)
            new_bidx.append(i)
            # mask the winner out of its source
            hit_t = take_t & (d == m_t) & (cols == i_t)
            d = jnp.where(hit_t, BIG, d)
            hit_r = (~take_t) & (best == m_r) & (bidx == i_r)
            best = jnp.where(hit_r, BIG, best)
        return (
            jnp.concatenate(new_best, axis=-1),
            jnp.concatenate(new_bidx, axis=-1),
        )

    init = (
        jnp.full((tq, k), BIG, jnp.float32),
        jnp.zeros((tq, k), jnp.int32),
    )
    best, bidx = jax.lax.fori_loop(0, n_tiles, tile_body, init)
    o_min[:, :] = best
    o_idx[:, :] = bidx


def _knn_kernel_v2(q_ref, qn_ref, r_ref, rn_ref, o_min, o_idx,
                   *, k: int, tile_m: int, total_m: int):
    """Lexicographic-threshold extraction: same selection semantics as
    _knn_kernel, ~30% fewer VPU passes per tile.

    The baseline kernel extracts each of the k winners by masking it OUT of
    the distance tile (a full [TQ, TM] select + store per round).  Here the
    r-th smallest is found with a running lexicographic (d, col) threshold —
    (d, col) pairs are globally unique, so "strictly greater than the last
    extracted pair" selects exactly the next winner — turning each round
    into two fused select-reductions over the tile with NO tile-sized
    stores.  The per-tile sorted k-list then merges with the running top-k
    on [TQ, 2k] arrays (negligible next to the tile work).
    """
    q = q_ref[:, :]
    qn = qn_ref[:, :]
    tq = q.shape[0]
    n_tiles = total_m // tile_m

    def tile_body(t, carry):
        best, bidx = carry                # [TQ, k] sorted asc (lex)
        off = t * tile_m
        r = r_ref[pl.ds(off, tile_m), :]
        rn = rn_ref[:, pl.ds(off, tile_m)]
        d = (
            qn
            - 2.0 * jax.lax.dot_general(
                q, r, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + rn
        )
        cols = off + jax.lax.broadcasted_iota(jnp.int32, (tq, tile_m), 1)

        # per-tile top-k via running lex threshold (no tile stores)
        prev_m = jnp.full((tq, 1), -jnp.inf, jnp.float32)
        prev_i = jnp.full((tq, 1), -1, jnp.int32)
        tile_ms = []
        tile_is = []
        for _ in range(k):
            elig = (d > prev_m) | ((d == prev_m) & (cols > prev_i))
            dm = jnp.where(elig, d, BIG)
            m = jnp.min(dm, axis=-1, keepdims=True)
            i = jnp.min(jnp.where(dm == m, cols, BIG_I), axis=-1,
                        keepdims=True)
            tile_ms.append(m)
            tile_is.append(i)
            prev_m, prev_i = m, i
        cand_m = jnp.concatenate(tile_ms + [best], axis=-1)   # [TQ, 2k]
        cand_i = jnp.concatenate(tile_is + [bidx], axis=-1)

        # merge: k rounds of lex-min extraction on the [TQ, 2k] candidates
        prev_m = jnp.full((tq, 1), -jnp.inf, jnp.float32)
        prev_i = jnp.full((tq, 1), -1, jnp.int32)
        out_m = []
        out_i = []
        for _ in range(k):
            elig = (cand_m > prev_m) | ((cand_m == prev_m) & (cand_i > prev_i))
            dm = jnp.where(elig, cand_m, BIG)
            m = jnp.min(dm, axis=-1, keepdims=True)
            i = jnp.min(jnp.where(dm == m, cand_i, BIG_I), axis=-1,
                        keepdims=True)
            out_m.append(m)
            out_i.append(i)
            prev_m, prev_i = m, i
        return (
            jnp.concatenate(out_m, axis=-1),
            jnp.concatenate(out_i, axis=-1),
        )

    init = (
        jnp.full((tq, k), BIG, jnp.float32),
        # BIG sentinel entries must carry DISTINCT ascending indices so the
        # lex threshold can walk through them when fewer than k real
        # candidates exist; BIG_I - k + j keeps them past any real column
        jnp.broadcast_to(
            BIG_I - k + jax.lax.broadcasted_iota(jnp.int32, (tq, k), 1),
            (tq, k),
        ),
    )
    best, bidx = jax.lax.fori_loop(0, n_tiles, tile_body, init)
    o_min[:, :] = best
    # restore the baseline's index convention for never-filled slots (0)
    o_idx[:, :] = jnp.where(bidx >= BIG_I - k, 0, bidx)


from jax.experimental import pallas as pl  # noqa: E402  (kernel helpers)


@functools.partial(
    jax.jit, static_argnames=("k", "tile_q", "tile_m", "interpret")
)
def knn_pallas(q_xyz, r_xyz, r_mask, k: int = 5, tile_q: int = 256,
               tile_m: int = 512, interpret: bool = False):
    """k-NN (idx [Q, k], sq_dist [Q, k] ascending) streamed through VMEM.

    Q and M must be multiples of the tile sizes (clouds are capacity-padded,
    so this holds by construction).  k is static and small (5 for the
    reference's neighborhoods, ScanMatch.cpp:97/116).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q, M = q_xyz.shape[0], r_xyz.shape[0]
    assert Q % tile_q == 0 and M % tile_m == 0, (Q, M, tile_q, tile_m)

    qn = jnp.sum(q_xyz * q_xyz, axis=-1, keepdims=True)            # [Q, 1]
    rn = jnp.sum(r_xyz * r_xyz, axis=-1)                           # [M]
    rn = jnp.where(r_mask, rn, BIG)[None, :]                       # [1, M]

    import os

    # Default: the mask-and-rewrite baseline.  The v2 lex-threshold
    # extraction (COOPER_KNN_KERNEL=v2) eliminates the per-round tile-sized
    # stores but measured 3.6% SLOWER on chip (166.1 vs 172.3 solves/s at
    # the b64 scan-to-map shape, round-5 A/B): Mosaic fuses the
    # select+store+reduce pattern better than the doubled select-reduces.
    # Kept for A/Bs; bit-identical selection (test_knn_stream).
    body = (_knn_kernel_v2 if os.environ.get("COOPER_KNN_KERNEL", "v1") == "v2"
            else _knn_kernel)
    kernel = functools.partial(body, k=k, tile_m=tile_m, total_m=M)
    vm = pltpu.VMEM
    grid = (Q // tile_q,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, 3), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((tile_q, 1), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((M, 3), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, k), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((tile_q, k), lambda i: (i, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, k), jnp.float32),
            jax.ShapeDtypeStruct((Q, k), jnp.int32),
        ],
        interpret=interpret,
    )(q_xyz, qn, r_xyz, rn)
    return out[1], out[0]
