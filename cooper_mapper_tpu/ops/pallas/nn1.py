"""Streaming 1-NN argmin: the VMEM-resident replacement for the dense race.

The dense formulation (ops/neighbors._race_dist) materializes a [Q, M] f32
distance tile in HBM per race; at the bench shape [512, 768, 4096] that HBM
write+read is the measured ~63 ms refresh floor (BENCH.md "Known floor").
This kernel streams reference tiles through VMEM and carries only the running
(min, argmin) per query — the [Q, M] tile never exists.  The Mosaic program
is tiny (one matmul + two fused reductions per tile step) and compiles in
seconds.  Races B/C reuse the same streaming structure with ring masks
(nn1_masked_pallas below); together they are the default odometry
correspondence path on TPU (ops/neighbors.corner_pairs/surf_triples).

Semantics match ``ops.neighbors.nn1``: squared distances via the
``||q||^2 - 2 q.r + ||r||^2`` expansion (f32 matmul), ties broken toward the
smaller reference index (tiles are scanned in index order and merges use
strict ``<``).  Masking differs only in representation: instead of setting
masked distances to exactly BIG, invalid points carry ``||r||^2 = BIG`` so
their distances sit at BIG + O(|q.r|) — never a winner against any real
candidate under the meter-scale acceptance gates (25 m^2 / 5 m^2), and the
selected indices/distances for gated-in queries are identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = 1.0e12


def _nn1_kernel(q_ref, qn_ref, r_ref, rn_ref, o_min, o_idx,
                *, tile_m: int, total_m: int):
    from jax.experimental import pallas as pl

    q = q_ref[:, :]                       # [TQ, 3]
    qn = qn_ref[:, :]                     # [TQ, 1]
    n_tiles = total_m // tile_m

    def tile_body(t, carry):
        best, bidx = carry                # [TQ, 1] f32, [TQ, 1] i32
        off = t * tile_m
        r = r_ref[pl.ds(off, tile_m), :]  # [TM, 3]
        rn = rn_ref[:, pl.ds(off, tile_m)]  # [1, TM], FAR where invalid
        d = (
            qn
            - 2.0 * jax.lax.dot_general(
                q, r, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + rn
        )                                  # [TQ, TM]
        m = jnp.min(d, axis=-1, keepdims=True)
        a = off + jnp.argmin(d, axis=-1, keepdims=True).astype(jnp.int32)
        upd = m < best                    # strict: earlier tile wins ties
        return jnp.where(upd, m, best), jnp.where(upd, a, bidx)

    init = (
        jnp.full(o_min.shape, BIG, jnp.float32),
        jnp.zeros(o_idx.shape, jnp.int32),
    )
    best, bidx = jax.lax.fori_loop(0, n_tiles, tile_body, init)
    o_min[:, :] = best
    o_idx[:, :] = bidx


@functools.partial(jax.jit, static_argnames=("tile_q", "tile_m", "interpret"))
def nn1_pallas(q_xyz, r_xyz, r_mask, tile_q: int = 256, tile_m: int = 512,
               interpret: bool = False):
    """1-NN (idx [Q], sq_dist [Q]) with the distance tile kept in VMEM.

    Q and M must be multiples of the tile sizes (clouds are capacity-padded,
    so this holds by construction).  Masking rides the ``||r||^2`` term: an
    invalid point's squared norm is set to BIG, so its distance to every
    query exceeds any real candidate — cheaper than masking the [TQ, TM]
    tile (see module docstring for the exact-semantics argument).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q, M = q_xyz.shape[0], r_xyz.shape[0]
    assert Q % tile_q == 0 and M % tile_m == 0, (Q, M, tile_q, tile_m)

    qn = jnp.sum(q_xyz * q_xyz, axis=-1, keepdims=True)            # [Q, 1]
    rn = jnp.sum(r_xyz * r_xyz, axis=-1)                           # [M]
    rn = jnp.where(r_mask, rn, BIG)[None, :]                       # [1, M]

    kernel = functools.partial(_nn1_kernel, tile_m=tile_m, total_m=M)
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
            pl.BlockSpec((tile_q, 1), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((tile_q, 1), lambda i: (i, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, 1), jnp.float32),
            jax.ShapeDtypeStruct((Q, 1), jnp.int32),
        ],
        interpret=interpret,
    )(q_xyz, qn, r_xyz, rn)
    return out[1][:, 0], out[0][:, 0]


def _nn1_masked_kernel(q_ref, qn_ref, ra_ref, ia_ref, r_ref, rn_ref, ring_ref,
                       o_min, o_idx, *, tile_m: int, total_m: int, mode: str,
                       ring_span: float):
    """Ring-constrained race: candidates filtered by ring relation to A.

    ``mode='same'``: candidate ring == A's ring AND candidate index != A
    (the surf runner-up race, LaserOdometry.cpp:437-452).
    ``mode='adj'``: 0 < |candidate ring - A's ring| <= ring_span (the
    adjacent-ring races, :366-382 corners / :453-475 surfs).
    """
    from jax.experimental import pallas as pl

    q = q_ref[:, :]                       # [TQ, 3]
    qn = qn_ref[:, :]                     # [TQ, 1]
    ra = ra_ref[:, :]                     # [TQ, 1] f32 ring of A
    ia = ia_ref[:, :]                     # [TQ, 1] i32 index of A
    tq = q.shape[0]
    n_tiles = total_m // tile_m

    def tile_body(t, carry):
        best, bidx = carry                # [TQ, 1] f32, [TQ, 1] i32
        off = t * tile_m
        r = r_ref[pl.ds(off, tile_m), :]        # [TM, 3]
        rn = rn_ref[:, pl.ds(off, tile_m)]      # [1, TM], FAR where invalid
        ring = ring_ref[:, pl.ds(off, tile_m)]  # [1, TM], 1e9 where invalid
        d = (
            qn
            - 2.0 * jax.lax.dot_general(
                q, r, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + rn
        )                                  # [TQ, TM]
        if mode == "same":
            ok = ring == ra
            cols = off + jax.lax.broadcasted_iota(jnp.int32, (tq, tile_m), 1)
            ok = ok & (cols != ia)
        else:  # adj
            rd = jnp.abs(ring - ra)
            ok = (rd > 0.0) & (rd <= ring_span)
        d = jnp.where(ok, d, BIG)
        m = jnp.min(d, axis=-1, keepdims=True)
        a = off + jnp.argmin(d, axis=-1, keepdims=True).astype(jnp.int32)
        upd = m < best                    # strict: earlier tile wins ties
        return jnp.where(upd, m, best), jnp.where(upd, a, bidx)

    init = (
        jnp.full(o_min.shape, BIG, jnp.float32),
        jnp.zeros(o_idx.shape, jnp.int32),
    )
    best, bidx = jax.lax.fori_loop(0, n_tiles, tile_body, init)
    o_min[:, :] = best
    o_idx[:, :] = bidx


@functools.partial(
    jax.jit,
    static_argnames=("mode", "ring_span", "tile_q", "tile_m", "interpret"),
)
def nn1_masked_pallas(q_xyz, ring_a, ia, r_xyz, r_ring, r_mask, mode: str,
                      ring_span: float = 2.5, tile_q: int = 256,
                      tile_m: int = 512, interpret: bool = False):
    """Ring-constrained 1-NN (idx [Q], sq_dist [Q]) streamed through VMEM.

    The races B and C of the dense correspondence searches
    (ops/neighbors.corner_pairs/surf_triples) re-reduce the same [Q, M]
    distance tile under ring masks derived from race A's winner; with this
    kernel each race streams its own tiles through VMEM instead, so no race
    of the refresh ever materializes [Q, M] in HBM.  Selections match the
    dense masked argmin for every query that passes the meter-scale
    acceptance gates (invalid points carry ring 1e9 — excluded exactly — and
    ||r||^2 = BIG).  Ties break toward the smaller reference index.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q, M = q_xyz.shape[0], r_xyz.shape[0]
    assert Q % tile_q == 0 and M % tile_m == 0, (Q, M, tile_q, tile_m)
    assert mode in ("same", "adj"), mode

    qn = jnp.sum(q_xyz * q_xyz, axis=-1, keepdims=True)            # [Q, 1]
    rn = jnp.sum(r_xyz * r_xyz, axis=-1)                           # [M]
    rn = jnp.where(r_mask, rn, BIG)[None, :]                       # [1, M]
    ringf = jnp.where(r_mask, r_ring.astype(jnp.float32), 1e9)[None, :]
    ra = ring_a.astype(jnp.float32)[:, None]                       # [Q, 1]
    ia2 = ia.astype(jnp.int32)[:, None]                            # [Q, 1]

    kernel = functools.partial(
        _nn1_masked_kernel, tile_m=tile_m, total_m=M, mode=mode,
        ring_span=float(ring_span),
    )
    vm = pltpu.VMEM
    grid = (Q // tile_q,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, 3), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((tile_q, 1), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((tile_q, 1), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((tile_q, 1), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((M, 3), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, 1), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((tile_q, 1), lambda i: (i, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, 1), jnp.float32),
            jax.ShapeDtypeStruct((Q, 1), jnp.int32),
        ],
        interpret=interpret,
    )(q_xyz, qn, ra, ia2, r_xyz, rn, ringf)
    return out[1][:, 0], out[0][:, 0]


def _bc_races_kernel(q_ref, qn_ref, ra_ref, ia_ref, r_ref, rn_ref, ring_ref,
                     ob_min, ob_idx, oc_min, oc_idx, *, tile_m: int,
                     total_m: int, ring_span: float):
    """Races B ('same') and C ('adj') on ONE shared distance tile.

    Structurally identical to _nn1_masked_kernel (ra/ia arrive as inputs from
    race A, streaming fori_loop over reference tiles, running (min, argmin)
    carries) except both ring masks reduce the SAME ``d`` — the surf search
    then builds 2 distance tiles per refresh instead of 3.
    """
    from jax.experimental import pallas as pl

    q = q_ref[:, :]                       # [TQ, 3]
    qn = qn_ref[:, :]                     # [TQ, 1]
    ra = ra_ref[:, :]                     # [TQ, 1] f32 ring of A
    ia = ia_ref[:, :]                     # [TQ, 1] i32 index of A
    tq = q.shape[0]
    n_tiles = total_m // tile_m

    def tile_body(t, carry):
        best_b, bidx_b, best_c, bidx_c = carry
        off = t * tile_m
        r = r_ref[pl.ds(off, tile_m), :]        # [TM, 3]
        rn = rn_ref[:, pl.ds(off, tile_m)]      # [1, TM]
        ring = ring_ref[:, pl.ds(off, tile_m)]  # [1, TM]
        d = (
            qn
            - 2.0 * jax.lax.dot_general(
                q, r, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + rn
        )                                  # [TQ, TM]
        cols = off + jax.lax.broadcasted_iota(jnp.int32, (tq, tile_m), 1)

        db = jnp.where((ring == ra) & (cols != ia), d, BIG)
        m = jnp.min(db, axis=-1, keepdims=True)
        a = off + jnp.argmin(db, axis=-1, keepdims=True).astype(jnp.int32)
        upd = m < best_b
        best_b = jnp.where(upd, m, best_b)
        bidx_b = jnp.where(upd, a, bidx_b)

        rd = jnp.abs(ring - ra)
        dc = jnp.where((rd > 0.0) & (rd <= ring_span), d, BIG)
        m = jnp.min(dc, axis=-1, keepdims=True)
        a = off + jnp.argmin(dc, axis=-1, keepdims=True).astype(jnp.int32)
        upd = m < best_c
        best_c = jnp.where(upd, m, best_c)
        bidx_c = jnp.where(upd, a, bidx_c)
        return best_b, bidx_b, best_c, bidx_c

    init = (
        jnp.full(ob_min.shape, BIG, jnp.float32),
        jnp.zeros(ob_idx.shape, jnp.int32),
        jnp.full(oc_min.shape, BIG, jnp.float32),
        jnp.zeros(oc_idx.shape, jnp.int32),
    )
    best_b, bidx_b, best_c, bidx_c = jax.lax.fori_loop(
        0, n_tiles, tile_body, init
    )
    ob_min[:, :] = best_b
    ob_idx[:, :] = bidx_b
    oc_min[:, :] = best_c
    oc_idx[:, :] = bidx_c


@functools.partial(
    jax.jit, static_argnames=("ring_span", "tile_q", "tile_m", "interpret")
)
def bc_races_pallas(q_xyz, ring_a, ia, r_xyz, r_ring, r_mask,
                    ring_span: float = 2.5, tile_q: int = 256,
                    tile_m: int = 512, interpret: bool = False):
    """Surf races B and C in one kernel: (ib [Q], db [Q], ic [Q], dc [Q]).

    Selections identical to two nn1_masked_pallas calls ('same' then 'adj')
    — same masks, same tie-breaking — at 1 shared distance tile instead of 2.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q, M = q_xyz.shape[0], r_xyz.shape[0]
    assert Q % tile_q == 0 and M % tile_m == 0, (Q, M, tile_q, tile_m)

    qn = jnp.sum(q_xyz * q_xyz, axis=-1, keepdims=True)            # [Q, 1]
    rn = jnp.sum(r_xyz * r_xyz, axis=-1)                           # [M]
    rn = jnp.where(r_mask, rn, BIG)[None, :]                       # [1, M]
    ringf = jnp.where(r_mask, r_ring.astype(jnp.float32), 1e9)[None, :]
    ra = ring_a.astype(jnp.float32)[:, None]                       # [Q, 1]
    ia2 = ia.astype(jnp.int32)[:, None]                            # [Q, 1]

    kernel = functools.partial(
        _bc_races_kernel, tile_m=tile_m, total_m=M, ring_span=float(ring_span)
    )
    vm = pltpu.VMEM
    qv = pl.BlockSpec((tile_q, 1), lambda i: (i, 0), memory_space=vm)
    out = pl.pallas_call(
        kernel,
        grid=(Q // tile_q,),
        in_specs=[
            pl.BlockSpec((tile_q, 3), lambda i: (i, 0), memory_space=vm),
            qv, qv, qv,
            pl.BlockSpec((M, 3), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=vm),
        ],
        out_specs=[qv] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((Q, 1), jnp.float32),
            jax.ShapeDtypeStruct((Q, 1), jnp.int32),
            jax.ShapeDtypeStruct((Q, 1), jnp.float32),
            jax.ShapeDtypeStruct((Q, 1), jnp.int32),
        ],
        interpret=interpret,
    )(q_xyz, qn, ra, ia2, r_xyz, rn, ringf)
    return out[1][:, 0], out[0][:, 0], out[3][:, 0], out[2][:, 0]


def _fused_races_kernel(q_ref, qn_ref, r_ref, rn_ref, ring_ref, *outs,
                        with_same: bool, ring_span: float):
    """All races of one correspondence search on a single distance tile.

    The separate-kernel path (nn1_pallas + nn1_masked_pallas per race)
    recomputes the ``[TQ, M]`` distance tile for every race; the races are
    VPU-elementwise-bound (the dense-XLA and streaming-Pallas refresh costs
    coincide at ~63 ms — the HBM tile was never the bottleneck), so computing
    ``d`` once and running the masked reductions on the SAME tile removes
    1/2 (corner) to 2/3 (surf) of the tile-construction work.

    Requires the whole reference resident in VMEM (single tile, no fori_loop):
    race A's winner ring must be known before races B/C can mask, so a
    streaming multi-tile variant would need two passes anyway.  A's ring is
    extracted in-kernel with a hit-mask reduce (no value-domain gather, which
    Mosaic lacks): ``ra = min(where(cols == ia, ring, 1e9))``.

    Race semantics match the dense searches (ops/neighbors.corner_pairs /
    surf_triples, LaserOdometry.cpp:358-497): A = global nearest, B (surf,
    ``with_same``) = nearest on A's ring excluding A, C = nearest within
    ``ring_span`` rings of A's ring excluding A's ring.  Ties break toward
    the smaller reference index (single argmin pass over the full tile).
    """
    q = q_ref[:, :]                       # [TQ, 3]
    qn = qn_ref[:, :]                     # [TQ, 1]
    r = r_ref[:, :]                       # [M, 3]
    rn = rn_ref[:, :]                     # [1, M], BIG where invalid
    ring = ring_ref[:, :]                 # [1, M] f32, 1e9 where invalid

    d = (
        qn
        - 2.0 * jax.lax.dot_general(
            q, r, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + rn
    )                                      # [TQ, M]

    da = jnp.min(d, axis=-1, keepdims=True)
    ia = jnp.argmin(d, axis=-1, keepdims=True).astype(jnp.int32)

    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    at_a = cols == ia                      # [TQ, M]
    ra = jnp.min(jnp.where(at_a, ring, 1e9), axis=-1, keepdims=True)

    o = iter(outs)
    o_min_a, o_idx_a = next(o), next(o)
    o_min_a[:, :] = da
    o_idx_a[:, :] = ia

    if with_same:
        db_t = jnp.where((ring == ra) & ~at_a, d, BIG)
        o_min_b, o_idx_b = next(o), next(o)
        o_min_b[:, :] = jnp.min(db_t, axis=-1, keepdims=True)
        o_idx_b[:, :] = jnp.argmin(db_t, axis=-1, keepdims=True).astype(jnp.int32)

    rd = jnp.abs(ring - ra)
    dc_t = jnp.where((rd > 0.0) & (rd <= ring_span), d, BIG)
    o_min_c, o_idx_c = next(o), next(o)
    o_min_c[:, :] = jnp.min(dc_t, axis=-1, keepdims=True)
    o_idx_c[:, :] = jnp.argmin(dc_t, axis=-1, keepdims=True).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("with_same", "ring_span", "tile_q", "interpret"),
)
def fused_races_pallas(q_xyz, r_xyz, r_ring, r_mask, with_same: bool,
                       ring_span: float = 2.5, tile_q: int = 128,
                       interpret: bool = False):
    """One-kernel correspondence search: all races share one distance tile.

    Returns ``(ia, da, ib, db, ic, dc)`` with ``with_same=True`` (the surf
    triple search: B = same-ring runner-up, C = adjacent-ring nearest) or
    ``(ia, da, ic, dc)`` with ``with_same=False`` (the corner pair search:
    only the adjacent-ring race).  Selections match the dense searches for
    every query that passes the meter-scale acceptance gates; masking rides
    ``||r||^2 = BIG`` and ``ring = 1e9`` exactly as in nn1_masked_pallas.

    The whole reference must fit in VMEM alongside the [tile_q, M] distance
    tile — callers gate on M (ops/neighbors._fused_max_m); the streaming
    per-race kernels remain the fallback for map-sized references.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q, M = q_xyz.shape[0], r_xyz.shape[0]
    assert Q % tile_q == 0 and M % 128 == 0, (Q, M, tile_q)

    qn = jnp.sum(q_xyz * q_xyz, axis=-1, keepdims=True)            # [Q, 1]
    rn = jnp.sum(r_xyz * r_xyz, axis=-1)                           # [M]
    rn = jnp.where(r_mask, rn, BIG)[None, :]                       # [1, M]
    ringf = jnp.where(r_mask, r_ring.astype(jnp.float32), 1e9)[None, :]

    kernel = functools.partial(
        _fused_races_kernel, with_same=with_same, ring_span=float(ring_span)
    )
    vm = pltpu.VMEM
    n_out = 6 if with_same else 4
    qv = pl.BlockSpec((tile_q, 1), lambda i: (i, 0), memory_space=vm)
    out = pl.pallas_call(
        kernel,
        grid=(Q // tile_q,),
        in_specs=[
            pl.BlockSpec((tile_q, 3), lambda i: (i, 0), memory_space=vm),
            qv,
            pl.BlockSpec((M, 3), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=vm),
        ],
        out_specs=[qv] * n_out,
        out_shape=[
            jax.ShapeDtypeStruct((Q, 1), jnp.float32 if k % 2 == 0 else jnp.int32)
            for k in range(n_out)
        ],
        interpret=interpret,
    )(q_xyz, qn, r_xyz, rn, ringf)
    # kernel outputs are (min, idx) per race; return (idx, dist) per race to
    # match nn1_pallas / the dense searches
    races = [(out[k + 1][:, 0], out[k][:, 0]) for k in range(0, n_out, 2)]
    return tuple(v for pair in races for v in pair)


def _pick_tile(n: int, candidates) -> int:
    for c in candidates:
        if n % c == 0:
            return c
    return 0


def nn1(q_xyz, r_xyz, r_mask):
    """Backend dispatch: Pallas when neighbors.resolve_backend picks it, XLA
    dense race otherwise (see ops/neighbors.nn1 for the dense formulation)."""
    from .. import neighbors

    if neighbors.resolve_backend():
        tq = _pick_tile(q_xyz.shape[0], (256, 128))
        tm = _pick_tile(r_xyz.shape[0], (512, 256, 128))
        if tq and tm:
            return nn1_pallas(q_xyz, r_xyz, r_mask, tile_q=tq, tile_m=tm)
    return neighbors.nn1(q_xyz, r_xyz, r_mask)
