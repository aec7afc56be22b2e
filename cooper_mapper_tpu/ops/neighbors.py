"""Nearest-neighbor correspondence search, TPU-native.

The reference uses nanoflann kd-trees per query (LaserOdometry.h:101-104,
ScanMatch.cpp:68-76).  On TPU the idiomatic replacement is a *dense masked
distance computation* that rides the MXU: ``||q - r||^2 = ||q||^2 - 2 q.r +
||r||^2`` where the cross term is a matmul.  For the feature-cloud sizes of
this workload (hundreds to a few thousand points after downsampling), the full
[Q, M] distance tile is small; for the map-sized reference clouds the search is
restricted by the cube/bucket grid (see maps/feature_map.py).

All searches honor validity masks via FAR sentinels: invalid reference points
sit at 1e6 so they can never win a nearest-neighbor race under real gates
(25 m^2 / 5 m^2 thresholds).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BIG = 1.0e12


def pairwise_sq_dist(q, r, precision=None):
    """[Q,3] x [M,3] -> [Q,M] squared distances (MXU-friendly).

    ``precision`` overrides the package-wide ``highest`` matmul precision for
    the cross term only.  The distances feed argmin races gated at meters —
    'high' (3-pass bf16, ~f32 accuracy) is indistinguishable in selection and
    roughly halves MXU time; 'default' (1-pass bf16) can flip near-ties.
    """
    qn = jnp.sum(q * q, axis=-1)
    rn = jnp.sum(r * r, axis=-1)
    cross = jnp.matmul(q, r.T, precision=precision)
    return qn[:, None] - 2.0 * cross + rn[None, :]


def nn1(q_xyz, r_xyz, r_mask, precision=None):
    """1-NN: returns (idx [Q], sq_dist [Q]).

    The winning distance is jnp.min, not a take_along_axis gather: min and
    argmin are sibling reductions XLA fuses into one pass over the tile,
    while a gather consumer would force the whole [Q, M] tile into HBM.
    """
    d = pairwise_sq_dist(q_xyz, r_xyz, precision)
    d = jnp.where(r_mask[None, :], d, BIG)
    return jnp.argmin(d, axis=-1), jnp.min(d, axis=-1)


def knn(q_xyz, r_xyz, r_mask, k: int, precision=None):
    """k-NN: returns (idx [Q,k], sq_dist [Q,k]) sorted ascending."""
    d = pairwise_sq_dist(q_xyz, r_xyz, precision)
    d = jnp.where(r_mask[None, :], d, BIG)
    neg, idx = jax.lax.top_k(-d, k)
    return idx, -neg


def knn_chunked(q_xyz, r_xyz, r_mask, k: int, chunk: int = 512):
    """k-NN with the [Q, M] distance tile streamed in query chunks.

    Keeps peak memory at [chunk, M] — the reference cloud (a surround map of
    tens of thousands of points) stays resident while query tiles stream
    through the MXU.  Q must be a multiple of ``chunk`` or it is padded.
    """
    Q = q_xyz.shape[0]
    pad = (-Q) % chunk
    qp = jnp.pad(q_xyz, ((0, pad), (0, 0)))
    qc = qp.reshape(-1, chunk, 3)

    def one(qt):
        return knn(qt, r_xyz, r_mask, k)

    idx, d = jax.lax.map(one, qc)
    return idx.reshape(-1, k)[:Q], d.reshape(-1, k)[:Q]


def knn_search(q_xyz, r_xyz, r_mask, k: int, chunk: int = 512):
    """k-NN dispatch for the scan-to-map searches.

    On TPU under COOPER_USE_PALLAS=1 and tileable shapes, the streaming
    Pallas top-k kernel (ops/pallas/knn_stream.py) keeps the [Q, M] distance
    tile in VMEM; otherwise the query-chunked dense formulation.
    """
    if _pallas_mode() == "1":
        from .pallas.nn1 import _pick_tile

        # the top-k kernel keeps ~3k live [TQ, TM] temporaries per extraction
        # round, so unlike the 1-NN races it must NOT take the whole reference
        # as one tile (VMEM): cap the reference tile at 2048
        tq = _pick_tile(q_xyz.shape[0], (256, 128))
        tm = _pick_tile(r_xyz.shape[0], (2048, 1024, 512, 256, 128))
        if tq and tm:
            from .pallas.knn_stream import knn_pallas

            return knn_pallas(q_xyz, r_xyz, r_mask, k, tile_q=tq, tile_m=tm,
                              interpret=_interpret())
    return knn_chunked(q_xyz, r_xyz, r_mask, k, chunk)


def _pallas_mode() -> str:
    """Pallas dispatch for the dense correspondence searches (TPU only).

    ``COOPER_USE_PALLAS=1``    — streaming masked-race kernels (nn1.py): race
    A plus ring-constrained B/C races, each keeping its distance tile in
    VMEM; tiny Mosaic programs that compile in seconds.
    ``COOPER_USE_PALLAS=ring`` — the per-ring-minima kernel (nn_ring.py);
    one pass over the reference but a 3D-masked program whose Mosaic compile
    exceeds 10 minutes through the axon remote-compile path.
    Unset/other — the dense XLA formulation.

    ``COOPER_PALLAS_INTERPRET=1`` additionally honors the mode on non-TPU
    backends and runs the kernels in Pallas interpreter mode — the dispatch
    plumbing (argument wiring, return ordering, tile choices) then runs under
    the CPU test suite instead of only on the chip.
    """
    import os

    if jax.default_backend() != "tpu" and not _interpret():
        return ""
    return os.environ.get("COOPER_USE_PALLAS", "")


def _interpret() -> bool:
    import os

    return os.environ.get("COOPER_PALLAS_INTERPRET", "0") == "1"


def _pallas_tiles(q: int, m: int):
    from .pallas.nn1 import _pick_tile

    tq = _pick_tile(q, (256, 128))
    # large reference tiles amortize per-dot issue latency: the race dots are
    # [TQ, 3] x [3, TM] (K=3, latency-bound), so fewer/bigger wins — the whole
    # reference as ONE tile when it fits VMEM (measured 1045 -> 1373 solves/s
    # at [512, 768/4864], bench_artifacts/pallas_tile_ab.log)
    if m % 128 == 0 and m <= 8192:
        tm = m
    else:
        tm = _pick_tile(m, (4096, 2048, 1024, 512, 256, 128))
    return (tq, tm) if tq and tm else None


def _fused_tile_q(q: int, m: int):
    """Query tile for the fused one-tile-per-search kernel, or 0 to skip.

    OPT-IN (COOPER_PALLAS_FUSED=1): the fused kernel verifies bit-exact on
    single problems (bench_artifacts/verify_fused.log) but its vmapped
    steady-state execution wedged the TPU through the axon relay (first
    batch-512 run completes in ~5 s, every subsequent run hangs for minutes
    and blocks the chip — suspected VMEM-oversubscription scheduling issue
    with ~6 live [tile_q, M] tiles).  The separate-kernel streaming path with
    the full reference as one tile is the measured-fastest stable default.

    The fused kernel also needs the whole [tile_q, M] distance tile in VMEM,
    so it is gated on M: past ~8k reference points the per-race streaming
    kernels take over (map-sized searches).
    """
    import os

    from .pallas.nn1 import _pick_tile

    if os.environ.get("COOPER_PALLAS_FUSED", "0") != "1":
        return 0
    if m % 128 != 0 or m > 8192:
        return 0
    return _pick_tile(q, (256, 128) if m <= 4096 else (128,))


def _ring_minima(q_xyz, ref, n_rings):
    from .pallas.nn_ring import ring_minima

    return ring_minima(q_xyz, ref.xyz, ref.ring, ref.mask, n_rings)


def _select_ring(minv, idxv, ring_sel):
    """Min over a per-query ring subset: minv [Q, R], ring_sel [Q, R] bool."""
    m = jnp.where(ring_sel, minv, BIG)
    r = jnp.argmin(m, axis=-1)
    take = lambda a: jnp.take_along_axis(a, r[:, None], -1)[:, 0]
    return take(m), take(idxv)


# Implementation note: two interchangeable formulations exist for the
# ring-structured searches.  The dense masked-argmin form below is fastest
# under XLA on TPU (the segment-min/ring-minima form in ops/pallas/nn_ring.py
# lowers to scatter reductions that run ~2x slower; its Pallas kernel avoids
# the HBM tile entirely but is gated on Mosaic compile cost,
# COOPER_USE_PALLAS=1).
#
# Each argmin race recomputes its own distance tile behind an
# optimization_barrier: the matmul is nearly free next to the [Q, M] HBM
# traffic, so rematerializing and letting each reduction fuse with its own
# producer beats writing the tile once and re-reading it per race (3-race
# surf search: 126 ms -> 72 ms at [512, 768, 4096] on TPU, bit-identical
# results — benchmarks/exp_races.py).


def _window_candidates(ref, ia, window: int):
    """Gather a contiguous index window of ``window`` candidates around ia.

    REQUIRES the reference cloud sorted azimuth-major
    (utils/cloud.sort_azimuth_major, invalid points last): the window then
    spans all rings at azimuths near the race-1 winner.  This is an
    *azimuth-local approximation* of the reference's candidate walk — the
    reference's cloud is ring-major and its index walk breaks only on ring id
    (LaserOdometry.cpp:366-382), so it spans whole rings azimuthally within
    +/-2.5 rings; the window instead bounds the azimuth span and covers all
    rings.  An UNSORTED reference cloud silently yields ~0 valid partners
    (callers validate via _check_window).

    Boundary behavior: jnp.clip shrinks the window one-sided at the array
    ends, so queries whose A lands near index 0 or near the end of the valid
    region search a half-width neighborhood (sweep start/end azimuths).  The
    reference's walk does not wrap around the sweep seam either
    (:366-382 breaks at the array ends), so this is parity, not a bug.
    Returns (idx [Q, W], ring [Q, W], mask [Q, W]).
    """
    offs = jnp.arange(window, dtype=jnp.int32) - window // 2
    idx = jnp.clip(ia[:, None] + offs[None, :], 0, ref.capacity - 1)
    return idx, ref.ring[idx], ref.mask[idx]


def _check_window(window: int, n_rings: int):
    """Trace-time validation of the windowed-search precondition.

    A window narrower than ~3 rows of the azimuth-major grid cannot contain
    a same-ring partner for most queries (each azimuth column holds n_rings
    consecutive entries), silently dropping all surface constraints from the
    solve — verified: window=16 with n_rings=16 yields 0 valid surf
    correspondences.  window and n_rings are static, so this raises at trace
    time, not on device.
    """
    if 0 < window < 3 * n_rings:
        raise ValueError(
            f"nn_window={window} is too narrow for n_rings={n_rings}: the "
            f"azimuth-major index window must span >= 3 * n_rings entries "
            f"(~3 azimuth columns) to contain same-ring/adjacent-ring "
            f"partners; got < {3 * n_rings}."
        )


def _window_min(q_xyz, ref, idx, sel):
    """Min/argmin over the window axis: ([Q,3], ref, [Q,W], [Q,W]) -> ([Q],[Q]).

    Candidate coordinates are gathered per component ([Q, W] planes) — a
    [Q, W, 3] gather puts the xyz axis on TPU lanes and pads it 3 -> 128
    (42.7x HBM expansion; measured 12x slower windowed solves).
    """
    d = (
        (ref.xyz[..., 0][idx] - q_xyz[..., 0, None]) ** 2
        + (ref.xyz[..., 1][idx] - q_xyz[..., 1, None]) ** 2
        + (ref.xyz[..., 2][idx] - q_xyz[..., 2, None]) ** 2
    )
    d = jnp.where(sel, d, BIG)
    return jnp.min(d, axis=-1), jnp.argmin(d, axis=-1)


def _race_dist(q_xyz, ref, precision):
    """A fresh masked [Q, M] distance tile that XLA will not CSE away."""
    qb = jax.lax.optimization_barrier(q_xyz)
    d = pairwise_sq_dist(qb, ref.xyz, precision)
    return jnp.where(ref.mask[None, :], d, BIG)


def _race_a(q_xyz, ref, precision):
    """Race A (global nearest): returns (ia [Q], da [Q]).

    Dispatches to the streaming Pallas 1-NN kernel (ops/pallas/nn1.py) on
    TPU when COOPER_USE_PALLAS is set — the [Q, M] distance tile then lives
    only in VMEM — and to the dense fused min/argmin race otherwise.
    Selections are identical under the meter-scale acceptance gates (see
    nn1.py).
    """
    if _pallas_mode():
        tiles = _pallas_tiles(q_xyz.shape[0], ref.capacity)
        if tiles:
            from .pallas import nn1 as nn1_mod

            return nn1_mod.nn1_pallas(
                q_xyz, ref.xyz, ref.mask, tile_q=tiles[0], tile_m=tiles[1],
                interpret=_interpret(),
            )
    d = _race_dist(q_xyz, ref, precision)
    return jnp.argmin(d, axis=-1), jnp.min(d, axis=-1)


def _chunked_queries(fn, q_xyz, chunk: int):
    """Run a per-query-row search in [chunk, M]-tile pieces via lax.map.

    Caps the distance-tile footprint at [chunk, M] per problem instead of
    [Q, M] — the enabler for very large solve batches (the [B, Q, M] tile is
    the peak-memory term of the batched odometry solve).  ``fn`` maps a
    [chunk, 3] query tile to a tuple of [chunk, ...] outputs.
    """
    Q = q_xyz.shape[0]
    pad = (-Q) % chunk
    qp = jnp.pad(q_xyz, ((0, pad), (0, 0)), constant_values=1e6)
    outs = jax.lax.map(fn, qp.reshape(-1, chunk, 3))
    return tuple(o.reshape(-1, *o.shape[2:])[:Q] for o in outs)


def corner_pairs(q_xyz, ref, max_sq_dist: float, ring_span: float = 2.5,
                 n_rings: int = 16, query_chunk: int = 0, precision=None,
                 window: int = 0):
    """Odometry corner correspondences (LaserOdometry.cpp:358-408).

    A = nearest reference corner; B = nearest corner on a *different* ring
    within ``ring_span`` rings of A's ring.  Returns (ia, ib, valid [Q]).
    ``query_chunk > 0`` streams the distance tile in query chunks.
    ``window > 0`` finds B inside a ``window``-wide index window around A
    instead of a second full distance race — an azimuth-local approximation
    of the reference's ring-band walk around its kd-tree hit (:366-382; see
    _window_candidates for how the neighborhoods differ) — REQUIRES ``ref``
    sorted azimuth-major; one [Q, M] tile instead of two.
    """

    _check_window(window, n_rings)
    if query_chunk and q_xyz.shape[0] > query_chunk:
        return _chunked_queries(
            lambda qc: corner_pairs(qc, ref, max_sq_dist, ring_span, n_rings,
                                    precision=precision, window=window),
            q_xyz, query_chunk,
        )

    if window:
        ia, da = _race_a(q_xyz, ref, precision)
        ring_a = ref.ring[ia]
        idx, wring, wmask = _window_candidates(ref, ia, window)
        rd = jnp.abs(wring - ring_a[:, None]).astype(jnp.float32)
        sel = wmask & (rd > 0.0) & (rd <= ring_span)
        db, jb = _window_min(q_xyz, ref, idx, sel)
        ib = jnp.take_along_axis(idx, jb[:, None], axis=-1)[:, 0]
        valid = (da < max_sq_dist) & (db < max_sq_dist)
        return ia, ib, valid

    pallas_mode = _pallas_mode()
    if pallas_mode == "1":
        from .pallas import nn1 as nn1_mod

        ftq = _fused_tile_q(q_xyz.shape[0], ref.capacity)
        if ftq:
            ia, da, ib, db = nn1_mod.fused_races_pallas(
                q_xyz, ref.xyz, ref.ring, ref.mask, with_same=False,
                ring_span=ring_span, tile_q=ftq, interpret=_interpret(),
            )
            valid = (da < max_sq_dist) & (db < max_sq_dist)
            return ia, ib, valid
        tiles = _pallas_tiles(q_xyz.shape[0], ref.capacity)
        if tiles:
            tq, tm = tiles
            ia, da = nn1_mod.nn1_pallas(
                q_xyz, ref.xyz, ref.mask, tile_q=tq, tile_m=tm,
                interpret=_interpret(),
            )
            ib, db = nn1_mod.nn1_masked_pallas(
                q_xyz, ref.ring[ia], ia, ref.xyz, ref.ring, ref.mask,
                "adj", ring_span, tile_q=tq, tile_m=tm,
                interpret=_interpret(),
            )
            valid = (da < max_sq_dist) & (db < max_sq_dist)
            return ia, ib, valid
    if pallas_mode == "ring":
        min1, idx1, _, _ = _ring_minima(q_xyz, ref, n_rings)
        ring_a = jnp.argmin(min1, axis=-1)
        da = jnp.take_along_axis(min1, ring_a[:, None], -1)[:, 0]
        ia = jnp.take_along_axis(idx1, ring_a[:, None], -1)[:, 0]
        rr = jnp.arange(n_rings)[None, :]
        diff = jnp.abs(rr - ring_a[:, None]).astype(jnp.float32)
        adj = (diff > 0.0) & (diff <= ring_span)
        db, ib = _select_ring(min1, idx1, adj)
        valid = (da < max_sq_dist) & (db < max_sq_dist)
        return ia, ib, valid

    d = _race_dist(q_xyz, ref, precision)
    ia = jnp.argmin(d, axis=-1)
    da = jnp.min(d, axis=-1)            # sibling of argmin: one fused pass
    ring_a = ref.ring[ia]
    ring_diff = jnp.abs(
        ref.ring[None, :].astype(jnp.float32) - ring_a[:, None].astype(jnp.float32)
    )
    adj = (ring_diff > 0.0) & (ring_diff <= ring_span)
    d2 = jnp.where(adj, _race_dist(q_xyz, ref, precision), BIG)
    ib = jnp.argmin(d2, axis=-1)
    db = jnp.min(d2, axis=-1)
    valid = (da < max_sq_dist) & (db < max_sq_dist)
    return ia, ib, valid


def surf_triples(q_xyz, ref, max_sq_dist: float, ring_span: float = 2.5,
                 n_rings: int = 16, query_chunk: int = 0, precision=None,
                 window: int = 0):
    """Odometry surface correspondences (LaserOdometry.cpp:421-497).

    A = nearest surf point; B = nearest other surf on A's ring;
    C = nearest surf on a different ring within ``ring_span``.
    Returns (ia, ib, ic, valid [Q]).  ``query_chunk > 0`` streams the
    distance tile in query chunks (see _chunked_queries).  ``window > 0``
    finds B and C inside an index window around A (ref MUST be sorted
    azimuth-major) — one [Q, M] tile instead of three; an azimuth-local
    approximation of the reference's ring-band index walk (:437-475; see
    _window_candidates).
    """

    _check_window(window, n_rings)
    if query_chunk and q_xyz.shape[0] > query_chunk:
        return _chunked_queries(
            lambda qc: surf_triples(qc, ref, max_sq_dist, ring_span, n_rings,
                                    precision=precision, window=window),
            q_xyz, query_chunk,
        )

    if window:
        ia, da = _race_a(q_xyz, ref, precision)
        ring_a = ref.ring[ia]
        idx, wring, wmask = _window_candidates(ref, ia, window)
        same = wmask & (wring == ring_a[:, None]) & (idx != ia[:, None])
        db, jb = _window_min(q_xyz, ref, idx, same)
        ib = jnp.take_along_axis(idx, jb[:, None], axis=-1)[:, 0]
        rd = jnp.abs(wring - ring_a[:, None]).astype(jnp.float32)
        adj = wmask & (rd > 0.0) & (rd <= ring_span)
        dc, jc = _window_min(q_xyz, ref, idx, adj)
        ic = jnp.take_along_axis(idx, jc[:, None], axis=-1)[:, 0]
        valid = (da < max_sq_dist) & (db < max_sq_dist) & (dc < max_sq_dist)
        return ia, ib, ic, valid

    pallas_mode = _pallas_mode()
    if pallas_mode == "1":
        from .pallas import nn1 as nn1_mod

        ftq = _fused_tile_q(q_xyz.shape[0], ref.capacity)
        if ftq:
            ia, da, ib, db, ic, dc = nn1_mod.fused_races_pallas(
                q_xyz, ref.xyz, ref.ring, ref.mask, with_same=True,
                ring_span=ring_span, tile_q=ftq, interpret=_interpret(),
            )
            valid = (da < max_sq_dist) & (db < max_sq_dist) & (dc < max_sq_dist)
            return ia, ib, ic, valid
        tiles = _pallas_tiles(q_xyz.shape[0], ref.capacity)
        if tiles:
            import os

            tq, tm = tiles
            ia, da = nn1_mod.nn1_pallas(
                q_xyz, ref.xyz, ref.mask, tile_q=tq, tile_m=tm,
                interpret=_interpret(),
            )
            ring_a = ref.ring[ia]
            if os.environ.get("COOPER_PALLAS_BC", "0") == "1":
                # B + C on one shared distance tile (2 tiles/refresh not 3);
                # opt-in pending on-chip measurement
                ib, db, ic, dc = nn1_mod.bc_races_pallas(
                    q_xyz, ring_a, ia, ref.xyz, ref.ring, ref.mask,
                    ring_span, tile_q=tq, tile_m=tm, interpret=_interpret(),
                )
            else:
                ib, db = nn1_mod.nn1_masked_pallas(
                    q_xyz, ring_a, ia, ref.xyz, ref.ring, ref.mask,
                    "same", ring_span, tile_q=tq, tile_m=tm,
                    interpret=_interpret(),
                )
                ic, dc = nn1_mod.nn1_masked_pallas(
                    q_xyz, ring_a, ia, ref.xyz, ref.ring, ref.mask,
                    "adj", ring_span, tile_q=tq, tile_m=tm,
                    interpret=_interpret(),
                )
            valid = (da < max_sq_dist) & (db < max_sq_dist) & (dc < max_sq_dist)
            return ia, ib, ic, valid
    if pallas_mode == "ring":
        min1, idx1, min2, idx2 = _ring_minima(q_xyz, ref, n_rings)
        ring_a = jnp.argmin(min1, axis=-1)
        take = lambda a: jnp.take_along_axis(a, ring_a[:, None], -1)[:, 0]
        da, ia = take(min1), take(idx1)
        db, ib = take(min2), take(idx2)
        rr = jnp.arange(n_rings)[None, :]
        diff = jnp.abs(rr - ring_a[:, None]).astype(jnp.float32)
        adj = (diff > 0.0) & (diff <= ring_span)
        dc, ic = _select_ring(min1, idx1, adj)
        valid = (da < max_sq_dist) & (db < max_sq_dist) & (dc < max_sq_dist)
        return ia, ib, ic, valid

    d = _race_dist(q_xyz, ref, precision)
    ia = jnp.argmin(d, axis=-1)
    da = jnp.min(d, axis=-1)            # sibling of argmin: one fused pass
    ring_a = ref.ring[ia]

    same_ring = ref.ring[None, :] == ring_a[:, None]
    not_a = jnp.arange(ref.capacity)[None, :] != ia[:, None]
    d_b = jnp.where(same_ring & not_a, _race_dist(q_xyz, ref, precision), BIG)
    ib = jnp.argmin(d_b, axis=-1)
    db = jnp.min(d_b, axis=-1)

    ring_diff = jnp.abs(
        ref.ring[None, :].astype(jnp.float32) - ring_a[:, None].astype(jnp.float32)
    )
    adj = (ring_diff > 0.0) & (ring_diff <= ring_span)
    d_c = jnp.where(adj, _race_dist(q_xyz, ref, precision), BIG)
    ic = jnp.argmin(d_c, axis=-1)
    dc = jnp.min(d_c, axis=-1)

    valid = (da < max_sq_dist) & (db < max_sq_dist) & (dc < max_sq_dist)
    return ia, ib, ic, valid
