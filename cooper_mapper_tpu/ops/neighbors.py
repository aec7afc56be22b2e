"""Nearest-neighbor correspondence search, TPU-native.

The reference uses nanoflann kd-trees per query (LaserOdometry.h:101-104,
ScanMatch.cpp:68-76).  On TPU the idiomatic replacement is a *dense masked
distance computation* that rides the MXU: ``||q - r||^2 = ||q||^2 - 2 q.r +
||r||^2`` where the cross term is a matmul.  For the feature-cloud sizes of
this workload (hundreds to a few thousand points after downsampling), the full
[Q, M] distance tile is small; for the map-sized reference clouds the search is
restricted by the cube grid (see maps/feature_map.py).

Two code paths, selected by ``resolve_backend`` (config-driven, measured-
fastest by default on TPU):

* **streaming Pallas kernels** (ops/pallas/{nn1,knn_stream}.py) — the [Q, M]
  distance tile lives only in VMEM; the default on TPU (10x the dense path
  on scan-to-map shapes, BENCH.md round 3).
* **dense XLA races** — masked argmin/top_k over an HBM distance tile; the
  default everywhere else and the automatic fallback when the Pallas probe
  fails (a Mosaic regression degrades throughput instead of failing).

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


def knn_search(q_xyz, r_xyz, r_mask, k: int, chunk: int = 512,
               backend: str = "auto"):
    """k-NN dispatch for the scan-to-map searches.

    On the Pallas path (resolve_backend) with tileable shapes, the streaming
    top-k kernel (ops/pallas/knn_stream.py) keeps the [Q, M] distance tile in
    VMEM; otherwise the query-chunked dense formulation.
    """
    if resolve_backend(backend):
        import os

        from .pallas.nn1 import _pick_tile

        # The reference is PADDED up to a tile multiple (padded entries carry
        # ||r||^2 = BIG and never win) — falling back to whatever small tile
        # divides M cost 28% of scan-to-map throughput at M = 5888 (tile 256
        # vs padded 2048, 90.3 -> 126.0 solves/s at b256,
        # bench_artifacts/r4_chip2.log).  Tile choice ("auto"): ONE resident
        # reference tile when the padded M fits <= 6144 (fewer grid-step
        # boundaries; measured 176.2 vs 172.6 solves/s at the b64 bench
        # shape, BENCH.md 5f) — with TQ capped at 128 there because the
        # extraction keeps ~3 live [TQ, TM] temporaries per round against
        # ~16 MB VMEM; past 6144 (map-scale references) stream 2048 tiles.
        # COOPER_KNN_TQ / COOPER_KNN_TM override for experiments (TM is
        # honored verbatim after rounding down to a 128 multiple).
        tq_cap = int(os.environ.get("COOPER_KNN_TQ", "256"))
        tm_cap = int(os.environ.get("COOPER_KNN_TM", "0"))  # 0 = auto
        Q, M = q_xyz.shape[0], r_xyz.shape[0]
        m128 = -(-M // 128) * 128
        if tm_cap:
            tm = max(128, (tm_cap // 128) * 128)
            if M <= tm:
                tm = min(tm, m128)  # small reference: one snug tile
        else:
            tm = m128 if m128 <= 6144 else 2048
        if tm > 2048:
            tq_cap = min(tq_cap, 128)
        tq = _pick_tile(Q, tuple(t for t in (256, 128) if t <= tq_cap))
        m_pad = (-M) % tm
        if tq:
            from .pallas.knn_stream import knn_pallas

            if m_pad:
                r_xyz = jnp.pad(r_xyz, ((0, m_pad), (0, 0)))
                r_mask = jnp.pad(r_mask, (0, m_pad))
            return knn_pallas(q_xyz, r_xyz, r_mask, k, tile_q=tq, tile_m=tm,
                              interpret=_interpret())
    return knn_chunked(q_xyz, r_xyz, r_mask, k, chunk)


_PALLAS_PROBE: bool | None = None
_DOWNGRADE_NOTICE: bool = False


def resolve_backend(backend: str = "auto") -> bool:
    """True = streaming Pallas kernels, False = dense XLA formulation.

    ``backend`` comes from the config (``OdometryConfig.kernel_backend`` /
    ``ScanMatchConfig.kernel_backend``):

    * ``"auto"``   — the measured-fastest path for the backend: Pallas on
      TPU (gated on a one-time probe compile so a Mosaic regression degrades
      to dense instead of failing), dense elsewhere.
    * ``"pallas"`` — force the streaming kernels (TPU/interpret only).
    * ``"dense"``  — force the dense XLA races.

    The ``COOPER_USE_PALLAS`` env var (``"1"``/``"0"``) overrides the config
    for experiments.  ``COOPER_PALLAS_INTERPRET=1`` additionally honors the
    Pallas path on non-TPU backends in interpreter mode — the dispatch
    plumbing (argument wiring, return ordering, tile choices) then runs under
    the CPU test suite instead of only on the chip.
    """
    import os

    if jax.default_backend() != "tpu" and not _interpret():
        # an explicit "pallas" request on a non-TPU backend degrades to the
        # dense path ~10x slower — e.g. a TPU session where the axon backend
        # failed to register and JAX fell back to CPU.  Make that observable
        # once instead of silently running degraded.
        if backend == "pallas" or os.environ.get("COOPER_USE_PALLAS", "") == "1":
            global _DOWNGRADE_NOTICE
            if not _DOWNGRADE_NOTICE:
                import sys

                print(
                    "cooper_mapper_tpu: kernel_backend='pallas' requested but "
                    f"jax backend is {jax.default_backend()!r}; using dense NN "
                    "kernels (set COOPER_PALLAS_INTERPRET=1 to force "
                    "interpreted Pallas)",
                    file=sys.stderr, flush=True,
                )
                _DOWNGRADE_NOTICE = True
        return False
    env = os.environ.get("COOPER_USE_PALLAS", "")
    if env == "0":
        return False
    if env == "1":
        return True
    if backend == "dense":
        return False
    if backend == "pallas":
        return True
    if _interpret():
        return True
    return _probe_pallas()


def _probe_pallas() -> bool:
    """One-time tiny-kernel compile probe backing backend="auto" on TPU.

    A Mosaic/relay regression at compile time flips every "auto" dispatch in
    this process to the dense path with a stderr notice; throughput degrades
    ~10x instead of the pipeline failing.  (A regression that only manifests
    at large shapes is not caught here — bench.py keeps a whole-solve
    fallback for that.)  The decision is cached for the process lifetime:
    jit caches key on the traced dispatch, so flipping later would leave
    stale compilations around.
    """
    global _PALLAS_PROBE
    if _PALLAS_PROBE is None:
        try:
            from .pallas import nn1 as nn1_mod

            q = jnp.zeros((128, 3), jnp.float32)
            _, d = nn1_mod.nn1_pallas(
                q, q, jnp.ones((128,), bool), tile_q=128, tile_m=128,
                interpret=_interpret(),
            )
            jax.block_until_ready(d)
            _PALLAS_PROBE = True
        except Exception as e:  # pragma: no cover - exercised on chip only
            import sys

            print(
                f"cooper_mapper_tpu: Pallas probe failed "
                f"({type(e).__name__}: {e}); using dense NN kernels",
                file=sys.stderr, flush=True,
            )
            _PALLAS_PROBE = False
    return _PALLAS_PROBE


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


def _pad_ref_arrays(ref, mult: int = 128):
    """(xyz, ring, mask, padded_M): reference arrays padded to a tile
    multiple.  Padded entries are masked out, so they carry ||r||^2 = BIG in
    the kernels and never win a race; ring 0 is irrelevant under mask=False.
    Without this, any reference whose capacity is not a multiple of the tile
    ladder silently fell back to the dense path (28% throughput on the
    scan-to-map 5-NN at M = 5888; same gate here)."""
    M = ref.capacity
    pad = (-M) % mult
    if pad == 0:
        return ref.xyz, ref.ring, ref.mask, M
    return (
        jnp.pad(ref.xyz, ((0, pad), (0, 0))),
        jnp.pad(ref.ring, (0, pad)),
        jnp.pad(ref.mask, (0, pad)),
        M + pad,
    )


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


# Implementation note: each argmin race recomputes its own distance tile
# behind an optimization_barrier: the matmul is nearly free next to the
# [Q, M] HBM traffic, so rematerializing and letting each reduction fuse with
# its own producer beats writing the tile once and re-reading it per race
# (3-race surf search: 126 ms -> 72 ms at [512, 768, 4096] on TPU,
# bit-identical results — benchmarks/exp_races.py).  Two retired
# formulations — a per-ring-minima Pallas kernel and an azimuth-windowed B/C
# search — measured slower (ring: >10 min Mosaic compile; windowed: 19x) and
# were removed in round 4; conclusions in BENCH.md "Known floor".


def _race_dist(q_xyz, ref, precision):
    """A fresh masked [Q, M] distance tile that XLA will not CSE away."""
    qb = jax.lax.optimization_barrier(q_xyz)
    d = pairwise_sq_dist(qb, ref.xyz, precision)
    return jnp.where(ref.mask[None, :], d, BIG)


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
                 backend: str = "auto"):
    """Odometry corner correspondences (LaserOdometry.cpp:358-408).

    A = nearest reference corner; B = nearest corner on a *different* ring
    within ``ring_span`` rings of A's ring.  Returns (ia, ib, valid [Q]).
    ``query_chunk > 0`` streams the distance tile in query chunks.
    """

    if query_chunk and q_xyz.shape[0] > query_chunk:
        return _chunked_queries(
            lambda qc: corner_pairs(qc, ref, max_sq_dist, ring_span, n_rings,
                                    precision=precision, backend=backend),
            q_xyz, query_chunk,
        )

    if resolve_backend(backend):
        from .pallas import nn1 as nn1_mod

        rx, rring, rmask, M = _pad_ref_arrays(ref)
        ftq = _fused_tile_q(q_xyz.shape[0], M)
        if ftq:
            ia, da, ib, db = nn1_mod.fused_races_pallas(
                q_xyz, rx, rring, rmask, with_same=False,
                ring_span=ring_span, tile_q=ftq, interpret=_interpret(),
            )
            valid = (da < max_sq_dist) & (db < max_sq_dist)
            return ia, ib, valid
        tiles = _pallas_tiles(q_xyz.shape[0], M)
        if tiles:
            tq, tm = tiles
            ia, da = nn1_mod.nn1_pallas(
                q_xyz, rx, rmask, tile_q=tq, tile_m=tm,
                interpret=_interpret(),
            )
            ib, db = nn1_mod.nn1_masked_pallas(
                q_xyz, rring[ia], ia, rx, rring, rmask,
                "adj", ring_span, tile_q=tq, tile_m=tm,
                interpret=_interpret(),
            )
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
                 backend: str = "auto"):
    """Odometry surface correspondences (LaserOdometry.cpp:421-497).

    A = nearest surf point; B = nearest other surf on A's ring;
    C = nearest surf on a different ring within ``ring_span``.
    Returns (ia, ib, ic, valid [Q]).  ``query_chunk > 0`` streams the
    distance tile in query chunks (see _chunked_queries).
    """

    if query_chunk and q_xyz.shape[0] > query_chunk:
        return _chunked_queries(
            lambda qc: surf_triples(qc, ref, max_sq_dist, ring_span, n_rings,
                                    precision=precision, backend=backend),
            q_xyz, query_chunk,
        )

    if resolve_backend(backend):
        from .pallas import nn1 as nn1_mod

        rx, rring, rmask, M = _pad_ref_arrays(ref)
        ftq = _fused_tile_q(q_xyz.shape[0], M)
        if ftq:
            ia, da, ib, db, ic, dc = nn1_mod.fused_races_pallas(
                q_xyz, rx, rring, rmask, with_same=True,
                ring_span=ring_span, tile_q=ftq, interpret=_interpret(),
            )
            valid = (da < max_sq_dist) & (db < max_sq_dist) & (dc < max_sq_dist)
            return ia, ib, ic, valid
        tiles = _pallas_tiles(q_xyz.shape[0], M)
        if tiles:
            import os

            tq, tm = tiles
            ia, da = nn1_mod.nn1_pallas(
                q_xyz, rx, rmask, tile_q=tq, tile_m=tm,
                interpret=_interpret(),
            )
            ring_a = rring[ia]
            if os.environ.get("COOPER_PALLAS_BC", "1") != "0":
                # B + C on ONE shared distance tile (2 tile streams per surf
                # refresh instead of 3) — the round-4 default: headline
                # 1373.9 -> 1667.2 solves/s (+21%, repeat 1657.0;
                # bench_artifacts/r4_chip4.log).  COOPER_PALLAS_BC=0 restores
                # the separate-kernel races for A/B experiments.
                ib, db, ic, dc = nn1_mod.bc_races_pallas(
                    q_xyz, ring_a, ia, rx, rring, rmask,
                    ring_span, tile_q=tq, tile_m=tm, interpret=_interpret(),
                )
            else:
                ib, db = nn1_mod.nn1_masked_pallas(
                    q_xyz, ring_a, ia, rx, rring, rmask,
                    "same", ring_span, tile_q=tq, tile_m=tm,
                    interpret=_interpret(),
                )
                ic, dc = nn1_mod.nn1_masked_pallas(
                    q_xyz, ring_a, ia, rx, rring, rmask,
                    "adj", ring_span, tile_q=tq, tile_m=tm,
                    interpret=_interpret(),
                )
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
