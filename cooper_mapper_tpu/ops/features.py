"""Feature extraction (scan registration) — TPU-native.

Re-design of ``ScanRegistration::extractFeatures`` and helpers
(/root/reference/L_SLAM/src/odometry/ScanRegistration.cpp:190-666) as one
vectorized, fixed-shape kernel over an organized sweep grid
``[n_rings, W]``.  The reference's per-ring sequential loops become masked
array ops; its merge-sort + greedy pick becomes a small static top-k loop with
neighbor-suppression masks.

Behavioral parity notes (arbitrated against the literal transcription in
tests/ref_oracle.py by tests/test_features.py::TestFeaturesGolden — exact
set parity on a tie-free scene, quantified Jaccard where order dependence
bites):
 * curvature  = || sum_{j=1..cr} (p[i+j] + p[i-j]) - 2*cr*p[i] ||^2
   (setRegionBuffersFor, ScanRegistration.cpp:420-460) — exact.
 * region bounds — the reference's exact integer sp/ep partition
   (:248-257), including the ep-minus-one tail and degenerate-region skip.
 * occlusion/blind masks (setScanBuffersFor, :462-522) — same triggers and
   windows, EDGE_BROKEN on the near/foreground silhouette point (:505-517);
   computed order-independently with priority BLIND > NEAR_BLOCK, so
   chained adjacent triggers can differ from the sequential overwrites
   (occlusion-scene sharp Jaccard 0.93).
 * flat picking (:267-284): greedy lowest-curvature with +/-cr suppression —
   exact per region, but all regions pick round-robin in parallel, so a
   pick's suppression does not spill into an *earlier* region's later
   rounds, and exact curvature ties (flat floors) order differently in f32
   (occlusion-scene flat Jaccard 0.73, tie-dominated).
 * sharp picking (:305-354): top-k by curvature with the two-sided PCA
   classification (pointClassify, :547-666) as batched closed-form 3x3
   eigendecompositions; the oneside-flat bound is shared with
   classify-SURFACE_FLAT points in descending curvature order (:318-353).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RegistrationConfig
from ..utils import cloud as cloud_lib
from ..utils.cloud import Cloud
from . import eig3
from .voxel import voxel_downsample

# point status labels (ScanRegistration.h:23-40)
EDGE_BROKEN = -2
NEAR_BLOCK = -3
BLIND_BLOCK = -4
STATUS_NONE = 0

# classification labels
MESSY = 0
CLS_SURFACE_FLAT = 1
CLS_CORNER_SHARP = 2
CLS_ONESIDE_FLAT = 3


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Sweep:
    """Organized sweep grid: ring-major, azimuth-ordered.

    xyz:      [R, W, 3] in the LOAM working frame
    mask:     [R, W] valid points (front-packed per ring)
    rel_time: [R, W] in-sweep time fraction in [0, 1)
    """

    xyz: jax.Array
    mask: jax.Array
    rel_time: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FeatureClouds:
    sharp: Cloud
    less_sharp: Cloud
    flat: Cloud
    less_flat: Cloud


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FeatureDebug:
    """Per-point extraction internals, the /point_blind//point_block/
    /point_slop//point_curvature debug clouds (ScanRegistration.cpp:81-86,
    679-682) as grid-shaped arrays.

    All fields are [R, W] aligned with the input Sweep.
    """

    curvature: jax.Array   # squared-norm curvature (setRegionBuffersFor)
    status: jax.Array      # int32: BLIND_BLOCK / NEAR_BLOCK / EDGE_BROKEN / 0
    label: jax.Array       # int32 classification (pointClassify)
    region_id: jax.Array   # azimuthal region id, -1 outside the feature span
    sharp_picked: jax.Array  # bool: point entered the sharp cloud
    flat_picked: jax.Array   # bool: point entered the flat cloud


def _shift(x, k, fill):
    """Shift along the last *point* axis (axis=-1 for 1D fields) by k with fill."""
    if k == 0:
        return x
    pad = jnp.full_like(x[..., :abs(k)], fill)
    if k > 0:  # value from index i+k
        return jnp.concatenate([x[..., k:], pad], axis=-1)
    return jnp.concatenate([pad, x[..., :k]], axis=-1)


def _shift_pts(p, k):
    """Shift [..., W, 3] along W; out-of-range -> zeros."""
    if k == 0:
        return p
    pad = jnp.zeros_like(p[..., : abs(k), :])
    if k > 0:
        return jnp.concatenate([p[..., k:, :], pad], axis=-2)
    return jnp.concatenate([pad, p[..., :k, :]], axis=-2)


def curvature(xyz, cr: int):
    """[..., W, 3] -> [..., W] squared-norm curvature (setRegionBuffersFor)."""
    acc = -2.0 * cr * xyz
    for j in range(1, cr + 1):
        acc = acc + _shift_pts(xyz, j) + _shift_pts(xyz, -j)
    return jnp.sum(acc * acc, axis=-1)


def _cos_angle(a, b, eps=1e-12):
    num = jnp.sum(a * b, axis=-1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
    return num / jnp.maximum(den, eps)


def scan_status(xyz, mask, cfg: RegistrationConfig):
    """Occlusion / blind-area statuses per point: [..., W] int32.

    Mirrors setScanBuffersFor (ScanRegistration.cpp:462-522):
      * consecutive points with cos-angle < blind_threshold -> BLIND_BLOCK
        window [i-cr+1, i+cr]
      * squared jump > 1 m^2 -> NEAR_BLOCK on the occluded side's cr
        neighbors; the edge point on the far side -> EDGE_BROKEN when the
        preceding step is smooth (diffPrev/diffNext < 0.2).
    """
    cr = cfg.curvature_region
    nxt = _shift_pts(xyz, 1)
    prv = _shift_pts(xyz, -1)
    mask_nxt = _shift(mask, 1, False)

    pair_valid = mask & mask_nxt
    cosang = _cos_angle(xyz, nxt)
    blind_trig = pair_valid & (cosang < cfg.blind_threshold)

    # dilate blind triggers over [i-cr+1, i+cr]
    blind = jnp.zeros_like(mask)
    for j in range(-cr + 1, cr + 1):
        blind = blind | _shift(blind_trig, -j, False)

    diff_next = jnp.sum((nxt - xyz) ** 2, axis=-1)
    diff_prev = jnp.sum((prv - xyz) ** 2, axis=-1)
    depth_i = jnp.linalg.norm(xyz, axis=-1)
    depth_n = jnp.linalg.norm(nxt, axis=-1)

    jump = pair_valid & (diff_next > 1.0) & ~blind_trig
    # occluded side: nearer points get NEAR_BLOCK
    occ_here = jump & (depth_i <= depth_n)   # i is nearer -> i+1..i+cr blocked
    occ_next = jump & (depth_i > depth_n)    # i+1 nearer -> i-cr+1..i blocked

    near = jnp.zeros_like(mask)
    for j in range(1, cr + 1):
        near = near | _shift(occ_here, -j, False)      # marks i+1..i+cr
    for j in range(0, cr):
        near = near | _shift(occ_next, j, False)       # marks i-cr+1..i
    # reference fills curvature_region entries starting at i-cr+1 for the
    # depth1>depth2 branch and i+1.. for the other; see :509-519.

    # EDGE_BROKEN goes on the NEAR (foreground) boundary point — the
    # silhouette edge of the occluder (ScanRegistration.cpp:505-517):
    # depth1 > depth2 -> edge at i+1 (the nearer next point);
    # else            -> edge at i (the nearer current point).
    smooth_prev = diff_prev / jnp.maximum(diff_next, 1e-12) < 0.2
    edge_pt = occ_here & smooth_prev                          # edge at i
    edge_pt = edge_pt | _shift(occ_next & smooth_prev, -1, False)  # at i+1
    # eligibility: not already blocked
    edge = edge_pt & ~near & ~blind

    status = jnp.zeros(mask.shape, jnp.int32)
    status = jnp.where(edge, EDGE_BROKEN, status)
    status = jnp.where(near, NEAR_BLOCK, status)
    status = jnp.where(blind, BLIND_BLOCK, status)
    return status


def classify(xyz, mask, cfg: RegistrationConfig):
    """Two-sided PCA line classification (pointClassify, :547-666).

    Returns [..., W] int32 in {MESSY, CLS_SURFACE_FLAT, CLS_CORNER_SHARP,
    CLS_ONESIDE_FLAT}.

    Layout note: the per-point windowed PCA runs entirely on [..., W]
    component planes (shifted x/y/z copies, six covariance components,
    closed-form 3x3 eigen-analysis — ops/eig3.py).  Stacking a
    [..., W, cr+1, 3] window tensor + jnp.linalg.eigh over [..., W, 3, 3]
    puts the tiny trailing dims on the TPU (sublane, lane) axes — padded
    (8, 128)/(4, 128), a measured 2 GB HBM allocation for 36 MB of
    covariances at batch-256 sweeps.
    """
    cr = cfg.curvature_region
    k = cr + 1
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]

    def side(offsets):
        xs = [_shift(x, o, 0.0) for o in offsets]
        ys = [_shift(y, o, 0.0) for o in offsets]
        zs = [_shift(z, o, 0.0) for o in offsets]
        mx = sum(xs) / k
        my = sum(ys) / k
        mz = sum(zs) / k
        ax = [c - mx for c in xs]
        ay = [c - my for c in ys]
        az = [c - mz for c in zs]
        cxx = sum(a * a for a in ax) / k
        cyy = sum(a * a for a in ay) / k
        czz = sum(a * a for a in az) / k
        cxy = sum(a * b for a, b in zip(ax, ay)) / k
        cxz = sum(a * b for a, b in zip(ax, az)) / k
        cyz = sum(a * b for a, b in zip(ay, az)) / k
        lam0, lam1, lam2 = eig3.eigvalsh3(cxx, cxy, cxz, cyy, cyz, czz)
        vx, vy, vz = eig3.principal_evec3(cxx, cxy, cxz, cyy, cyz, czz, lam2)
        is_line = (lam2 > cfg.classify_eig_ratio12 * lam1) & (
            lam2 > cfg.classify_eig_ratio13 * lam0
        )
        # max point-line distance inlier check (:591-600): |a_j x v| per
        # window point (v is unit)
        tol2 = cfg.classify_line_tol * cfg.classify_line_tol
        for axj, ayj, azj in zip(ax, ay, az):
            d2 = (
                (ayj * vz - azj * vy) ** 2
                + (azj * vx - axj * vz) ** 2
                + (axj * vy - ayj * vx) ** 2
            )
            is_line = is_line & (d2 <= tol2)
        return is_line, (vx, vy, vz)

    line1, v1 = side([-j for j in range(0, cr + 1)])   # p[i], p[i-1], ... p[i-cr]
    line2, v2 = side([+j for j in range(0, cr + 1)])   # p[i], p[i+1], ... p[i+cr]

    # cos angle of two unit directions (planes)
    diff = v1[0] * v2[0] + v1[1] * v2[1] + v1[2] * v2[2]
    flat_cond = (diff < np.cos(np.deg2rad(175.0))) | (diff > np.cos(np.deg2rad(5.0)))
    corner_cond = (diff > np.cos(np.deg2rad(135.0))) & (diff < np.cos(np.deg2rad(45.0)))

    label = jnp.full(mask.shape, MESSY, jnp.int32)
    label = jnp.where(line1 | line2, CLS_ONESIDE_FLAT, label)
    both = line1 & line2
    label = jnp.where(both & corner_cond, CLS_CORNER_SHARP, label)
    label = jnp.where(both & flat_cond, CLS_SURFACE_FLAT, label)
    return label


def _region_ids(mask, cfg: RegistrationConfig):
    """Azimuthal region id per point, [-1 outside feature span].

    Uses the reference's EXACT integer region bounds (:248-257):
    ``sp_j = (cr*(nreg-j) + (end-cr)*j) // nreg`` and
    ``ep_j = sp_{j+1} - 1`` over [cr, end-cr-1]; regions with ``ep <= sp``
    are skipped, rings with ``end <= 2*cr`` are skipped entirely (:205).
    With front-packed masks the rank of a point is its scan index.
    """
    cr = cfg.curvature_region
    nreg = cfg.n_feature_regions
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1
    count = jnp.sum(mask.astype(jnp.int32), axis=-1, keepdims=True)
    end = count - 1                                    # [..., 1]
    j = jnp.arange(nreg + 1, dtype=jnp.int32)
    sp = (cr * (nreg - j) + (end - cr) * j) // nreg    # [..., nreg+1]
    # region j = [sp_j, sp_{j+1} - 1]; sp_nreg - 1 = end - cr - 1 (the
    # reference's last feature index: the final ep subtracts one)
    rid = jnp.sum(rank[..., None] >= sp[..., None, :-1], axis=-1) - 1
    rid = jnp.clip(rid, 0, nreg - 1)
    # skip degenerate regions (ep <= sp, :259-261)
    region_ok = (sp[..., 1:] - 1) > sp[..., :-1]       # [..., nreg]
    ok = jnp.take_along_axis(
        jnp.broadcast_to(region_ok, rank.shape[:-1] + (nreg,)), rid, axis=-1
    )
    in_span = (
        mask & ok & (rank >= cr) & (rank <= end - cr - 1) & (end > 2 * cr)
    )
    return jnp.where(in_span, rid, -1)


def _pick_topk_per_region(score, eligible, region_id, nreg, k, suppress_radius=None,
                          mode="max"):
    """Greedy per-region top-k with optional +/-suppress_radius suppression.

    score, eligible, region_id: [W].  Returns picked mask [W] plus the pick
    indices [nreg, k] and their validity [nreg, k].
    """
    W = score.shape[-1]
    big = jnp.inf
    sign = 1.0 if mode == "min" else -1.0
    base = jnp.where(eligible, sign * score, big)

    onehot_region = region_id[None, :] == jnp.arange(nreg)[:, None]  # [nreg, W]

    picked = jnp.zeros((W,), bool)
    idxs = []
    vals = []
    suppressed = jnp.zeros((W,), bool)
    for _ in range(k):
        cand = jnp.where(onehot_region & ~(picked | suppressed)[None, :], base[None, :], big)
        i = jnp.argmin(cand, axis=-1)                     # [nreg]
        ok = jnp.take_along_axis(cand, i[:, None], -1)[:, 0] < big
        idxs.append(i)
        vals.append(ok)
        # scatter-max: a failed region's default index 0 must not clear a hit
        hit = (
            jnp.zeros((W,), jnp.int32).at[i].max(ok.astype(jnp.int32)) > 0
        )
        picked = picked | hit
        if suppress_radius:
            dil = hit
            for j in range(1, suppress_radius + 1):
                dil = dil | _shift(hit, j, False) | _shift(hit, -j, False)
            suppressed = suppressed | dil
    return picked, jnp.stack(idxs, -1), jnp.stack(vals, -1), suppressed


def _gather_cloud(xyz, rel_time, ring_ids, flat_idx, valid, capacity):
    """Build a Cloud from flat indices into the [R*W] sweep."""
    take = lambda a: jnp.take(a.reshape((-1,) + a.shape[2:]), flat_idx, axis=0)
    c = cloud_lib.make(
        jnp.where(valid[:, None], take(xyz), cloud_lib.FAR),
        valid,
        take(ring_ids),
        take(rel_time),
    )
    return cloud_lib.compact(c, capacity)


def _mask_cloud(xyz, rel_time, ring_ids, mask2d, capacity):
    flat = lambda a: a.reshape((-1,) + a.shape[2:])
    m = flat(mask2d)
    c = cloud_lib.make(
        jnp.where(m[:, None], flat(xyz), cloud_lib.FAR), m, flat(ring_ids), flat(rel_time)
    )
    return cloud_lib.compact(c, capacity)


def _extract_impl(sweep: Sweep, cfg: RegistrationConfig):
    xyz, mask, rel_time = sweep.xyz, sweep.mask, sweep.rel_time
    R, W = mask.shape
    cr = cfg.curvature_region
    nreg = cfg.n_feature_regions

    ring_ids = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[:, None], (R, W))

    curv = curvature(xyz, cr)
    status = scan_status(xyz, mask, cfg)
    region_id = _region_ids(mask, cfg)
    in_span = region_id >= 0

    low_curv = curv < cfg.surface_curvature_threshold
    high_curv = ~low_curv

    cls = classify(xyz, mask, cfg)

    # ---- flat picking: per (ring, region) greedy lowest-curvature, k=4,
    # with +/-cr suppression (SURF_PICKED_NEAR marking). -------------------
    def per_ring_flat(curv_r, elig_r, rid_r):
        picked, _, _, _ = _pick_topk_per_region(
            curv_r, elig_r, rid_r, nreg, cfg.max_surface_flat, suppress_radius=cr,
            mode="min",
        )
        return picked

    flat_elig = in_span & low_curv
    flat_picked = jax.vmap(per_ring_flat)(curv, flat_elig, region_id)

    # ---- sharp picking: top-2 per region among classified corners not near
    # occlusions (status > EDGE_BROKEN i.e. not NEAR_BLOCK/BLIND, :333). ----
    sharp_elig = in_span & high_curv & (cls == CLS_CORNER_SHARP) & (status > EDGE_BROKEN)

    def per_ring_sharp(curv_r, elig_r, rid_r):
        picked, _, _, _ = _pick_topk_per_region(
            curv_r, elig_r, rid_r, nreg, cfg.max_corner_sharp, mode="max"
        )
        return picked

    sharp_picked = jax.vmap(per_ring_sharp)(curv, sharp_elig, region_id)

    # edge-broken points are corners outright (:297-302)
    edge_broken = in_span & (status == EDGE_BROKEN)

    # ---- oneside-flat picking (:318-353): the surfPickedNum bound is
    # SHARED between classify-SURFACE_FLAT points (which consume it without
    # being pushed, :324-327) and ONESIDE_FLAT points (pushed, :345-349), in
    # descending curvature order — so pick top-4 over the UNION and keep
    # only the oneside members.
    oneside_elig = in_span & high_curv & (cls == CLS_ONESIDE_FLAT)
    oneside_union = oneside_elig | (
        in_span & high_curv & (cls == CLS_SURFACE_FLAT)
    )

    def per_ring_oneside(curv_r, elig_r, rid_r):
        picked, _, _, _ = _pick_topk_per_region(
            curv_r, elig_r, rid_r, nreg, cfg.max_surface_flat, mode="max"
        )
        return picked

    oneside_picked = (
        jax.vmap(per_ring_oneside)(curv, oneside_union, region_id)
        & oneside_elig
    )

    sharp_mask = sharp_picked | edge_broken
    less_sharp_mask = sharp_elig | edge_broken
    flat_mask = flat_picked | oneside_picked
    # less-flat pool: all low-curvature in-span points + high-curv flats (:287-296, :322-330, :344-353)
    less_flat_mask = (in_span & low_curv) | (high_curv & in_span & (cls == CLS_SURFACE_FLAT)) | oneside_elig

    sharp = _mask_cloud(xyz, rel_time, ring_ids, sharp_mask, cfg.max_sharp)
    less_sharp = _mask_cloud(xyz, rel_time, ring_ids, less_sharp_mask, cfg.max_less_sharp)
    flat = _mask_cloud(xyz, rel_time, ring_ids, flat_mask, cfg.max_flat)
    less_flat_raw = _mask_cloud(
        xyz, rel_time, ring_ids, less_flat_mask, cfg.max_less_flat
    )
    less_flat = voxel_downsample(less_flat_raw, cfg.less_flat_filter_size)

    fc = FeatureClouds(sharp, less_sharp, flat, less_flat)
    dbg = FeatureDebug(
        curvature=curv,
        status=status,
        label=cls,
        region_id=region_id,
        sharp_picked=sharp_mask,
        flat_picked=flat_mask,
    )
    return fc, dbg


@partial(jax.jit, static_argnames=("cfg",))
def extract_features(sweep: Sweep, cfg: RegistrationConfig) -> FeatureClouds:
    """Full feature extraction for one sweep.

    vmap over a leading batch dimension of Sweep for batched execution.
    """
    return _extract_impl(sweep, cfg)[0]


@partial(jax.jit, static_argnames=("cfg",))
def extract_features_debug(sweep: Sweep, cfg: RegistrationConfig):
    """extract_features plus the per-point debug internals — the optional
    classification debug clouds of the reference (ScanRegistration.cpp:81-86).

    Returns (FeatureClouds, FeatureDebug).  Same compiled program as
    extract_features when the debug outputs are unused (XLA dead-code
    eliminates them there).
    """
    return _extract_impl(sweep, cfg)
