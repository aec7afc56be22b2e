"""Spatial-hash bucket k-NN for scan-to-map correspondence search.

The reference searches per-cube kd-trees over the surround map
(FeatureMap.h:490-691, ScanMatch.cpp:68-76).  The TPU-native equivalent
(SURVEY.md §7.1 "voxel-hash / grid-bucketed neighbor search"): the reference
cloud is scattered once per solve into fixed-capacity spatial-hash buckets;
each query gathers its 27-cell neighborhood (<= 27*cap candidates) and runs
an exact top-k over them.  Per-iteration traffic drops from [Q, M] dense
tiles to [Q, 27*cap] gathers (~20x at surround sizes).

Correctness domain: with cell_size >= sqrt(nn_sq_dist_max), any neighbor
within the solver's distance gate lies inside the 27-cell neighborhood, so
gated correspondences are exact (hash collisions only ever ADD candidates;
bucket overflow can drop points — size cap for the post-voxel density).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

BIG = 1.0e12
_P1, _P2, _P3 = 73856093, 19349663, 83492791  # standard spatial-hash primes


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BucketGrid:
    """slots: [H, cap] int32 indices into the reference cloud (-1 = empty)."""

    slots: jax.Array
    # static metadata carried in aux (hashable) fields
    cell_size: float = dataclasses.field(metadata=dict(static=True))
    hash_bits: int = dataclasses.field(metadata=dict(static=True))


def _cell_hash(ijk, hash_bits: int):
    h = (
        ijk[..., 0] * _P1
        ^ ijk[..., 1] * _P2
        ^ ijk[..., 2] * _P3
    )
    return h & ((1 << hash_bits) - 1)


@partial(jax.jit, static_argnames=("cell_size", "hash_bits", "capacity"))
def build(ref_xyz, ref_mask, cell_size: float = 2.5, hash_bits: int = 17,
          capacity: int = 32) -> BucketGrid:
    """Scatter reference point indices into hash buckets (sort + rank)."""
    M = ref_xyz.shape[0]
    H = 1 << hash_bits
    ijk = jnp.floor(ref_xyz / cell_size).astype(jnp.int32)
    h = jnp.where(ref_mask, _cell_hash(ijk, hash_bits), H)

    order = jnp.argsort(h)
    h_s = h[order]
    new_seg = jnp.concatenate([jnp.ones((1,), bool), h_s[1:] != h_s[:-1]])
    idx = jnp.arange(M)
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(new_seg, idx, 0)
    )
    rank = idx - seg_start
    keep = (h_s < H) & (rank < capacity)
    flat = jnp.where(keep, h_s * capacity + rank, H * capacity)

    slots = jnp.full((H * capacity + 1,), -1, jnp.int32)
    slots = slots.at[flat].set(jnp.where(keep, order.astype(jnp.int32), -1))
    return BucketGrid(slots[:-1].reshape(H, capacity), cell_size, hash_bits)


@partial(jax.jit, static_argnames=("k",))
def query(grid: BucketGrid, ref_xyz, ref_mask, q_xyz, k: int = 5):
    """k-NN among the 27-cell candidates.  Returns (idx [Q,k], sqdist [Q,k]).

    Distances to empty/missing candidates are BIG; the caller's distance
    gate (d[:, -1] < thresh) handles sufficiency exactly.

    Layout note: candidate coordinates are gathered PER COMPONENT as three
    [Q, 27*cap] planes, never as one [Q, 27*cap, 3] tensor — a trailing
    xyz dimension lands on the TPU lane axis and is padded 3 -> 128 (42.7x:
    at surround sizes that single gather was a multi-GB HBM allocation and
    the cause of an OOM at batch 64).  Same for the 27 cell hashes: computed
    per static offset, not via a [Q, 27, 3] index tensor.
    """
    cell = grid.cell_size
    bits = grid.hash_bits
    cap = grid.slots.shape[1]
    Q = q_xyz.shape[0]
    hmask = (1 << bits) - 1

    base = jnp.floor(q_xyz / cell).astype(jnp.int32)        # [Q, 3]
    bx, by, bz = base[..., 0], base[..., 1], base[..., 2]
    hs = jnp.stack(
        [
            ((bx + ox) * _P1 ^ (by + oy) * _P2 ^ (bz + oz) * _P3) & hmask
            for ox in (-1, 0, 1)
            for oy in (-1, 0, 1)
            for oz in (-1, 0, 1)
        ],
        axis=-1,
    )                                                        # [Q, 27]

    cand = grid.slots[hs].reshape(Q, 27 * cap)               # [Q, 27*cap]
    valid = cand >= 0
    cand_safe = jnp.where(valid, cand, 0)
    px = ref_xyz[..., 0][cand_safe]                          # [Q, 27*cap]
    py = ref_xyz[..., 1][cand_safe]
    pz = ref_xyz[..., 2][cand_safe]
    ok = valid & ref_mask[cand_safe]

    d = (
        (px - q_xyz[..., 0, None]) ** 2
        + (py - q_xyz[..., 1, None]) ** 2
        + (pz - q_xyz[..., 2, None]) ** 2
    )
    d = jnp.where(ok, d, BIG)
    neg, pos = jax.lax.top_k(-d, k)
    idx = jnp.take_along_axis(cand_safe, pos, axis=-1)
    return idx, -neg
