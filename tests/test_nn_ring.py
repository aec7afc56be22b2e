import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cooper_mapper_tpu.ops.pallas import nn_ring
from cooper_mapper_tpu.utils import cloud as cloud_lib
from cooper_mapper_tpu.ops import neighbors


def _random_problem(seed=0, Q=128, M=512, R=8):
    rng = np.random.RandomState(seed)
    q = rng.uniform(-10, 10, (Q, 3)).astype(np.float32)
    r = rng.uniform(-10, 10, (M, 3)).astype(np.float32)
    ring = rng.randint(0, R, M).astype(np.int32)
    mask = rng.rand(M) > 0.1
    return jnp.asarray(q), jnp.asarray(r), jnp.asarray(ring), jnp.asarray(mask), R


def _brute(q, r, ring, mask, R):
    """numpy oracle."""
    qn, rn = np.asarray(q), np.asarray(r)
    d = ((qn[:, None] - rn[None]) ** 2).sum(-1)
    d[:, ~np.asarray(mask)] = nn_ring.BIG
    Q, M = d.shape
    m1 = np.full((Q, R), nn_ring.BIG, np.float32)
    i1 = np.zeros((Q, R), np.int32)
    m2 = np.full((Q, R), nn_ring.BIG, np.float32)
    i2 = np.zeros((Q, R), np.int32)
    ring = np.asarray(ring)
    for rr in range(R):
        sel = np.where(np.asarray(mask) & (ring == rr))[0]
        if len(sel) == 0:
            continue
        dr = d[:, sel]
        order = np.argsort(dr, axis=1)
        m1[:, rr] = dr[np.arange(Q), order[:, 0]]
        i1[:, rr] = sel[order[:, 0]]
        if len(sel) > 1:
            m2[:, rr] = dr[np.arange(Q), order[:, 1]]
            i2[:, rr] = sel[order[:, 1]]
    return m1, i1, m2, i2


class TestRingMinimaXla:
    def test_matches_numpy_oracle(self):
        q, r, ring, mask, R = _random_problem()
        m1, i1, m2, i2 = nn_ring.ring_minima_xla(q, r, ring, mask, R)
        e1, ei1, e2, ei2 = _brute(q, r, ring, mask, R)
        np.testing.assert_allclose(m1, e1, rtol=1e-4)
        np.testing.assert_allclose(m2, e2, rtol=1e-4)
        np.testing.assert_array_equal(i1, ei1)
        np.testing.assert_array_equal(i2, ei2)


class TestCorrespondenceSemantics:
    def test_surf_triples_match_dense_reference(self):
        """The ring-minima-based search must reproduce the dense masked-argmin
        semantics of the original formulation."""
        rng = np.random.RandomState(3)
        Q, M, R = 64, 256, 8
        q = jnp.asarray(rng.uniform(-5, 5, (Q, 3)).astype(np.float32))
        ref = cloud_lib.Cloud(
            xyz=jnp.asarray(rng.uniform(-5, 5, (M, 3)).astype(np.float32)),
            mask=jnp.asarray(rng.rand(M) > 0.1),
            ring=jnp.asarray(rng.randint(0, R, M), jnp.int32),
            rel_time=jnp.zeros(M),
        )
        ia, ib, ic, ok = neighbors.surf_triples(q, ref, 25.0, 2.5, R)

        # dense reference semantics
        d = np.array(neighbors.pairwise_sq_dist(q, ref.xyz))
        d[:, ~np.asarray(ref.mask)] = neighbors.BIG
        ring = np.asarray(ref.ring)
        for qi in range(Q):
            a = int(np.argmin(d[qi]))
            ra = ring[a]
            same = np.where((ring == ra) & (np.arange(M) != a))[0]
            adj = np.where((ring != ra) & (np.abs(ring - ra) <= 2.5))[0]
            assert int(ia[qi]) == a
            if bool(ok[qi]):
                b = same[np.argmin(d[qi, same])]
                c = adj[np.argmin(d[qi, adj])]
                assert int(ib[qi]) == b, (qi, int(ib[qi]), b)
                assert int(ic[qi]) == c

    def test_corner_pairs_match_dense_reference(self):
        rng = np.random.RandomState(5)
        Q, M, R = 64, 256, 8
        q = jnp.asarray(rng.uniform(-5, 5, (Q, 3)).astype(np.float32))
        ref = cloud_lib.Cloud(
            xyz=jnp.asarray(rng.uniform(-5, 5, (M, 3)).astype(np.float32)),
            mask=jnp.ones(M, bool),
            ring=jnp.asarray(rng.randint(0, R, M), jnp.int32),
            rel_time=jnp.zeros(M),
        )
        ia, ib, ok = neighbors.corner_pairs(q, ref, 25.0, 2.5, R)
        d = np.asarray(neighbors.pairwise_sq_dist(q, ref.xyz))
        ring = np.asarray(ref.ring)
        for qi in range(Q):
            a = int(np.argmin(d[qi]))
            assert int(ia[qi]) == a
            ra = ring[a]
            adj = np.where((ring != ra) & (np.abs(ring - ra) <= 2.5))[0]
            if bool(ok[qi]):
                assert int(ib[qi]) == adj[np.argmin(d[qi, adj])]


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="pallas TPU kernel")
class TestRingMinimaPallas:
    def test_matches_xla(self):
        q, r, ring, mask, R = _random_problem(Q=256, M=1024, R=16)
        got = nn_ring.ring_minima_pallas(q, r, ring, mask, R)
        want = nn_ring.ring_minima_xla(q, r, ring, mask, R)
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, rtol=1e-4)
