"""Streaming Pallas top-k kernel (ops/pallas/knn_stream.py) vs dense knn.

Interpreter mode on CPU (tests/conftest.py forces JAX_PLATFORMS=cpu); the
compiled TPU path is exercised by benchmarks/bench_scan_match.py under
COOPER_USE_PALLAS=1.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cooper_mapper_tpu.ops import neighbors
from cooper_mapper_tpu.ops.pallas.knn_stream import knn_pallas


def _problem(seed=0, Q=256, M=512, mask_frac=0.15):
    rng = np.random.RandomState(seed)
    q = rng.uniform(-10, 10, (Q, 3)).astype(np.float32)
    r = rng.uniform(-10, 10, (M, 3)).astype(np.float32)
    mask = rng.rand(M) > mask_frac
    return jnp.asarray(q), jnp.asarray(r), jnp.asarray(mask)


class TestKnnStream:
    def test_matches_dense_knn(self):
        q, r, mask = _problem(0)
        idx_d, d_d = neighbors.knn(q, r, mask, 5)
        idx_p, d_p = knn_pallas(q, r, mask, 5, tile_q=128, tile_m=128,
                                interpret=True)
        np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_d))
        np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_d),
                                   rtol=1e-5, atol=1e-4)

    def test_duplicates_across_tiles(self):
        # the same point repeated in several tiles: the top-k must list each
        # duplicate once (unique indices), ascending by index among ties
        q = jnp.asarray(np.tile([[1.0, 2.0, 3.0]], (128, 1)), jnp.float32)
        r = jnp.tile(jnp.asarray([[1.0, 2.0, 3.0]], jnp.float32), (384, 1))
        mask = jnp.ones(384, bool)
        idx_p, d_p = knn_pallas(q, r, mask, 5, tile_q=128, tile_m=128,
                                interpret=True)
        np.testing.assert_array_equal(np.asarray(idx_p[0]), [0, 1, 2, 3, 4])
        assert float(jnp.max(d_p)) < 1e-5

    def test_masked_points_never_selected(self):
        rng = np.random.RandomState(5)
        q, r, mask = _problem(5, Q=128, M=256, mask_frac=0.5)
        idx_p, d_p = knn_pallas(q, r, mask, 5, tile_q=128, tile_m=128,
                                interpret=True)
        m = np.asarray(mask)
        # every selected index with an in-gate distance must be valid
        sel_ok = np.asarray(d_p) < 25.0
        assert m[np.asarray(idx_p)[sel_ok]].all()
        idx_d, d_d = neighbors.knn(q, r, mask, 5)
        np.testing.assert_array_equal(np.asarray(idx_p)[sel_ok],
                                      np.asarray(idx_d)[sel_ok])

    def test_ascending_order(self):
        q, r, mask = _problem(2, Q=128, M=384)
        _, d_p = knn_pallas(q, r, mask, 5, tile_q=128, tile_m=128,
                            interpret=True)
        d = np.asarray(d_p)
        assert (np.diff(d, axis=-1) >= -1e-6).all()

    def test_vmap_batches_cleanly(self):
        qs, rs, ms = zip(*[_problem(seed=20 + s, Q=128, M=256)
                           for s in range(3)])
        qb, rb, mb = jnp.stack(qs), jnp.stack(rs), jnp.stack(ms)
        f = lambda q, r, m: knn_pallas(q, r, m, 5, tile_q=128, tile_m=128,
                                       interpret=True)
        idx_b, d_b = jax.vmap(f)(qb, rb, mb)
        for s in range(3):
            idx_d, d_d = neighbors.knn(qs[s], rs[s], ms[s], 5)
            np.testing.assert_array_equal(np.asarray(idx_b[s]),
                                          np.asarray(idx_d))


class TestDispatchPadding:
    """knn_search pads non-tile-divisible references internally (the round-4
    fix: falling back to the largest divisor tile cost 28-41% on chip)."""

    def test_odd_M_matches_dense(self, monkeypatch):
        monkeypatch.setenv("COOPER_PALLAS_INTERPRET", "1")
        for M in (5888, 1000, 130):   # 256-gran, odd, just-over-tile
            q, r, mask = _problem(seed=M, Q=128, M=128)
            rng = np.random.RandomState(M)
            r = jnp.asarray(rng.randn(M, 3) * 4, jnp.float32)
            mask = jnp.asarray(rng.rand(M) > 0.1)
            idx_p, d_p = neighbors.knn_search(q, r, mask, 5,
                                              backend="pallas")
            idx_d, d_d = neighbors.knn(q, r, mask, 5)
            np.testing.assert_array_equal(np.asarray(idx_p),
                                          np.asarray(idx_d), err_msg=str(M))
            # distances via the expansion vs the dense where-mask differ
            # at f32 rounding; compare only the real (non-sentinel) lanes
            dp, dd = np.asarray(d_p), np.asarray(d_d)
            real = dd < 1e11
            np.testing.assert_allclose(dp[real], dd[real],
                                       rtol=1e-5, atol=1e-4)

    def test_padded_indices_never_win(self, monkeypatch):
        # all-masked reference: every returned distance must be the BIG
        # sentinel class (>= 1e11), never a padded row's finite distance
        monkeypatch.setenv("COOPER_PALLAS_INTERPRET", "1")
        q, _, _ = _problem(seed=3, Q=128, M=128)
        r = jnp.zeros((300, 3), jnp.float32)
        mask = jnp.zeros(300, bool)
        _, d_p = neighbors.knn_search(q, r, mask, 5, backend="pallas")
        assert float(np.asarray(d_p).min()) >= 1e11


def test_v2_kernel_matches_v1_bitwise(monkeypatch):
    """The lex-threshold extraction kernel (default) selects bit-identically
    to the mask-and-rewrite baseline, including exact-tie duplicates and
    nearly-empty references."""
    from cooper_mapper_tpu.ops.pallas import knn_stream as ks

    rng = np.random.RandomState(3)
    for Q, M, nvalid in [(128, 512, 512), (128, 512, 60), (128, 256, 3)]:
        q = jnp.asarray(rng.randn(Q, 3), jnp.float32) * 5
        r = jnp.asarray(rng.randn(M, 3), jnp.float32) * 5
        r = r.at[5].set(r[17]).at[6].set(r[17])      # exact ties
        mask = jnp.arange(M) < nvalid
        monkeypatch.setenv("COOPER_KNN_KERNEL", "v1")
        i1, d1 = ks.knn_pallas(q, r, mask, k=5, tile_q=128, tile_m=256,
                               interpret=True)
        ks.knn_pallas.clear_cache()
        monkeypatch.setenv("COOPER_KNN_KERNEL", "v2")
        i2, d2 = ks.knn_pallas(q, r, mask, k=5, tile_q=128, tile_m=256,
                               interpret=True)
        ks.knn_pallas.clear_cache()
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
