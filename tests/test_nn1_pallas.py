"""Streaming Pallas 1-NN kernel (ops/pallas/nn1.py) vs the dense race.

Runs the kernel in interpreter mode on CPU (tests/conftest.py forces
JAX_PLATFORMS=cpu); the compiled TPU path is exercised by bench.py under
COOPER_USE_PALLAS=1.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cooper_mapper_tpu.ops import neighbors
from cooper_mapper_tpu.ops.pallas import nn1 as nn1_mod


def _problem(seed=0, Q=256, M=512, mask_frac=0.15):
    rng = np.random.RandomState(seed)
    q = rng.uniform(-10, 10, (Q, 3)).astype(np.float32)
    r = rng.uniform(-10, 10, (M, 3)).astype(np.float32)
    mask = rng.rand(M) > mask_frac
    return jnp.asarray(q), jnp.asarray(r), jnp.asarray(mask)


def _ring_cloud(rng, M, R, mask_frac=0.1):
    from cooper_mapper_tpu.utils.cloud import Cloud

    xyz = rng.uniform(-8, 8, (M, 3)).astype(np.float32)
    ring = rng.randint(0, R, M).astype(np.int32)
    mask = rng.rand(M) > mask_frac
    return Cloud(
        xyz=jnp.asarray(xyz), mask=jnp.asarray(mask),
        ring=jnp.asarray(ring), rel_time=jnp.zeros(M, jnp.float32),
    )


class TestNN1Pallas:
    def test_matches_dense_race(self):
        q, r, mask = _problem(0)
        ia_d, da_d = neighbors.nn1(q, r, mask)
        ia_p, da_p = nn1_mod.nn1_pallas(q, r, mask, tile_q=128, tile_m=128,
                                        interpret=True)
        np.testing.assert_array_equal(np.asarray(ia_p), np.asarray(ia_d))
        np.testing.assert_allclose(np.asarray(da_p), np.asarray(da_d),
                                   rtol=1e-5, atol=1e-4)

    def test_tie_breaks_toward_smaller_index(self):
        # duplicate reference points across tile boundaries: winner must be
        # the smaller index, matching jnp.argmin over the full tile
        q = jnp.asarray([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]] * 64, jnp.float32)
        r = jnp.tile(jnp.asarray([[1.0, 2.0, 3.0]], jnp.float32), (256, 1))
        mask = jnp.ones(256, bool)
        ia_p, _ = nn1_mod.nn1_pallas(q, r, mask, tile_q=128, tile_m=128,
                                     interpret=True)
        assert int(ia_p[0]) == 0

    def test_masked_points_never_win_within_gate(self):
        # the single nearest point is masked out -> the kernel must pick the
        # nearest VALID point, and its distance must match the dense race
        rng = np.random.RandomState(7)
        q = jnp.asarray(rng.uniform(-5, 5, (128, 3)), jnp.float32)
        r = jnp.concatenate([q[:1] + 0.01, jnp.asarray(
            rng.uniform(-5, 5, (127, 3)), jnp.float32)])
        mask = jnp.ones(128, bool).at[0].set(False)
        ia_d, da_d = neighbors.nn1(q, r, mask)
        ia_p, da_p = nn1_mod.nn1_pallas(q, r, mask, tile_q=128, tile_m=128,
                                        interpret=True)
        np.testing.assert_array_equal(np.asarray(ia_p), np.asarray(ia_d))
        np.testing.assert_allclose(np.asarray(da_p), np.asarray(da_d),
                                   rtol=1e-5, atol=1e-4)

    def test_masked_races_match_dense_searches(self):
        # The ring-constrained B/C races (nn1_masked_pallas) must reproduce
        # the dense searches' selections for every gated-in query: 'adj' vs
        # corner_pairs' race B, 'same'/'adj' vs surf_triples' races B/C.
        rng = np.random.RandomState(3)
        Q, M, R = 128, 256, 16
        q = jnp.asarray(rng.uniform(-8, 8, (Q, 3)), jnp.float32)
        ref = _ring_cloud(rng, M, R)
        max_sq = 25.0

        ia_d, ib_d, ic_d, ok_d = neighbors.surf_triples(
            q, ref, max_sq, ring_span=2.5, n_rings=R
        )
        ia_p, da_p = nn1_mod.nn1_pallas(q, ref.xyz, ref.mask, tile_q=128,
                                        tile_m=128, interpret=True)
        ring_a = ref.ring[ia_p]
        ib_p, db_p = nn1_mod.nn1_masked_pallas(
            q, ring_a, ia_p, ref.xyz, ref.ring, ref.mask, "same", 2.5,
            tile_q=128, tile_m=128, interpret=True,
        )
        ic_p, dc_p = nn1_mod.nn1_masked_pallas(
            q, ring_a, ia_p, ref.xyz, ref.ring, ref.mask, "adj", 2.5,
            tile_q=128, tile_m=128, interpret=True,
        )
        ok_p = (da_p < max_sq) & (db_p < max_sq) & (dc_p < max_sq)
        np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_d))
        sel = np.asarray(ok_d)
        np.testing.assert_array_equal(np.asarray(ia_p)[sel], np.asarray(ia_d)[sel])
        np.testing.assert_array_equal(np.asarray(ib_p)[sel], np.asarray(ib_d)[sel])
        np.testing.assert_array_equal(np.asarray(ic_p)[sel], np.asarray(ic_d)[sel])

        ia_c, ib_c, ok_c = neighbors.corner_pairs(
            q, ref, max_sq, ring_span=2.5, n_rings=R
        )
        ok_cp = (da_p < max_sq) & (dc_p < max_sq)  # corner B == 'adj' race
        np.testing.assert_array_equal(np.asarray(ok_cp), np.asarray(ok_c))
        sel = np.asarray(ok_c)
        np.testing.assert_array_equal(np.asarray(ia_p)[sel], np.asarray(ia_c)[sel])
        np.testing.assert_array_equal(np.asarray(ic_p)[sel], np.asarray(ib_c)[sel])

    def test_masked_race_excludes_a_itself(self):
        # 'same' mode must never return A itself even when A is duplicated
        # in the reference (the dense race excludes by index, not distance)
        q = jnp.asarray(np.tile([[1.0, 0.0, 0.0]], (128, 1)), jnp.float32)
        xyz = np.zeros((128, 3), np.float32)
        xyz[0] = [1.0, 0.0, 0.0]   # exact hit, ring 0
        xyz[1] = [1.0, 0.0, 0.0]   # duplicate, ring 0
        xyz[2:] = np.random.RandomState(0).uniform(2, 9, (126, 3))
        from cooper_mapper_tpu.utils.cloud import Cloud
        ref = Cloud(
            xyz=jnp.asarray(xyz), mask=jnp.ones(128, bool),
            ring=jnp.zeros(128, jnp.int32),
            rel_time=jnp.zeros(128, jnp.float32),
        )
        ia, _ = nn1_mod.nn1_pallas(q, ref.xyz, ref.mask, tile_q=128,
                                   tile_m=128, interpret=True)
        ib, db = nn1_mod.nn1_masked_pallas(
            q, ref.ring[ia], ia, ref.xyz, ref.ring, ref.mask, "same", 2.5,
            tile_q=128, tile_m=128, interpret=True,
        )
        assert int(ia[0]) == 0
        assert int(ib[0]) == 1 and float(db[0]) < 1e-6

    def test_fused_races_match_dense_searches(self):
        # the fused one-tile kernel (fused_races_pallas) must reproduce the
        # dense surf_triples / corner_pairs selections for gated-in queries,
        # including the in-kernel extraction of A's ring
        rng = np.random.RandomState(11)
        Q, M, R = 128, 256, 16
        q = jnp.asarray(rng.uniform(-8, 8, (Q, 3)), jnp.float32)
        ref = _ring_cloud(rng, M, R)
        max_sq = 25.0

        ia_d, ib_d, ic_d, ok_d = neighbors.surf_triples(
            q, ref, max_sq, ring_span=2.5, n_rings=R
        )
        ia_p, da_p, ib_p, db_p, ic_p, dc_p = nn1_mod.fused_races_pallas(
            q, ref.xyz, ref.ring, ref.mask, with_same=True, ring_span=2.5,
            tile_q=128, interpret=True,
        )
        ok_p = (da_p < max_sq) & (db_p < max_sq) & (dc_p < max_sq)
        np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_d))
        sel = np.asarray(ok_d)
        np.testing.assert_array_equal(np.asarray(ia_p)[sel], np.asarray(ia_d)[sel])
        np.testing.assert_array_equal(np.asarray(ib_p)[sel], np.asarray(ib_d)[sel])
        np.testing.assert_array_equal(np.asarray(ic_p)[sel], np.asarray(ic_d)[sel])

        ia_c, ib_c, ok_c = neighbors.corner_pairs(
            q, ref, max_sq, ring_span=2.5, n_rings=R
        )
        ia_f, da_f, ib_f, db_f = nn1_mod.fused_races_pallas(
            q, ref.xyz, ref.ring, ref.mask, with_same=False, ring_span=2.5,
            tile_q=128, interpret=True,
        )
        ok_f = (da_f < max_sq) & (db_f < max_sq)
        np.testing.assert_array_equal(np.asarray(ok_f), np.asarray(ok_c))
        sel = np.asarray(ok_c)
        np.testing.assert_array_equal(np.asarray(ia_f)[sel], np.asarray(ia_c)[sel])
        np.testing.assert_array_equal(np.asarray(ib_f)[sel], np.asarray(ib_c)[sel])

    def test_bc_races_match_masked_kernels(self):
        # the combined B/C kernel must reproduce the two nn1_masked_pallas
        # calls exactly (same masks, same tie-breaking) on every query
        rng = np.random.RandomState(5)
        Q, M, R = 128, 256, 16
        q = jnp.asarray(rng.uniform(-8, 8, (Q, 3)), jnp.float32)
        ref = _ring_cloud(rng, M, R)
        ia, da = nn1_mod.nn1_pallas(q, ref.xyz, ref.mask, tile_q=128,
                                    tile_m=128, interpret=True)
        ring_a = ref.ring[ia]
        ib_m, db_m = nn1_mod.nn1_masked_pallas(
            q, ring_a, ia, ref.xyz, ref.ring, ref.mask, "same", 2.5,
            tile_q=128, tile_m=128, interpret=True,
        )
        ic_m, dc_m = nn1_mod.nn1_masked_pallas(
            q, ring_a, ia, ref.xyz, ref.ring, ref.mask, "adj", 2.5,
            tile_q=128, tile_m=128, interpret=True,
        )
        ib, db, ic, dc = nn1_mod.bc_races_pallas(
            q, ring_a, ia, ref.xyz, ref.ring, ref.mask, 2.5,
            tile_q=128, tile_m=128, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(ib), np.asarray(ib_m))
        np.testing.assert_array_equal(np.asarray(ic), np.asarray(ic_m))
        np.testing.assert_allclose(np.asarray(db), np.asarray(db_m),
                                   rtol=1e-6, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dc), np.asarray(dc_m),
                                   rtol=1e-6, atol=1e-5)

    def test_fused_races_exclude_a_itself(self):
        # fused 'same' race must never return A even when A is duplicated
        q = jnp.asarray(np.tile([[1.0, 0.0, 0.0]], (128, 1)), jnp.float32)
        xyz = np.zeros((128, 3), np.float32)
        xyz[0] = [1.0, 0.0, 0.0]
        xyz[1] = [1.0, 0.0, 0.0]
        xyz[2:] = np.random.RandomState(0).uniform(2, 9, (126, 3))
        from cooper_mapper_tpu.utils.cloud import Cloud
        ref = Cloud(
            xyz=jnp.asarray(xyz), mask=jnp.ones(128, bool),
            ring=jnp.zeros(128, jnp.int32),
            rel_time=jnp.zeros(128, jnp.float32),
        )
        ia, _, ib, db, _, _ = nn1_mod.fused_races_pallas(
            q, ref.xyz, ref.ring, ref.mask, with_same=True, ring_span=2.5,
            tile_q=128, interpret=True,
        )
        assert int(ia[0]) == 0
        assert int(ib[0]) == 1 and float(db[0]) < 1e-6

    def test_dispatch_plumbing_interpret_mode(self, monkeypatch):
        # COOPER_PALLAS_INTERPRET=1 routes the real dispatch (corner_pairs /
        # surf_triples / knn_search with COOPER_USE_PALLAS set) through the
        # kernels in interpreter mode on CPU — argument wiring, return
        # ordering and tile choices are then covered by the suite instead of
        # only by on-chip runs.  All three dispatch variants must agree with
        # the dense searches.
        rng = np.random.RandomState(21)
        Q, M, R = 128, 256, 16
        q = jnp.asarray(rng.uniform(-8, 8, (Q, 3)), jnp.float32)
        ref = _ring_cloud(rng, M, R)
        max_sq = 25.0

        ia_d, ib_d, ic_d, ok_d = neighbors.surf_triples(
            q, ref, max_sq, ring_span=2.5, n_rings=R
        )
        ia_c, ib_c, ok_c = neighbors.corner_pairs(
            q, ref, max_sq, ring_span=2.5, n_rings=R
        )
        idx_d, d_d = neighbors.knn(q, ref.xyz, ref.mask, 5)

        monkeypatch.setenv("COOPER_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("COOPER_USE_PALLAS", "1")
        variants = [{}, {"COOPER_PALLAS_BC": "1"},
                    {"COOPER_PALLAS_FUSED": "1"}]
        for extra in variants:
            for k, v in extra.items():
                monkeypatch.setenv(k, v)
            ia_p, ib_p, ic_p, ok_p = neighbors.surf_triples(
                q, ref, max_sq, ring_span=2.5, n_rings=R
            )
            np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_d),
                                          err_msg=str(extra))
            sel = np.asarray(ok_d)
            for got, want in ((ia_p, ia_d), (ib_p, ib_d), (ic_p, ic_d)):
                np.testing.assert_array_equal(
                    np.asarray(got)[sel], np.asarray(want)[sel],
                    err_msg=str(extra))
            ia_cp, ib_cp, ok_cp = neighbors.corner_pairs(
                q, ref, max_sq, ring_span=2.5, n_rings=R
            )
            np.testing.assert_array_equal(np.asarray(ok_cp), np.asarray(ok_c))
            sel = np.asarray(ok_c)
            np.testing.assert_array_equal(np.asarray(ia_cp)[sel],
                                          np.asarray(ia_c)[sel])
            np.testing.assert_array_equal(np.asarray(ib_cp)[sel],
                                          np.asarray(ib_c)[sel])
            for k in extra:
                monkeypatch.delenv(k)

        idx_p, d_p = neighbors.knn_search(q, ref.xyz, ref.mask, 5)
        np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_d))
        np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_d),
                                   rtol=1e-5, atol=1e-4)

    def test_vmap_batches_cleanly(self):
        # the batched odometry solve vmaps the search over sweep problems
        qs, rs, ms = [], [], []
        for s in range(3):
            q, r, mask = _problem(seed=10 + s)
            qs.append(q); rs.append(r); ms.append(mask)
        qb, rb, mb = jnp.stack(qs), jnp.stack(rs), jnp.stack(ms)
        f = lambda q, r, m: nn1_mod.nn1_pallas(q, r, m, tile_q=128,
                                               tile_m=128, interpret=True)
        ia_b, da_b = jax.vmap(f)(qb, rb, mb)
        for s in range(3):
            ia_d, da_d = neighbors.nn1(qs[s], rs[s], ms[s])
            np.testing.assert_array_equal(np.asarray(ia_b[s]), np.asarray(ia_d))
            np.testing.assert_allclose(np.asarray(da_b[s]), np.asarray(da_d),
                                       rtol=1e-5, atol=1e-4)
