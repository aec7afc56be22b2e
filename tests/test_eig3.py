"""Closed-form 3x3 eigen-analysis (ops/eig3.py) vs numpy.linalg.eigh."""

import jax.numpy as jnp
import numpy as np

from cooper_mapper_tpu.ops import eig3


def _comps(A):
    return (A[..., 0, 0], A[..., 0, 1], A[..., 0, 2],
            A[..., 1, 1], A[..., 1, 2], A[..., 2, 2])


def _random_sym(rng, n, scale=1.0):
    B = rng.randn(n, 3, 3).astype(np.float64) * scale
    return (B + np.swapaxes(B, -1, -2)) / 2


class TestEigvalsh3:
    def test_matches_numpy_random(self):
        rng = np.random.RandomState(0)
        A = _random_sym(rng, 512)
        l0, l1, l2 = eig3.eigvalsh3(*[jnp.asarray(c) for c in _comps(A)])
        ref = np.linalg.eigvalsh(A)
        got = np.stack([np.asarray(l0), np.asarray(l1), np.asarray(l2)], -1)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_covariance_scale(self):
        # PSD covariances at point-cloud scale (the classify/fit consumers)
        rng = np.random.RandomState(1)
        pts = rng.randn(256, 6, 3) * np.array([2.0, 0.3, 0.02])
        a = pts - pts.mean(1, keepdims=True)
        cov = np.einsum("nki,nkj->nij", a, a) / 6
        l0, l1, l2 = eig3.eigvalsh3(*[jnp.asarray(c) for c in _comps(cov)])
        ref = np.linalg.eigvalsh(cov)
        got = np.stack([np.asarray(l0), np.asarray(l1), np.asarray(l2)], -1)
        # f32 analytic method: absolute error scales with ||A|| (~4 here),
        # so near-zero eigenvalues carry ~1e-4 absolute fuzz — the classify
        # and fit gates that consume them are ratio checks backed by
        # explicit point-distance inlier tests
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=5e-4)

    def test_degenerate_isotropic_and_rank1(self):
        A = np.zeros((3, 3, 3))
        A[0] = np.eye(3) * 2.5                      # isotropic
        v = np.array([1.0, 2.0, -1.0])
        A[1] = np.outer(v, v)                       # rank 1
        A[2] = np.diag([1.0, 1.0, 4.0])             # repeated eigenvalue
        l0, l1, l2 = eig3.eigvalsh3(*[jnp.asarray(c) for c in _comps(A)])
        ref = np.linalg.eigvalsh(A)
        got = np.stack([np.asarray(l0), np.asarray(l1), np.asarray(l2)], -1)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


class TestPrincipalEvec3:
    def test_matches_numpy_up_to_sign(self):
        rng = np.random.RandomState(2)
        A = _random_sym(rng, 256)
        comps = [jnp.asarray(c) for c in _comps(A)]
        _, _, l2 = eig3.eigvalsh3(*comps)
        vx, vy, vz = eig3.principal_evec3(*comps, l2)
        got = np.stack([np.asarray(vx), np.asarray(vy), np.asarray(vz)], -1)
        w, V = np.linalg.eigh(A)
        ref = V[..., :, 2]
        dot = np.abs(np.sum(got * ref, -1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-4)

    def test_line_cloud_direction(self):
        # 5 collinear points + noise: principal direction == the line
        rng = np.random.RandomState(3)
        t = np.linspace(-1, 1, 5)[None, :, None]
        d = rng.randn(128, 1, 3)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        pts = t * d + 0.001 * rng.randn(128, 5, 3)
        a = pts - pts.mean(1, keepdims=True)
        cov = np.einsum("nki,nkj->nij", a, a) / 5
        comps = [jnp.asarray(c) for c in _comps(cov)]
        _, _, l2 = eig3.eigvalsh3(*comps)
        vx, vy, vz = eig3.principal_evec3(*comps, l2)
        got = np.stack([np.asarray(vx), np.asarray(vy), np.asarray(vz)], -1)
        dot = np.abs(np.sum(got * d[:, 0], -1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-3)

    def test_isotropic_returns_unit(self):
        comps = [jnp.asarray(x) for x in
                 (jnp.ones(4) * 2, jnp.zeros(4), jnp.zeros(4),
                  jnp.ones(4) * 2, jnp.zeros(4), jnp.ones(4) * 2)]
        vx, vy, vz = eig3.principal_evec3(*comps, jnp.full(4, 2.0))
        n = np.asarray(vx) ** 2 + np.asarray(vy) ** 2 + np.asarray(vz) ** 2
        np.testing.assert_allclose(n, 1.0, atol=1e-6)
