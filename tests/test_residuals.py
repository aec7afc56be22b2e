import jax
import jax.numpy as jnp
import numpy as np

from cooper_mapper_tpu.ops import residuals


KEY = jax.random.PRNGKey(42)


class TestLinePointDistance:
    def test_known_distance(self):
        A = jnp.array([[0.0, 0, 0]])
        B = jnp.array([[1.0, 0, 0]])
        X = jnp.array([[0.5, 2.0, 0]])
        d, u = residuals.line_point_distance(A, B, X)
        np.testing.assert_allclose(d, [2.0], atol=1e-6)
        # direction is the gradient of distance wrt X (points away from line)
        np.testing.assert_allclose(u, [[0.0, 1.0, 0.0]], atol=1e-6)

    def test_direction_is_distance_gradient(self):
        ka, kb, kx = jax.random.split(KEY, 3)
        A = jax.random.normal(ka, (8, 3))
        B = A + jax.random.normal(kb, (8, 3))
        X = jax.random.normal(kx, (8, 3)) * 2

        d, u = residuals.line_point_distance(A, B, X)
        g = jax.vmap(jax.grad(lambda x, a, b: residuals.line_point_distance(a, b, x)[0]))(
            X, A, B
        )
        np.testing.assert_allclose(u, g, atol=1e-4)
        # unit norm
        np.testing.assert_allclose(jnp.linalg.norm(u, axis=-1), jnp.ones(8), atol=1e-5)

    def test_point_on_line(self):
        A = jnp.array([[0.0, 0, 0]])
        B = jnp.array([[1.0, 0, 0]])
        X = jnp.array([[0.3, 0.0, 0]])
        d, _ = residuals.line_point_distance(A, B, X)
        np.testing.assert_allclose(d, [0.0], atol=1e-6)


class TestSurfacePointDistance:
    def test_known_plane(self):
        A = jnp.array([[0.0, 0, 0]])
        B = jnp.array([[1.0, 0, 0]])
        C = jnp.array([[0.0, 0, 1]])
        X = jnp.array([[0.2, -3.0, 0.2]])
        d, n = residuals.surface_point_distance(A, B, C, X)
        np.testing.assert_allclose(d, [3.0], atol=1e-6)
        # normal oriented toward X
        np.testing.assert_allclose(n, [[0.0, -1.0, 0.0]], atol=1e-6)

    def test_normal_is_distance_gradient(self):
        keys = jax.random.split(KEY, 4)
        A, B, C = (jax.random.normal(k, (8, 3)) for k in keys[:3])
        X = jax.random.normal(keys[3], (8, 3)) * 3
        d, n = residuals.surface_point_distance(A, B, C, X)
        g = jax.vmap(
            jax.grad(lambda x, a, b, c: residuals.surface_point_distance(a, b, c, x)[0])
        )(X, A, B, C)
        np.testing.assert_allclose(n, g, atol=1e-4)


class TestFitLine:
    def test_collinear(self):
        t = jnp.linspace(0, 1, 5)[:, None]
        pts = (jnp.array([[1.0, 2.0, 3.0]]) * t + jnp.array([[0.5, 0, -1]]))[None]
        A, B, valid = residuals.fit_line(pts)
        assert bool(valid[0])
        d, _ = residuals.line_point_distance(A, B, pts[0, 2:3])
        np.testing.assert_allclose(d, [0.0], atol=1e-5)

    def test_scattered_rejected(self):
        pts = jax.random.normal(KEY, (1, 5, 3))
        _, _, valid = residuals.fit_line(pts, eig_ratio=5.0)
        assert not bool(valid[0])


class TestFitPlane:
    def test_planar_points(self):
        k1, k2 = jax.random.split(KEY)
        uv = jax.random.normal(k1, (5, 2))
        pts = jnp.concatenate([uv, jnp.full((5, 1), 2.0)], -1)[None]  # z = 2
        plane, valid = residuals.fit_plane(pts)
        assert bool(valid[0])
        n = np.abs(np.array(plane[0, :3]))
        np.testing.assert_allclose(n, [0, 0, 1], atol=1e-4)
        np.testing.assert_allclose(abs(float(plane[0, 3])), 2.0, atol=1e-4)

    def test_nonplanar_rejected(self):
        pts = jax.random.normal(KEY, (1, 5, 3)) * 2
        _, valid = residuals.fit_plane(pts, max_dist=0.2)
        assert not bool(valid[0])

    def test_residual_sign_consistency(self):
        # surf_coeff_map signed distance matches plane equation
        uv = jax.random.normal(KEY, (5, 2))
        pts = jnp.concatenate([uv, jnp.zeros((5, 1))], -1)[None]
        plane, valid = residuals.fit_plane(pts)
        X = jnp.array([[0.0, 0.0, 0.7]])
        coeff, res, ok = residuals.surf_coeff_map(plane, X)
        assert abs(abs(float(res[0])) - 0.7 * (1 - 0.9 * 0.7 / np.sqrt(np.sqrt(0.49)))) < 0.2
        # gradient direction: moving X along +coeff increases |signed residual|
        signed0 = float(jnp.sum(plane[0, :3] * X[0]) + plane[0, 3])
        X2 = X + 0.01 * plane[None, 0, :3]
        signed1 = float(jnp.sum(plane[0, :3] * X2[0]) + plane[0, 3])
        assert signed1 > signed0
