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


class TestPlaneVariants:
    """Component-plane fit variants must reproduce the array variants."""

    def _nbs(self, seed=0, n=64, k=5):
        rng = np.random.RandomState(seed)
        base = rng.randn(n, 1, 3) * 3
        d = rng.randn(n, 1, 3)
        t = np.linspace(-0.5, 0.5, k)[None, :, None]
        lines = base + t * d + 0.01 * rng.randn(n, k, 3)
        planes_n = rng.randn(n, 1, 3)
        planes_n /= np.linalg.norm(planes_n, axis=-1, keepdims=True)
        u = np.cross(planes_n, np.array([1.0, 0.3, -0.5]))
        u /= np.linalg.norm(u, axis=-1, keepdims=True)
        v = np.cross(planes_n, u)
        planes = base + rng.randn(n, k, 1) * u + rng.randn(n, k, 1) * v \
            + 0.01 * rng.randn(n, k, 3)
        messy = rng.randn(n, k, 3) * 2
        pts = np.where(rng.rand(n, 1, 1) < 0.33, lines,
                       np.where(rng.rand(n, 1, 1) < 0.5, planes, messy))
        return jnp.asarray(pts, jnp.float32)

    @staticmethod
    def _split(pts):
        k = pts.shape[-2]
        return ([pts[..., j, 0] for j in range(k)],
                [pts[..., j, 1] for j in range(k)],
                [pts[..., j, 2] for j in range(k)])

    def test_fit_line_planes_matches(self):
        pts = self._nbs(1)
        A0, B0, v0 = residuals.fit_line(pts)
        px, py, pz = self._split(pts)
        A1, B1, v1 = residuals.fit_line_planes(px, py, pz)
        agree = np.mean(np.asarray(v0) == np.asarray(v1))
        assert agree > 0.95, agree  # eigh vs closed-form f32 fuzz at gates
        both = np.asarray(v0) & np.asarray(v1)
        # endpoints match up to the A/B sign convention of the direction
        same = np.linalg.norm(np.asarray(A0 - A1), axis=-1)[both]
        swap = np.linalg.norm(np.asarray(A0 - B1), axis=-1)[both]
        np.testing.assert_array_less(np.minimum(same, swap), 1e-2)

    def test_fit_plane_planes_matches(self):
        # mixed (lines/planes/messy) set: the validity decisions must agree
        pts = self._nbs(2)
        _, v0 = residuals.fit_plane(pts)
        px, py, pz = self._split(pts)
        _, v1 = residuals.fit_plane_planes(px, py, pz)
        agree = np.mean(np.asarray(v0) == np.asarray(v1))
        assert agree > 0.95, agree

    def test_fit_plane_planes_params_on_clean_planes(self):
        # well-conditioned planar sets: parameters must match numerically
        # (on gated-out degenerate sets the plane is underdetermined and the
        # LU vs adjugate solves legitimately disagree)
        rng = np.random.RandomState(5)
        n, k = 64, 5
        base = rng.randn(n, 1, 3) * 3
        pn = rng.randn(n, 1, 3)
        pn /= np.linalg.norm(pn, axis=-1, keepdims=True)
        u = np.cross(pn, np.array([1.0, 0.3, -0.5]))
        u /= np.linalg.norm(u, axis=-1, keepdims=True)
        v = np.cross(pn, u)
        pts = jnp.asarray(
            base + rng.randn(n, k, 1) * u + rng.randn(n, k, 1) * v
            + 0.01 * rng.randn(n, k, 3), jnp.float32)
        p0, v0 = residuals.fit_plane(pts)
        px, py, pz = self._split(pts)
        p1, v1 = residuals.fit_plane_planes(px, py, pz)
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
        np.testing.assert_allclose(np.asarray(p0), np.asarray(p1),
                                   rtol=1e-2, atol=5e-3)
