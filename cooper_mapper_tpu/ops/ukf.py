"""Generic Unscented Kalman Filter, batched.

Re-design of ``kf::UnscentedKalmanFilterX<T, System>``
(/root/reference/L_SLAM/src/kf_fusion/kf/unscented_kalman_filter.hpp:16-244):
sigma points from the Cholesky factor of (n+lambda)P (:204-217, lambda=1),
unscented predict through the process model plus additive process noise
(:71-98), and the *augmented-state* correct — state stacked with measurement
noise, expected measurements through the observation model, cross-covariance
Kalman gain (:104-148).

The system models (f, h) are passed as callables; everything vmaps over a
leading batch dimension, so thousands of independent filters run in one
kernel launch (the reference runs exactly one).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class UKFState:
    mean: jax.Array  # [..., N]
    cov: jax.Array   # [..., N, N]


def _safe_cholesky(P, jitter=1e-9):
    n = P.shape[-1]
    eye = jnp.eye(n, dtype=P.dtype)
    # symmetrize + escalating jitter keeps the factor finite (the reference's
    # ensurePositiveFinite is disabled; we keep a minimal guard instead)
    P = 0.5 * (P + jnp.swapaxes(P, -1, -2))
    L = jnp.linalg.cholesky(P + jitter * eye)
    bad = jnp.any(jnp.isnan(L), axis=(-2, -1), keepdims=True)
    L2 = jnp.linalg.cholesky(P + 1e-4 * eye)
    return jnp.where(bad, L2, L)


def sigma_points(mean, cov, lam=1.0):
    """[..., N] , [..., N, N] -> points [..., 2N+1, N], weights [2N+1]."""
    n = mean.shape[-1]
    L = _safe_cholesky((n + lam) * cov)
    cols = jnp.swapaxes(L, -1, -2)              # rows are scaled sqrt columns
    pts = jnp.concatenate(
        [mean[..., None, :], mean[..., None, :] + cols, mean[..., None, :] - cols],
        axis=-2,
    )
    w0 = lam / (n + lam)
    wi = 1.0 / (2.0 * (n + lam))
    weights = jnp.concatenate(
        [jnp.array([w0], mean.dtype), jnp.full((2 * n,), wi, mean.dtype)]
    )
    return pts, weights


def unscented_moments(pts, weights):
    mean = jnp.einsum("s,...sn->...n", weights, pts)
    d = pts - mean[..., None, :]
    cov = jnp.einsum("s,...sn,...sm->...nm", weights, d, d)
    return mean, cov


def predict(state: UKFState, f: Callable, control, Q, lam=1.0) -> UKFState:
    """Unscented predict: x' = f(x, control) for each sigma point, + Q."""
    pts, w = sigma_points(state.mean, state.cov, lam)
    pts_f = f(pts, control)
    mean, cov = unscented_moments(pts_f, w)
    return UKFState(mean, cov + Q)


def correct(state: UKFState, h: Callable, measurement, R, lam=1.0) -> UKFState:
    """Augmented-state unscented correct (reference :104-148).

    The state is extended with K measurement-noise components (zero mean,
    covariance R); sigma points of the extended state run through h with the
    noise added to the expected measurement.
    """
    n = state.mean.shape[-1]
    k = measurement.shape[-1]
    batch = state.mean.shape[:-1]

    ext_mean = jnp.concatenate([state.mean, jnp.zeros(batch + (k,), state.mean.dtype)], -1)
    ext_cov = jnp.zeros(batch + (n + k, n + k), state.mean.dtype)
    ext_cov = ext_cov.at[..., :n, :n].set(state.cov)
    ext_cov = ext_cov.at[..., n:, n:].set(jnp.broadcast_to(R, batch + (k, k)))

    pts, w = sigma_points(ext_mean, ext_cov, lam)
    x_pts = pts[..., :n]
    noise = pts[..., n:]
    z_pts = h(x_pts) + noise

    z_mean = jnp.einsum("s,...sk->...k", w, z_pts)
    dz = z_pts - z_mean[..., None, :]
    dx = x_pts - jnp.einsum("s,...sn->...n", w, x_pts)[..., None, :]
    S = jnp.einsum("s,...sk,...sl->...kl", w, dz, dz)
    C = jnp.einsum("s,...sn,...sk->...nk", w, dx, dz)

    K = jnp.linalg.solve(
        jnp.swapaxes(S, -1, -2), jnp.swapaxes(C, -1, -2)
    )
    K = jnp.swapaxes(K, -1, -2)                  # C S^-1
    innov = measurement - z_mean
    mean = state.mean + jnp.einsum("...nk,...k->...n", K, innov)
    cov = state.cov - K @ S @ jnp.swapaxes(K, -1, -2)
    return UKFState(mean, cov)
