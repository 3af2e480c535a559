"""Differentiable interpolation utilities.

TPU-native re-design of reference `src/utils.jl:20-97`:
  * `flatten_repeated_last_dim` — joins per-action trajectories that share
    endpoint frames into one contiguous sequence.
  * `linear_interp` / `LinearInterpolation` — mask-based, AD-friendly batched
    linear interpolation over time-keyed latent fields (used by the design
    encoder inside the latent rollout scan).

Layout: batch-leading, time/sequence axes explicit. The reference keys
`X: (knots, batch)` / `Y: (features, knots, batch)`; here `X: (B, K)`,
`Y: (B, K, E)`.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp


def flatten_repeated_last_dim(x: jax.Array) -> jax.Array:
    """Join K consecutive windows of length T that share endpoints.

    x: (..., K, T) where x[..., i, -1] == x[..., i+1, 0].
    Returns (..., T + (K-1)*(T-1)).
    Reference `src/utils.jl:20-35` (axes transposed: it is (T, K) there).
    """
    head = x[..., 0, :]
    tail = x[..., 1:, 1:]
    tail = tail.reshape(*tail.shape[:-2], tail.shape[-2] * tail.shape[-1])
    return jnp.concatenate([head, tail], axis=-1)


def linear_interp(X: jax.Array, Y: jax.Array, t: jax.Array) -> jax.Array:
    """Batched 1D linear interpolation, differentiable by construction.

    X: (B, K) strictly increasing knots; Y: (B, K, E); t: (B,).
    Returns (B, E). t is clamped into [X[:,0], X[:,-1]] — this diverges from
    the reference (`src/utils.jl:69-97`), which returns ZERO outside the
    knot range: under RK4 the k4 stage evaluates C at t + dt, which can
    overshoot the final knot by one float32 ulp (verified at the reference
    operating point for ~15% of window start times), silently zeroing the
    latent wavespeed for that stage. Clamping gives the intended endpoint
    value instead.
    """
    tb = jnp.clip(t[:, None], X[:, :1], X[:, -1:])
    l, r = X[:, :-1], X[:, 1:]
    final = (r == r[:, -1:]) & (r[:, -1:] == tb)
    mask = ((l <= tb) & (tb < r)) | final
    m = mask.astype(Y.dtype)
    x0 = jnp.sum(l * m, axis=1)
    y0 = jnp.einsum("bk,bke->be", m, Y[:, :-1, :])
    dX = r - l
    slope = (Y[:, 1:, :] - Y[:, :-1, :]) / jnp.where(dX == 0, 1.0, dX)[..., None]
    dydx = jnp.einsum("bk,bke->be", m, slope)
    return y0 + (tb[:, 0] - x0)[:, None] * dydx


def _register(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in dataclasses.fields(cls)], meta_fields=[]
    )
    return cls


@_register
@dataclass(frozen=True)
class LinearInterpolation:
    """Callable pytree: t (B,) -> (B, E) (reference `src/utils.jl:88-97`)."""

    X: jax.Array  # (B, K)
    Y: jax.Array  # (B, K, E)

    def __call__(self, t: jax.Array) -> jax.Array:
        return linear_interp(self.X, self.Y, t)


@_register
@dataclass(frozen=True)
class PolynomialInterpolation:
    """Lagrange-style polynomial interpolation over sequence knots
    (reference `src/utils.jl:43-67`; unused in the reference's main path but
    part of its public surface). X: (B, K) knots, Y: (B, K, E)."""

    X: jax.Array
    Y: jax.Array

    def __call__(self, t: jax.Array) -> jax.Array:
        X, Y = self.X, self.Y
        K = X.shape[1]
        eye = jnp.eye(K, dtype=Y.dtype)
        scale = jnp.max(jnp.abs(X), axis=1)[:, None, None]  # (B,1,1)
        # numerator: prod over j != k of (X_j - t)
        n = eye[None] + (1.0 - eye)[None] * (X[:, :, None] - t[:, None, None])
        numer = jnp.prod(n / scale + 1e-5, axis=1)  # (B, K)
        # d[b, j, k] = X[j] - X[k] (prod over j of (X_j - t)/(X_j - X_k))
        d = (X[:, :, None] - X[:, None, :]) + eye[None]
        denom = jnp.prod(d / scale + 1e-5, axis=1)  # (B, K)
        coef = numer / denom
        return jnp.einsum("bk,bke->be", coef, Y)


def evaluate_over_time(f, t: jax.Array) -> jax.Array:
    """Evaluate a batched time-callable over a full (B, T) time grid.

    Returns (B, T, E). Equivalent of reference `evaluate_over_time`
    (`src/model/pinn.jl:21-23`), vmapped over the time axis instead of a
    Julia comprehension.
    """
    return jax.vmap(f, in_axes=1, out_axes=1)(t)
