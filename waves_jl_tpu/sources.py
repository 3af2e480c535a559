"""Wave sources.

TPU-native re-design of reference `src/sources.jl`. Sources are callable
pytrees `t -> field`; the mutable `RandomPosGaussianSource.reset!` becomes an
explicit `resample(key)` returning a new source (pure, key-threaded).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .utils.gaussians import build_normal
from .utils.trees import register_pytree_dataclass


@register_pytree_dataclass
@dataclass(frozen=True)
class NoSource:
    """Zero source (reference `src/sources.jl:7-8`)."""

    def __call__(self, t):
        return jnp.asarray(0.0, dtype=jnp.float32)


@register_pytree_dataclass
@dataclass(frozen=True)
class Source:
    """Static spatial shape modulated by sin(2 pi f t)
    (reference `src/sources.jl:10-23`).

    For scalar t: shape * sin(2 pi f t).
    For batched t (B,) with shape (B, ...): per-sample modulation (the
    reference's column-broadcast form, `src/sources.jl:21-23`).
    """

    shape: jax.Array
    freq: jax.Array

    def __call__(self, t):
        s = jnp.sin(2.0 * jnp.pi * t * self.freq)
        if jnp.ndim(t) == 0:
            return self.shape * s
        return self.shape * s.reshape(s.shape + (1,) * (self.shape.ndim - s.ndim))


@register_pytree_dataclass
@dataclass(frozen=True)
class GaussianSource:
    """Gaussian bump source whose position resamples uniformly in
    [mu_low, mu_high] on reset (reference `RandomPosGaussianSource`,
    `src/sources.jl:25-69`). Pure: `resample(key)` returns a new source.
    """

    grid: jax.Array  # (nx, ny, 2) or (E,)
    mu_low: jax.Array  # (S, 2) or (S,)
    mu_high: jax.Array
    sigma: jax.Array  # (S,)
    a: jax.Array  # (S,)
    shape: jax.Array  # current rasterized shape
    freq: jax.Array

    @classmethod
    def create(cls, grid, mu_low, mu_high, sigma, a, freq):
        shape = build_normal(grid, mu_high, sigma, a)
        return cls(
            grid=grid,
            mu_low=jnp.asarray(mu_low, jnp.float32),
            mu_high=jnp.asarray(mu_high, jnp.float32),
            sigma=jnp.asarray(sigma, jnp.float32),
            a=jnp.asarray(a, jnp.float32),
            shape=shape,
            freq=jnp.asarray(freq, jnp.float32),
        )

    def resample(self, key: jax.Array) -> "GaussianSource":
        eps = jax.random.uniform(key, self.mu_low.shape, self.mu_low.dtype)
        mu = (self.mu_high - self.mu_low) * eps + self.mu_low
        shape = build_normal(self.grid, mu, self.sigma, self.a)
        return GaussianSource(
            self.grid, self.mu_low, self.mu_high, self.sigma, self.a, shape, self.freq
        )

    def __call__(self, t):
        s = jnp.sin(2.0 * jnp.pi * t * self.freq)
        if jnp.ndim(t) == 0:
            return self.shape * s
        return self.shape * s.reshape(s.shape + (1,) * (self.shape.ndim - s.ndim))
