"""Gaussian bump builders (multi-source normal shapes).

Parity with reference `src/utils.jl:4-18`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def build_normal_1d(x: jax.Array, mu: jax.Array, sigma: jax.Array, a: jax.Array) -> jax.Array:
    """Sum of S 1D Gaussians over grid x (E,) -> (E,).

    mu, sigma, a: (S,). Reference `src/utils.jl:4-10`.
    """
    f = (1.0 / (sigma[None, :] * jnp.sqrt(2.0 * jnp.pi))) * a[None, :] * jnp.exp(
        -((x[:, None] - mu[None, :]) ** 2) / (2.0 * sigma[None, :] ** 2)
    )
    return jnp.sum(f, axis=1)


def build_normal_2d(grid: jax.Array, mu: jax.Array, sigma: jax.Array, a: jax.Array) -> jax.Array:
    """Sum of S 2D Gaussians over grid (nx, ny, 2) -> (nx, ny).

    mu: (S, 2); sigma, a: (S,). Reference `src/utils.jl:12-18`.
    """
    d2 = jnp.sum((grid[:, :, None, :] - mu[None, None, :, :]) ** 2, axis=-1)  # (nx, ny, S)
    f = (1.0 / (2.0 * jnp.pi * sigma**2))[None, None, :] * a[None, None, :] * jnp.exp(
        -d2 / (2.0 * sigma**2)[None, None, :]
    )
    return jnp.sum(f, axis=-1)


def build_normal(x: jax.Array, mu: jax.Array, sigma: jax.Array, a: jax.Array) -> jax.Array:
    """Dispatch on grid dimensionality like the reference's multiple dispatch."""
    if x.ndim == 1:
        return build_normal_1d(x, mu, sigma, a)
    if x.ndim == 3:
        return build_normal_2d(x, mu, sigma, a)
    raise ValueError(f"unsupported grid ndim {x.ndim}")
