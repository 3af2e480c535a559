"""Field metrics: masks, displacement, energy, flux.

Parity with reference `src/metrics.jl`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..dims import TwoDim, build_grid
from .fd import laplacian_matrix


def circle_mask(dim: TwoDim, radius: float) -> jax.Array:
    """Boolean mask of points within `radius` of the origin
    (reference `src/metrics.jl:7-10`)."""
    g = build_grid(dim)
    return jnp.sum(g**2, axis=-1) < radius**2


def displacement(wave: jax.Array) -> jax.Array:
    """First field of a channels-first wave state (reference
    `src/metrics.jl:17-19` takes the *last*-axis field; our layout leads
    with channels)."""
    return wave[0]


def energy(u: jax.Array) -> jax.Array:
    """Pointwise energy u^2 (reference `src/metrics.jl:24-26`)."""
    return u**2


def flux(u: jax.Array, laplace: jax.Array, mask: jax.Array) -> jax.Array:
    """Flux of scalar field through the masked region via the Laplacian
    (reference `src/metrics.jl:31-33`): sum over mask of (Lu + (Lu')')."""
    f = laplace @ u + (laplace @ u.T).T
    return jnp.sum(f * mask)


__all__ = ["circle_mask", "displacement", "energy", "flux", "laplacian_matrix"]
