"""Perfectly matched layer absorption profiles.

Parity with reference `src/pml.jl`. Setup-time array construction (not hot).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..dims import OneDim, ThreeDim, TwoDim


def build_pml(dim, width: float, scale: float):
    """Cubic-ramp PML profile sigma(x).

    OneDim  -> (nx,)  (reference `src/pml.jl:6-15`)
    TwoDim  -> (nx, ny) varying along x, constant along y; the y-direction
               profile is its transpose (used at `src/dynamics.jl:162-163`).
               (reference `src/pml.jl:21-29`)
    """
    if isinstance(dim, OneDim):
        x = jnp.abs(dim.x)
        start = jnp.minimum(x[0], x[-1]) - width
        ramp = jnp.clip(jnp.maximum(x - start, 0.0) / width, 0.0, 1.0)
        return ramp**3 * scale
    if isinstance(dim, TwoDim):
        x = jnp.abs(dim.x)
        pml_start = x[0] - width
        region = x > pml_start
        # reference normalizes by the min |x| inside the region, not pml_start
        xmin = jnp.min(jnp.where(region, x, jnp.inf))
        ramp = jnp.where(region, (x - xmin) / width, 0.0)
        pml_x = ramp**3 * scale
        return jnp.broadcast_to(pml_x[:, None], (dim.x.shape[0], dim.y.shape[0]))
    if isinstance(dim, ThreeDim):
        # 1D profile along x (broadcast per axis by the 3D dynamics);
        # same normalization as the 2D branch
        x = jnp.abs(dim.x)
        pml_start = x[0] - width
        region = x > pml_start
        xmin = jnp.min(jnp.where(region, x, jnp.inf))
        ramp = jnp.where(region, (x - xmin) / width, 0.0)
        return ramp**3 * scale
    raise TypeError(f"unsupported dim type {type(dim)}")
