"""Grid / discretization primitives.

TPU-native re-design of reference `src/dims.jl`. Dimensions are frozen
dataclasses registered as JAX pytrees so they pass freely through `jit`,
`vmap` and `scan`. All arrays are float32 (the reference is all-Float32).

Layout conventions (TPU-first, differ from the column-major Julia layout):
  * 2D fields are `(..., nx, ny)` — channels lead, space trails so the last
    two axes map onto the (8, 128) VPU tile.
  * trajectories are time-leading `(T+1, ...)` (the natural `lax.scan` ys
    layout), whereas the reference concatenates time last.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp


def _register(cls):
    data_fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=data_fields, meta_fields=[])
    return cls


@_register
@dataclass(frozen=True)
class OneDim:
    """1D uniform grid (reference `src/dims.jl:6-8`)."""

    x: jax.Array

    @property
    def shape(self):
        return (self.x.shape[0],)


@_register
@dataclass(frozen=True)
class TwoDim:
    """2D uniform grid (reference `src/dims.jl:14-17`)."""

    x: jax.Array
    y: jax.Array

    @property
    def shape(self):
        return (self.x.shape[0], self.y.shape[0])


@_register
@dataclass(frozen=True)
class ThreeDim:
    """3D uniform grid (reference `src/dims.jl:19-23`)."""

    x: jax.Array
    y: jax.Array
    z: jax.Array

    @property
    def shape(self):
        return (self.x.shape[0], self.y.shape[0], self.z.shape[0])


def one_dim(grid_size: float, n: int) -> OneDim:
    """OneDim(grid_size, n) ctor: n points on [-grid_size, grid_size]
    (reference `src/dims.jl:50-52`)."""
    return OneDim(jnp.linspace(-grid_size, grid_size, n, dtype=jnp.float32))


def one_dim_spacing(grid_size: float, delta: float) -> OneDim:
    """OneDim(grid_size, Δ) ctor (reference `src/dims.jl:46-48`)."""
    x = jnp.arange(-grid_size, grid_size + 0.5 * delta, delta, dtype=jnp.float32)
    return OneDim(x)


def two_dim(grid_size: float, n: int) -> TwoDim:
    """TwoDim(grid_size, n) ctor (reference `src/dims.jl:58-62`)."""
    ax = jnp.linspace(-grid_size, grid_size, n, dtype=jnp.float32)
    return TwoDim(ax, ax)


def two_dim_spacing(grid_size: float, delta: float) -> TwoDim:
    ax = jnp.arange(-grid_size, grid_size + 0.5 * delta, delta, dtype=jnp.float32)
    return TwoDim(ax, ax)


def three_dim(grid_size: float, n: int) -> ThreeDim:
    ax = jnp.linspace(-grid_size, grid_size, n, dtype=jnp.float32)
    return ThreeDim(ax, ax, ax)


def build_grid(dim):
    """Coordinate mesh.

    OneDim -> (nx,) coordinates; TwoDim -> (nx, ny, 2) with [..., 0] the x
    coordinate (varies along axis 0) and [..., 1] the y coordinate
    (reference `src/dims.jl:82-97`).
    """
    if isinstance(dim, OneDim):
        return dim.x
    if isinstance(dim, TwoDim):
        gx = jnp.broadcast_to(dim.x[:, None], (dim.x.shape[0], dim.y.shape[0]))
        gy = jnp.broadcast_to(dim.y[None, :], (dim.x.shape[0], dim.y.shape[0]))
        return jnp.stack([gx, gy], axis=-1)
    if isinstance(dim, ThreeDim):
        gx, gy, gz = jnp.meshgrid(dim.x, dim.y, dim.z, indexing="ij")
        return jnp.stack([gx, gy, gz], axis=-1)
    raise TypeError(f"unsupported dim type {type(dim)}")


def build_wave(dim, fields: int) -> jax.Array:
    """Zero wave state of shape (fields, *spatial) — channels-first TPU layout
    (reference `src/dims.jl:107-109` allocates (*spatial, fields))."""
    return jnp.zeros((fields, *dim.shape), dtype=jnp.float32)


def build_dirichlet(dim) -> jax.Array:
    """Boundary mask: 1 in the interior, 0 on the domain boundary
    (reference `src/dims.jl:111-124`)."""
    if isinstance(dim, OneDim):
        bc = jnp.ones(dim.shape, dtype=jnp.float32)
        return bc.at[jnp.array([0, dim.shape[0] - 1])].set(0.0)
    if isinstance(dim, TwoDim):
        bc = jnp.ones(dim.shape, dtype=jnp.float32)
        bc = bc.at[0, :].set(0.0)
        bc = bc.at[-1, :].set(0.0)
        bc = bc.at[:, 0].set(0.0)
        bc = bc.at[:, -1].set(0.0)
        return bc
    if isinstance(dim, ThreeDim):
        # extension beyond the reference, which declares ThreeDim
        # (`src/dims.jl:20-25`) but never integrates it
        bc = jnp.ones(dim.shape, dtype=jnp.float32)
        bc = bc.at[0].set(0.0)
        bc = bc.at[-1].set(0.0)
        bc = bc.at[:, 0].set(0.0)
        bc = bc.at[:, -1].set(0.0)
        bc = bc.at[:, :, 0].set(0.0)
        bc = bc.at[:, :, -1].set(0.0)
        return bc
    raise TypeError(f"unsupported dim type {type(dim)}")


def get_dx(dim) -> jax.Array:
    """Mean grid spacing along x (reference `src/dims.jl:126`)."""
    return jnp.mean(jnp.diff(dim.x))


def get_dy(dim) -> jax.Array:
    return jnp.mean(jnp.diff(dim.y))


def get_dz(dim) -> jax.Array:
    return jnp.mean(jnp.diff(dim.z))
