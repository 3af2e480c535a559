"""Finite-difference spatial operators.

TPU-native re-design of reference `src/operators.jl`. The reference builds a
sparse 1D first-derivative matrix (2nd-order central interior + one-sided
3-point boundary rows, `src/operators.jl:10-22`) and applies it as a sparse
matmul on GPU. Here we provide:

  * `fd_dx` / `fd_dy`: fused slice-based stencils for 2D fields — XLA fuses
    these into a single VPU pass over the tiles, no transposes, no matmuls.
    These are the hot ops of the 2D FDTD and the reference path that the
    Pallas kernels (`waves_jl_tpu/ops/pallas_fd.py`) are validated against.
  * `gradient_matrix` / `laplacian_matrix`: dense operator matrices for the
    1D latent space (1024x1024 dense matmuls ride the MXU and batch
    beautifully — the TPU equivalent of the reference's CUSPARSE dispatch)
    and for physics-residual losses.

Numerics match the reference exactly: interior (u[i+1]-u[i-1])/(2 dx),
left boundary (-3u0+4u1-u2)/(2 dx), right boundary (u[-3]-4u[-2]+3u[-1])/(2 dx)
(coefficients at `src/operators.jl:3-5`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gradient_matrix(x: jax.Array) -> jax.Array:
    """Dense (N, N) first-derivative operator, row i maps u -> du/dx at i.

    Parity with reference `src/operators.jl:10-22` (the Julia code builds the
    transpose column-wise then transposes; the resulting rows are exactly
    these).
    """
    n = x.shape[0]
    dx = (x[-1] - x[0]) / (n - 1)
    i = jnp.arange(n)
    # interior: -1 at (i, i-1), +1 at (i, i+1)
    grad = jnp.zeros((n, n), dtype=jnp.float32)
    grad = grad.at[i[1:-1], i[1:-1] - 1].set(-1.0)
    grad = grad.at[i[1:-1], i[1:-1] + 1].set(1.0)
    # one-sided boundary rows
    grad = grad.at[0, 0].set(-3.0)
    grad = grad.at[0, 1].set(4.0)
    grad = grad.at[0, 2].set(-1.0)
    grad = grad.at[n - 1, n - 3].set(1.0)
    grad = grad.at[n - 1, n - 2].set(-4.0)
    grad = grad.at[n - 1, n - 1].set(3.0)
    return grad / (2.0 * dx)


def laplacian_matrix(x: jax.Array) -> jax.Array:
    """Dense (N, N) second-derivative operator.

    Parity with reference `src/operators.jl:31-43` including its boundary
    rows which divide by dx^3 (sic — replicated for golden parity; the
    interior divides by dx^2).
    """
    n = x.shape[0]
    dx = (x[-1] - x[0]) / (n - 1)
    lap = jnp.zeros((n, n), dtype=jnp.float32)
    i = jnp.arange(1, n - 1)
    lap = lap.at[i, i - 1].set(1.0)
    lap = lap.at[i, i].set(-2.0)
    lap = lap.at[i, i + 1].set(1.0)
    lap = lap / dx**2
    b = jnp.array([2.0, -5.0, 4.0, -1.0], dtype=jnp.float32) / dx**3
    lap = lap.at[0, 0:4].set(b)
    lap = lap.at[n - 1, n - 4 : n].set(b[::-1])
    return lap


def fd_grad_1d(u: jax.Array, dx: jax.Array | float, axis: int = -1) -> jax.Array:
    """Stencil first derivative along `axis`; matches `gradient_matrix @ u`."""
    u = jnp.moveaxis(u, axis, -1)
    interior = u[..., 2:] - u[..., :-2]
    left = -3.0 * u[..., :1] + 4.0 * u[..., 1:2] - u[..., 2:3]
    right = u[..., -3:-2] - 4.0 * u[..., -2:-1] + 3.0 * u[..., -1:]
    d = jnp.concatenate([left, interior, right], axis=-1) / (2.0 * dx)
    return jnp.moveaxis(d, -1, axis)


def fd_dx(u: jax.Array, dx: jax.Array | float) -> jax.Array:
    """∂/∂x of a field laid out (..., nx, ny): derivative along axis -2.

    Equivalent of reference `∂x(∇, u) = ∇ * u` (`src/operators.jl:45`)
    without forming the operator matrix.
    """
    interior = u[..., 2:, :] - u[..., :-2, :]
    left = -3.0 * u[..., :1, :] + 4.0 * u[..., 1:2, :] - u[..., 2:3, :]
    right = u[..., -3:-2, :] - 4.0 * u[..., -2:-1, :] + 3.0 * u[..., -1:, :]
    return jnp.concatenate([left, interior, right], axis=-2) / (2.0 * dx)


def fd_dy(u: jax.Array, dy: jax.Array | float) -> jax.Array:
    """∂/∂y of a field laid out (..., nx, ny): derivative along axis -1.

    Equivalent of reference `∂y(∇, u) = (∇ * uᵀ)ᵀ` (`src/operators.jl:46`).
    """
    interior = u[..., 2:] - u[..., :-2]
    left = -3.0 * u[..., :1] + 4.0 * u[..., 1:2] - u[..., 2:3]
    right = u[..., -3:-2] - 4.0 * u[..., -2:-1] + 3.0 * u[..., -1:]
    return jnp.concatenate([left, interior, right], axis=-1) / (2.0 * dy)


def divergence(u: jax.Array, dx, dy) -> jax.Array:
    """∂x u + ∂y u (reference `src/operators.jl:47`)."""
    return fd_dx(u, dx) + fd_dy(u, dy)


def fd_d(u: jax.Array, spacing, axis: int) -> jax.Array:
    """Derivative along an arbitrary axis with the same interior/boundary
    stencils as `fd_dx`/`fd_dy` — used by the 3D dynamics extension."""
    v = jnp.moveaxis(u, axis, -1)
    interior = v[..., 2:] - v[..., :-2]
    left = -3.0 * v[..., :1] + 4.0 * v[..., 1:2] - v[..., 2:3]
    right = v[..., -3:-2] - 4.0 * v[..., -2:-1] + 3.0 * v[..., -1:]
    d = jnp.concatenate([left, interior, right], axis=-1) / (2.0 * spacing)
    return jnp.moveaxis(d, -1, axis)
