"""Domain-decomposed 2D FDTD: shard the grid's y axis over a device mesh.

The stencil-code equivalent of context parallelism (SURVEY.md section 5):
each device owns a (nx, ny/n) slab; the 3-point stencils need a 1-cell halo
exchanged with neighbors via `lax.ppermute` inside `shard_map`; one-sided
boundary stencils apply only at the true domain edges. The PML, Dirichlet
mask, source shape and rasterization grid are sharded alongside the state;
the design pytree and time scalars stay replicated.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.fd import fd_dx


def fd_dy_halo(u: jax.Array, dy, axis_name: str) -> jax.Array:
    """d/dy on a y-sharded field (..., nx, ny_local) with ppermute halo
    exchange; one-sided stencils at the global boundary shards."""
    n = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)

    if n == 1:
        interior = u[..., 2:] - u[..., :-2]
        left = -3.0 * u[..., :1] + 4.0 * u[..., 1:2] - u[..., 2:3]
        right = u[..., -3:-2] - 4.0 * u[..., -2:-1] + 3.0 * u[..., -1:]
        return jnp.concatenate([left, interior, right], axis=-1) / (2.0 * dy)

    # halo exchange: rightmost column -> right neighbor, leftmost -> left
    from_left = jax.lax.ppermute(
        u[..., -1:], axis_name, [(k, k + 1) for k in range(n - 1)]
    )
    from_right = jax.lax.ppermute(
        u[..., :1], axis_name, [(k + 1, k) for k in range(n - 1)]
    )
    up = jnp.concatenate([from_left, u, from_right], axis=-1)
    d = (up[..., 2:] - up[..., :-2]) / (2.0 * dy)

    # true-domain-edge one-sided stencils (first/last shard only)
    left_os = (-3.0 * u[..., :1] + 4.0 * u[..., 1:2] - u[..., 2:3]) / (2.0 * dy)
    right_os = (u[..., -3:-2] - 4.0 * u[..., -2:-1] + 3.0 * u[..., -1:]) / (2.0 * dy)
    first = jnp.where(i == 0, left_os, d[..., :1])
    last = jnp.where(i == n - 1, right_os, d[..., -1:])
    return jnp.concatenate([first, d[..., 1:-1], last], axis=-1)


def acoustic_rhs_2d_sharded(x, c, f, sx, sy, bc, dx, dy, axis_name: str):
    """Single-stack PML acoustic RHS on a y-sharded slab. sx/sy are the
    already-sharded sigma_x / sigma_y profiles (sy is the global pml
    transpose, sharded along y)."""
    U, Vx, Vy, Px, Py, Om = x[0], x[1], x[2], x[3], x[4], x[5]
    b = c**2

    Vxx = fd_dx(Vx, dx)
    Vyy = fd_dy_halo(Vy, dy, axis_name)
    Uf = U + f
    Ux = fd_dx(Uf, dx)
    Uy = fd_dy_halo(Uf, dy, axis_name)

    dU = b * (Vxx + Vyy) + Px + Py - (sx + sy) * U - Om
    dVx = Ux - sx * Vx
    dVy = Uy - sy * Vy
    dPx = b * sx * Vyy
    dPy = b * sy * Vxx
    dOm = sx * sy * U
    return jnp.stack([bc * dU, dVx, dVy, dPx, dPy, dOm], axis=0)


def make_sharded_rollout(
    mesh: Mesh,
    c0: float,
    dx,
    dy,
    steps: int,
    dt: float,
    axis_name: str = "space",
):
    """Build a jitted y-sharded FDTD rollout.

    rollout(u0, tspan, C, F, sx, sy, bc, grid) -> (u_final, signal) where
      u0 (12, nx, ny), tspan (steps+1,), C/F callables-as-pytrees evaluated
      per step (the speed rasterization happens per-shard on the local grid
      slab), sx/sy/bc (nx, ny), grid (nx, ny, 2).
    Returns per-step [tot, inc, sc] energies (psum over shards) and the
    final state (still sharded).
    """

    def _local(u0, tspan, C_interp_grid, f_shape, f_freq, sx, sy, bc, d_omega):
        C, grid = C_interp_grid

        def rhs(x, t):
            from ..designs import speed

            design = C(t)  # DesignInterpolator -> design pytree (replicated)
            c = speed(design, grid, c0)  # rasterize on the local slab
            fshape = f_shape * jnp.sin(2.0 * jnp.pi * t * f_freq)
            dtot = acoustic_rhs_2d_sharded(
                x[0:6], c, fshape, sx, sy, bc, dx, dy, axis_name
            )
            dinc = acoustic_rhs_2d_sharded(
                x[6:12], jnp.float32(c0), fshape, sx, sy, bc, dx, dy, axis_name
            )
            return jnp.concatenate([dtot, dinc], axis=0)

        def rk4_step(u, t):
            k1 = rhs(u, t)
            k2 = rhs(u + 0.5 * dt * k1, t + 0.5 * dt)
            k3 = rhs(u + 0.5 * dt * k2, t + 0.5 * dt)
            k4 = rhs(u + dt * k3, t + dt)
            return u + dt * (k1 + 2.0 * k2 + 2.0 * k3 + k4) / 6.0

        def energy(u):
            u_tot, u_inc = u[0], u[6]
            u_sc = u_tot - u_inc
            local = jnp.stack(
                [
                    jnp.sum(u_tot**2) * d_omega,
                    jnp.sum(u_inc**2) * d_omega,
                    jnp.sum(u_sc**2) * d_omega,
                ]
            )
            return jax.lax.psum(local, axis_name)

        def body(u, t):
            u2 = rk4_step(u, t)
            return u2, energy(u2)

        u_final, es = jax.lax.scan(body, u0, tspan[:-1])
        signal = jnp.concatenate([energy(u0)[None], es], axis=0)
        return u_final, signal

    spec_y = P(None, None, axis_name)  # (12, nx, ny)
    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(
            spec_y,  # u0
            P(),  # tspan
            (P(), P(None, axis_name, None)),  # (design interp, grid slab)
            P(None, axis_name),  # f_shape (nx, ny) sharded along y
            P(),  # f_freq scalar
            P(None, axis_name),  # sx
            P(None, axis_name),  # sy
            P(None, axis_name),  # bc
            P(),  # d_omega
        ),
        out_specs=(spec_y, P()),
        check_vma=False,
    )

    @jax.jit
    def rollout(u0, tspan, interp, grid, f_shape, f_freq, sx, sy, bc, d_omega):
        return sharded(u0, tspan, (interp, grid), f_shape, f_freq, sx, sy, bc, d_omega)

    return rollout
