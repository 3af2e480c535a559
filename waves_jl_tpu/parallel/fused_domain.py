"""Multi-chip FDTD at fused-kernel speed: the Pallas RK4 step running
per-shard under `shard_map`, with `ppermute` halo-column exchange between
steps.

Each device owns a (12, nx, ny/n_dev) slab kept in the kernel's padded
layout with `y_ghost` halo columns on each side. Before every RK4 step the
owned edge columns are exchanged with neighbors; the kernel's global-column
indexing applies one-sided stencils only at the true domain edges, so
interior seams integrate with central differences through the halos —
bit-matching the single-device kernel.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.pallas_fd import GHOST, HALO, LANE, make_fused_acoustic_step, padded_dims


def make_fused_sharded_rollout(
    mesh: Mesh,
    n: int,
    spacing: float,
    dt: float,
    c0: float,
    freq: float,
    n_cyl: int,
    x_min: float,
    tile_interior: int = 48,
    axis_name: str = "space",
    interpret: bool = False,
    radii_only: bool = False,
    x_matmul: bool = False,
):
    """Build a jitted y-sharded fused rollout.

    rollout(u0, tspan, cyl, shape, prof) -> (u_final, signal) with
      u0     (12, n, n) global state (sharded by the caller or replicated)
      tspan  (steps+1,)
      cyl    (8, n_cyl) design lerp endpoints (see physics.fused.cyl_params)
      shape  (n, n) source spatial shape
      prof   (n,) 1D PML sigma profile (sigma_x along x == sigma_y along y)
    signal: (steps+1, 3) global [tot, inc, sc] energies (d_omega applied by
    the caller).
    """
    n_dev = mesh.devices.size
    assert n % n_dev == 0, (n, n_dev)
    ny_local = n // n_dev
    yg = HALO  # steps_per_call = 1
    assert ny_local >= 2 * yg, "shards too thin for the halo"
    step = make_fused_acoustic_step(
        n=n, spacing=spacing, dt=dt, c0=c0, freq=freq, n_cyl=n_cyl,
        x_min=x_min, tile_interior=tile_interior, interpret=interpret,
        steps_per_call=1, ny_local=ny_local, y_ghost=yg,
        # single-device kernel optimizations apply per shard unchanged:
        # radii_only selects owners from (static) global coordinates, and
        # x_matmul affects only the unsharded x direction
        radii_only=radii_only, x_matmul=x_matmul,
    )
    px, _, _ = padded_dims(n, tile_interior)
    py_loc = math.ceil((ny_local + 2 * yg) / LANE) * LANE
    fwd = [(k, k + 1) for k in range(n_dev - 1)]
    bwd = [(k + 1, k) for k in range(n_dev - 1)]

    def _local(u_loc, tspan, cyl, shape_loc, prof_x_col, prof_loc):
        # u_loc (12, n, ny_local); shape_loc (n, ny_local + 2*yg) includes
        # neighbor ghost columns (pre-sliced below); prof_loc (ny_local+2yg,)
        idx = jax.lax.axis_index(axis_name)
        col0 = (idx * ny_local).astype(jnp.float32)

        u_pad = jnp.zeros((12, px, py_loc), jnp.float32)
        u_pad = u_pad.at[:, GHOST : GHOST + n, yg : yg + ny_local].set(u_loc)
        shape_pad = jnp.zeros((px, py_loc), jnp.float32)
        shape_pad = shape_pad.at[GHOST : GHOST + n, : ny_local + 2 * yg].set(shape_loc)
        prof_x = jnp.pad(prof_x_col, (GHOST, px - GHOST - n), mode="edge")[:, None]
        prof_y = jnp.pad(prof_loc, (0, py_loc - ny_local - 2 * yg), mode="edge")[None, :]

        ti, tf = tspan[0], tspan[-1]

        def energy0(u):
            tot = jnp.sum(u[0] ** 2)
            inc = jnp.sum(u[6] ** 2)
            sc = jnp.sum((u[0] - u[6]) ** 2)
            return jax.lax.psum(jnp.stack([tot, inc, sc]), axis_name)

        def body(u, t):
            # refresh halo columns from neighbors
            right_edge = u[:, :, ny_local : yg + ny_local]  # last yg owned
            left_edge = u[:, :, yg : 2 * yg]  # first yg owned
            from_left = jax.lax.ppermute(right_edge, axis_name, fwd)
            from_right = jax.lax.ppermute(left_edge, axis_name, bwd)
            u = u.at[:, :, 0:yg].set(from_left)
            u = u.at[:, :, yg + ny_local : 2 * yg + ny_local].set(from_right)
            scalars = jnp.stack([t, ti, tf, col0])
            u2, e = step(u_pad=u, shape_pad=shape_pad, prof_x=prof_x,
                         prof_y=prof_y, scalars=scalars, cyl=cyl)
            return u2, jax.lax.psum(e[0], axis_name)

        e0 = energy0(u_loc)
        u_final, es = jax.lax.scan(body, u_pad, tspan[:-1])
        signal = jnp.concatenate([e0[None], es], axis=0)
        u_out = u_final[:, GHOST : GHOST + n, yg : yg + ny_local]
        return u_out, signal

    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(
            P(None, None, axis_name),  # u0 sharded along y
            P(),  # tspan
            P(),  # cyl
            P(None, axis_name),  # shape_loc (pre-sliced with ghosts)
            P(),  # prof_x (global 1D profile along x)
            P(axis_name),  # prof_loc (pre-sliced with ghosts, 1D)
        ),
        out_specs=(P(None, None, axis_name), P()),
        check_vma=False,
    )

    @jax.jit
    def rollout(u0, tspan, cyl, shape, prof):
        # pre-slice per-shard ghost-extended shape/profile views: pad the
        # global arrays then take each shard's [start-yg, end+yg) window.
        shape_ext = jnp.pad(shape, ((0, 0), (yg, yg)))
        shape_slabs = jnp.concatenate(
            [
                shape_ext[:, k * ny_local : k * ny_local + ny_local + 2 * yg]
                for k in range(n_dev)
            ],
            axis=1,
        )
        prof_ext = jnp.pad(prof, (yg, yg), mode="edge")
        prof_slabs = jnp.concatenate(
            [
                prof_ext[k * ny_local : k * ny_local + ny_local + 2 * yg]
                for k in range(n_dev)
            ],
            axis=0,
        )
        return sharded(u0, tspan, cyl, shape_slabs, prof, prof_slabs)

    return rollout
