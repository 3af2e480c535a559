"""Raw-kernel roofline probes (PERF_NOTES closure):

Measures the fused RK4 kernel in isolation (no env wiring, free-field
window at the production 700^2 / tile-48 / radii-only / x_matmul operating
point) for steps_per_call in {1, 2, 4}. spc=4 needs a 16-row ghost band
(4 RK4 steps x 4 halo rows), which raises per-tile redundant compute from
64/48 to 80/48 rows — the probe answers whether halved per-call overhead
beats the extra 25% row redundancy.

Usage: python scripts_tpu/kernel_probe.py [--n 700] [--iters 60]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import waves_jl_tpu as w
from waves_jl_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
from waves_jl_tpu.ops.pallas_fd import (
    make_fused_acoustic_step,
    pad_state,
    padded_dims,
)
from waves_jl_tpu.physics.fused import cyl_params


def build(n, spc, ghost, tile=48):
    dim = w.two_dim(15.0, n)
    spacing = 2.0 * 15.0 / (n - 1)
    dyn = w.make_acoustic_dynamics_2d(dim, float(w.WATER), 10.0, 10000.0)
    step = make_fused_acoustic_step(
        n=n, spacing=spacing, dt=1e-5, c0=float(w.WATER), freq=1000.0,
        n_cyl=19, x_min=-15.0, tile_interior=tile,
        steps_per_call=spc, radii_only=True, x_matmul=True, ghost=ghost,
    )
    space = w.build_triple_ring_design_space()
    d1 = space.sample(jax.random.PRNGKey(0))
    d2 = space.sample(jax.random.PRNGKey(1))
    cyl = cyl_params(d1, d2)
    grid = w.build_grid(dim)
    shape = w.build_normal(
        grid, jnp.array([[-10.0, 0.0]]), jnp.array([0.3]), jnp.array([1.0])
    )
    px, py, _ = padded_dims(n, tile, ghost)
    prof = dyn.pml[:, 0]
    prof_x = jnp.pad(prof, (ghost, px - ghost - n), mode="edge")[:, None]
    prof_y = jnp.pad(prof, (0, py - n), mode="edge")[None, :]
    u0 = pad_state(w.build_wave(dim, 12), tile, ghost)
    shape_pad = pad_state(shape[None], tile, ghost)[0]

    calls = 100 // spc

    @jax.jit
    def window(u):
        def body(u_, i):
            t = i.astype(jnp.float32) * (1e-5 * spc)
            scalars = jnp.stack([t, jnp.float32(0.0), jnp.float32(1e-3), jnp.float32(0.0)])
            u2, e = step(u_pad=u_, shape_pad=shape_pad, prof_x=prof_x,
                         prof_y=prof_y, scalars=scalars, cyl=cyl)
            return u2, e
        return jax.lax.scan(body, u, jnp.arange(calls))

    return window, u0, calls * spc


def measure(window, u0, steps, iters):
    u, e = window(u0)  # compile + warm
    jax.block_until_ready(u)
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        uu = u0
        for _ in range(iters):
            uu, e = window(uu)
        jax.block_until_ready(uu)
        dt = time.perf_counter() - t0
        best = max(best, iters * steps / dt)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=700)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    results = {}
    for spc, ghost in [(1, 8), (2, 8), (4, 16)]:
        window, u0, steps = build(args.n, spc, ghost)
        rate = measure(window, u0, steps, args.iters)
        results[f"spc{spc}_ghost{ghost}"] = round(rate, 1)
        print(f"steps_per_call={spc} ghost={ghost}: {rate:,.0f} steps/s", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
