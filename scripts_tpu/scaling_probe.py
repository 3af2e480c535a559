"""Multi-chip scaling probe for the y-sharded FDTD rollouts on the
virtual CPU mesh (`parallel/domain.py` XLA path, `parallel/fused_domain.py`
Pallas path).

Real multi-chip hardware is not available in this environment, and the
host has ONE physical core — the 8 virtual devices time-share it, so
parallel speedup is unmeasurable here. What IS measurable, and what this
probe reports, is **total-work inflation**: wall time of the d-device
sharded program divided by the 1-device program at the same global grid.
On a single core, wall time ~ sum of per-device work, so the ratio
isolates exactly what sharding adds — ppermute halo exchange, edge
`where` masking, psum reductions, and (for the Pallas path) per-shard
kernel-call overhead. The parallel-speedup side of the story is the
analytic ICI model in docs/scaling.md.

Two sweeps, fixed global grid, 1/2/4/8 devices:
- xla:    compiled `make_sharded_rollout` (the honest number — no
          interpreter in the loop)
- pallas: `make_fused_sharded_rollout` in interpret mode (upper bound
          only; Mosaic's Python interpreter dominates and scales with
          shard count, so treat it as a smoke-level sanity check)

Usage:
  python scripts_tpu/scaling_probe.py [--n 256 --steps 20 --pallas-steps 8]
Writes docs/scaling.json; docs/scaling.md quotes it.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import waves_jl_tpu as w
from waves_jl_tpu.env import RandomDesignPolicy, env_reset, make_wave_env
from waves_jl_tpu.parallel import make_mesh, make_sharded_rollout
from waves_jl_tpu.parallel.fused_domain import make_fused_sharded_rollout
from waves_jl_tpu.physics.fused import cyl_params

C0 = float(w.WATER)
DT = 1e-5


def build_case(n: int, steps: int):
    dim = w.two_dim(15.0, n)
    grid = w.build_grid(dim)
    source = w.GaussianSource.create(
        grid, jnp.array([[-10.0, -10.0]]), jnp.array([[-10.0, 10.0]]),
        jnp.array([0.3]), jnp.array([1.0]), 1000.0,
    )
    env = make_wave_env(
        dim, w.build_triple_ring_design_space(), source,
        resolution=(16, 16), integration_steps=steps, actions=1,
    )
    state = env_reset(env, jax.random.PRNGKey(0))
    action = RandomDesignPolicy(env.action_space)(jax.random.PRNGKey(1))
    next_design = env.design_space(state.design, action)
    tspan = w.build_tspan(0.0, DT, steps)
    return env, grid, state, action, next_design, tspan


def time_xla(n: int, n_dev: int, steps: int, reps: int = 3):
    env, grid, state, action, next_design, tspan = build_case(n, steps)
    dyn = env.integrator.dynamics
    interp = w.DesignInterpolator(state.design, next_design, tspan[0], tspan[-1])
    mesh = make_mesh(n_dev, axis_name="space")
    rollout = make_sharded_rollout(
        mesh, C0, dyn.dx, dyn.dy, steps, DT, axis_name="space"
    )
    sy = jnp.asarray(np.asarray(dyn.pml).T)
    d_omega = jnp.float32(float(w.get_dx(env.dim)) ** 2)
    u0 = state.wave[-1]
    args = (u0, tspan, interp, grid, state.source.shape,
            jnp.float32(1000.0), dyn.pml, sy, dyn.bc, d_omega)
    u, sig = rollout(*args)  # warmup/compile
    jax.block_until_ready(sig)
    assert bool(jnp.isfinite(sig).all())
    t0 = time.time()
    for _ in range(reps):
        u, sig = rollout(*args)
        jax.block_until_ready(sig)
    return (time.time() - t0) / (reps * steps)


def time_pallas(n: int, n_dev: int, steps: int, reps: int = 2):
    env, grid, state, action, next_design, tspan = build_case(n, steps)
    mesh = make_mesh(n_dev, axis_name="space")
    spacing = float(2.0 * 15.0 / (n - 1))
    rollout = make_fused_sharded_rollout(
        mesh, n=n, spacing=spacing, dt=env.dt, c0=C0, freq=1000.0,
        n_cyl=19, x_min=-15.0, axis_name="space", interpret=True,
    )
    cyl = cyl_params(state.design, next_design)
    prof = env.integrator.dynamics.pml[:, 0]
    args = (state.wave[-1], tspan, cyl, state.source.shape, prof)
    u, sig = rollout(*args)  # warmup/compile
    jax.block_until_ready(sig)
    assert bool(jnp.isfinite(sig).all())
    t0 = time.time()
    for _ in range(reps):
        u, sig = rollout(*args)
        jax.block_until_ready(sig)
    return (time.time() - t0) / (reps * steps)


def sweep(fn, n: int, steps: int):
    out, base = {}, None
    for d in (1, 2, 4, 8):
        t = fn(n, d, steps)
        base = base or t
        out[d] = {"per_step_ms": round(t * 1e3, 2),
                  "work_inflation_vs_1dev": round(t / base, 3)}
        print(f"  {d} dev: {t * 1e3:.2f} ms/step  inflation {t / base:.2f}x",
              flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--pallas-n", type=int, default=128)
    p.add_argument("--pallas-steps", type=int, default=8)
    p.add_argument("--out", default="docs/scaling.json")
    args = p.parse_args()

    results = {}
    print(f"XLA sharded rollout (compiled), global {args.n}^2, single-core "
          "host => ratios are total-work inflation, not speedup")
    results[f"xla_n{args.n}"] = sweep(time_xla, args.n, args.steps)

    print(f"Pallas fused sharded rollout (interpret mode), global "
          f"{args.pallas_n}^2 — interpreter-dominated, smoke-level only")
    results[f"pallas_interpret_n{args.pallas_n}"] = sweep(
        time_pallas, args.pallas_n, args.pallas_steps
    )

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
