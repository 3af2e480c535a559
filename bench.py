"""Canonical benchmark: FDTD integration throughput on the reference
operating point (700x700 grid, 12 channels, triple-ring cloak, random-pos
Gaussian source, RK4 @ dt=1e-5 — BASELINE.md), on the Pallas fused-RK4
kernel path (the XLA stencil path is ~6x slower; see tests for parity).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is measured / north-star target (5000 steps/s per TPU core,
BASELINE.json — the reference publishes no numbers).
"""
import json
import time

import jax
import jax.numpy as jnp

import waves_jl_tpu as w
from waves_jl_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
from waves_jl_tpu.env import RandomDesignPolicy, env_reset, env_step, make_wave_env
from waves_jl_tpu.physics.fused import make_env_step_fused

N = 700
STEPS = 100
WINDOWS = 20  # one full reference episode of integration work
TARGET = 5000.0


def main():
    dim = w.two_dim(15.0, N)
    grid = w.build_grid(dim)
    source = w.GaussianSource.create(
        grid,
        jnp.array([[-10.0, -10.0]]),
        jnp.array([[-10.0, 10.0]]),
        jnp.array([0.3]),
        jnp.array([1.0]),
        1000.0,
    )
    env = make_wave_env(
        dim,
        w.build_triple_ring_design_space(),
        source,
        integration_steps=STEPS,
        actions=WINDOWS,
    )
    policy = RandomDesignPolicy(env.action_space)
    key = jax.random.PRNGKey(0)
    state = env_reset(env, key)
    actions = [policy(k) for k in jax.random.split(jax.random.PRNGKey(1), WINDOWS)]

    fused_step = make_env_step_fused(env)

    def episode(state):
        sigs = []
        for a in actions:
            state, _ = fused_step(state, a)
            sigs.append(state.signal)
        return state, jnp.stack(sigs)

    # warmup/compile
    final, sigs = episode(state)
    jax.block_until_ready(sigs)

    t0 = time.time()
    reps = 3
    for _ in range(reps):
        final, sigs = episode(state)
        jax.block_until_ready(sigs)
    elapsed = (time.time() - t0) / reps

    total_steps = WINDOWS * STEPS
    steps_per_sec = total_steps / elapsed
    assert bool(jnp.isfinite(sigs).all())

    print(
        json.dumps(
            {
                "metric": f"fdtd_integration_steps_per_sec_{N}x{N}",
                "value": round(steps_per_sec, 1),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / TARGET, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
