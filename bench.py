"""Canonical benchmark: ALL THREE north-star metrics on the reference
operating point (700x700 grid, 12 channels, triple-ring cloak, random-pos
Gaussian source, RK4 @ dt=1e-5 — BASELINE.md), on the Pallas fused-RK4
kernel path (the XLA stencil path is ~6x slower; see tests for parity).

Prints one JSON line per metric:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

1. fdtd_integration_steps_per_sec_700x700 — raw solver throughput.
   vs_baseline = measured / 5000 steps/s (the BASELINE.json north star;
   the reference publishes no numbers). Higher is better.
2. mpc_episode_warm_seconds — full 20-action x 100-step MPC episode
   (observe -> 256-shot stride-4 surrogate selection -> Pallas env window,
   one fused device program), warm, on the tracked control flagship.
   vs_baseline = 1.0 s / measured (north star: < 1 s). Higher is better.
3. datagen_seconds_per_episode — steady-state random-policy episode
   generation on the chunk-fused path (10 episodes per dispatch,
   device->host pull included). vs_baseline = 1.2 s / measured (this
   framework's own round-1 per-episode rate — the reference publishes
   none). Higher is better.
"""
import json
import os
import time

import jax
import jax.numpy as jnp

import waves_jl_tpu as w
from waves_jl_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
from waves_jl_tpu.env import RandomDesignPolicy, env_reset, make_wave_env
from waves_jl_tpu.physics.fused import make_env_step_fused

N = 700
STEPS = 100
WINDOWS = 20  # one full reference episode of integration work
TARGET_STEPS_PER_SEC = 5000.0
TARGET_MPC_SECONDS = 1.0
BASELINE_DATAGEN_SECONDS = 1.2  # round-1 measured rate (BASELINE.md)

# tracked control flagship for the MPC-latency metric (latency depends on
# architecture/stride, not weights; falls back to random init if absent)
MPC_CHECKPOINT = "models/ref500_h8s4/checkpoint_step=2600"
MPC_STRIDE = 4


def build_env(actions: int = WINDOWS):
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
    return make_wave_env(
        dim,
        w.build_triple_ring_design_space(),
        source,
        integration_steps=STEPS,
        actions=actions,
    )


def emit(metric: str, value: float, unit: str, vs_baseline: float):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 4),
                "unit": unit,
                "vs_baseline": round(vs_baseline, 4),
            }
        ),
        flush=True,
    )


def bench_fdtd(env):
    policy = RandomDesignPolicy(env.action_space)
    state = env_reset(env, jax.random.PRNGKey(0))
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

    steps_per_sec = WINDOWS * STEPS / elapsed
    assert bool(jnp.isfinite(sigs).all())
    emit(
        f"fdtd_integration_steps_per_sec_{N}x{N}",
        round(steps_per_sec, 1),
        "steps/s",
        steps_per_sec / TARGET_STEPS_PER_SEC,
    )


def bench_mpc(env):
    from __graft_entry__ import _tiny_batch
    from waves_jl_tpu.control import RandomShooting, make_mpc_episode_fused
    from waves_jl_tpu.models import AcousticEnergyModel
    from waves_jl_tpu.train import load_checkpoint

    model = AcousticEnergyModel.create(
        design_space=w.build_triple_ring_design_space(),
        source_freq=1000.0,
        elements=1024,
        h_size=256,
        nfreq=500,
        integration_steps=STEPS // MPC_STRIDE,
        dt=1e-5 * MPC_STRIDE,
    )
    params = model.init(
        jax.random.PRNGKey(0),
        _tiny_batch(model, B=1, horizon=1, steps=STEPS // MPC_STRIDE, res=128),
    )
    if os.path.isdir(MPC_CHECKPOINT):
        params, _, _ = load_checkpoint(MPC_CHECKPOINT, params)

    mpc = RandomShooting(model=model, horizon=5, shots=256, alpha=1.0)
    run_mpc = make_mpc_episode_fused(env, mpc)
    state = env_reset(env, jax.random.PRNGKey(2))

    # warmup/compile
    _, sig, _ = run_mpc(params, state, jax.random.PRNGKey(3))
    jax.block_until_ready(sig)

    reps = 3
    t0 = time.time()
    for i in range(reps):
        _, sig, _ = run_mpc(params, state, jax.random.PRNGKey(4 + i))
        jax.block_until_ready(sig)
    elapsed = (time.time() - t0) / reps
    assert bool(jnp.isfinite(sig).all())
    emit(
        "mpc_episode_warm_seconds",
        elapsed,
        "s/episode",
        TARGET_MPC_SECONDS / elapsed,
    )


def bench_datagen(env):
    from waves_jl_tpu.data import make_episode_chunk_fused

    chunk = 10
    policy = RandomDesignPolicy(env.action_space)
    run_chunk = make_episode_chunk_fused(env)

    def one_chunk(seed: int):
        k_reset, k_act = jax.random.split(jax.random.PRNGKey(seed))
        states = jax.vmap(lambda kk: env_reset(env, kk))(
            jax.random.split(k_reset, chunk)
        )
        akeys = jax.random.split(k_act, chunk * env.actions).reshape(
            chunk, env.actions, 2
        )
        actions = jax.vmap(jax.vmap(policy))(akeys)
        eps = run_chunk(states, actions)
        return jax.device_get(eps)  # include the host pull, as datagen does

    one_chunk(10)  # warmup/compile

    reps = 2
    t0 = time.time()
    for i in range(reps):
        one_chunk(11 + i)
    per_episode = (time.time() - t0) / (reps * chunk)
    emit(
        "datagen_seconds_per_episode",
        per_episode,
        "s/episode",
        BASELINE_DATAGEN_SECONDS / per_episode,
    )


def main():
    env = build_env()
    bench_fdtd(env)
    bench_mpc(env)
    bench_datagen(env)


if __name__ == "__main__":
    main()
