"""MPC-episode latency probe: per-component timings + whole-episode wall
time vs latent stride (random params — latency does not depend on weights).

Validates the round-3 <1 s plan (fewer sequential latent steps) BEFORE
spending a training campaign on it.

Usage: python scripts_tpu/latency_probe.py [--strides 1 2 4] [--n 700]
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
import numpy as np

import waves_jl_tpu as w
from waves_jl_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
from waves_jl_tpu.control import (
    RandomShooting,
    build_action_sequence,
    make_mpc_episode_fused,
    selection_tspan,
)
from waves_jl_tpu.env import env_observe, env_reset
from waves_jl_tpu.models import AcousticEnergyModel
from datagen import build_env


def bench(fn, *args, warmup=2, iters=5):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--strides", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--n", type=int, default=700)
    p.add_argument("--shots", type=int, default=256)
    p.add_argument("--horizon", type=int, default=5)
    p.add_argument("--actions", type=int, default=20)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    env = build_env(args.n, 100, args.actions)
    state = env_reset(env, jax.random.PRNGKey(0))
    obs = jax.jit(lambda s: env_observe(env, s))(state)
    results = {}

    from __graft_entry__ import _tiny_batch

    for stride in args.strides:
        model = AcousticEnergyModel.create(
            design_space=w.build_triple_ring_design_space(), source_freq=1000.0,
            elements=1024, h_size=256, nfreq=500,
            integration_steps=100 // stride, dt=1e-5 * stride,
        )
        params = model.init(
            jax.random.PRNGKey(0),
            _tiny_batch(model, B=1, horizon=1, steps=100 // stride, res=128),
        )
        r = {}

        # component: wave encoder, one observation
        enc = jax.jit(lambda p, o: model.encode_wave(p, o))
        r["encode_ms"], x = bench(enc, params, obs.wave)
        r["encode_ms"] *= 1e3

        # component: full selection (design encode + rollout + energy)
        actions = build_action_sequence(
            env.action_space, jax.random.PRNGKey(1), args.horizon, args.shots
        )
        t = selection_tspan(model, env, state, args.horizon, args.shots)
        sel = jax.jit(
            lambda p, o, d, a, tt: model.predict_shot_energy(p, o, d, a, tt)
        )
        r["selection_ms"], _ = bench(sel, params, obs.wave, state.design, actions, t)
        r["selection_ms"] *= 1e3

        # trajectory-materializing selection for comparison
        sel_traj = jax.jit(
            lambda p, o, d, a, tt: jnp.sum(
                model.predict_shots(p, o, d, a, tt)[:, :, 2], axis=1
            )
        )
        r["selection_traj_ms"], _ = bench(
            sel_traj, params, obs.wave, state.design, actions, t
        )
        r["selection_traj_ms"] *= 1e3

        # whole fused MPC episode
        mpc = RandomShooting(model=model, horizon=args.horizon,
                             shots=args.shots, alpha=1.0)
        run = make_mpc_episode_fused(env, mpc)
        ep_s, _ = bench(run, params, state, jax.random.PRNGKey(2), warmup=1,
                        iters=3)
        r["episode_s"] = ep_s
        results[stride] = r
        print(f"stride {stride}: " + json.dumps(r), flush=True)

    # env window reference cost
    from waves_jl_tpu.physics.fused import make_env_step_fused

    step = make_env_step_fused(env)
    a0 = env.action_space.sample(jax.random.PRNGKey(3))
    win_s, _ = bench(lambda s, a: step(s, a)[0].wave, state, a0)
    results["env_window_ms"] = win_s * 1e3
    print(f"env window: {win_s * 1e3:.2f} ms", flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
