"""Dataset generation workflow (reference `scripts/data.jl`).

Builds the 700^2 env with the triple-ring design space and a
random-position Gaussian source, rolls N episodes with the random policy,
saves them as npz + the env config.

Usage: python scripts_tpu/datagen.py --episodes 500 --out data/run1 [--n 700]
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
from waves_jl_tpu.data import (
    generate_episode,
    generate_episodes_chunked,
    save_episode,
)
from waves_jl_tpu.env import RandomDesignPolicy, make_wave_env


def build_env(n: int = 700, integration_steps: int = 100, actions: int = 20):
    dim = w.two_dim(15.0, n)
    grid = w.build_grid(dim)
    source = w.GaussianSource.create(
        grid,
        mu_low=jnp.array([[-10.0, -10.0]]),
        mu_high=jnp.array([[-10.0, 10.0]]),
        sigma=jnp.array([0.3]),
        a=jnp.array([1.0]),
        freq=1000.0,
    )
    return make_wave_env(
        dim,
        w.build_triple_ring_design_space(),
        source,
        integration_steps=integration_steps,
        actions=actions,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--episodes", type=int, default=500)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--n", type=int, default=700)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--actions", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--format", choices=["wbin", "npz", "shard"], default="wbin",
                   help="wbin = native mmap store (falls back to npz without "
                        "g++); shard = stream all episodes into one "
                        "data.wshard file (flat memory, one mmap at train time)")
    p.add_argument("--no-fused", action="store_true",
                   help="use the XLA stencil path instead of the Pallas kernel")
    p.add_argument("--chunk", type=int, default=10,
                   help="episodes per device dispatch on the fused path")
    args = p.parse_args()

    os.makedirs(os.path.join(args.out, "episodes"), exist_ok=True)
    env = build_env(args.n, args.steps, args.actions)
    policy = RandomDesignPolicy(env.action_space)
    with open(os.path.join(args.out, "env.json"), "w") as f:
        json.dump(
            {
                "n": args.n,
                "integration_steps": args.steps,
                "actions": args.actions,
                "grid_size": 15.0,
                "c0": float(w.WATER),
                "source_freq": 1000.0,
            },
            f,
        )

    key = jax.random.PRNGKey(args.seed)
    t_start = time.time()
    if not args.no_fused:
        # fused path: observe + Pallas windows for a whole chunk of episodes
        # in one device program (dispatch-amortized)
        last = [time.time()]
        shard = None
        if args.format == "shard":
            from waves_jl_tpu.data import open_episodes_shard

            shard = open_episodes_shard(os.path.join(args.out, "data.wshard"))

        def save(i, ep):
            if shard is not None:
                shard.append(ep)
            else:
                save_episode(
                    ep,
                    os.path.join(args.out, "episodes", f"episode{i + 1}.{args.format}"),
                )
            now = time.time()
            print(
                f"episode {i + 1}/{args.episodes} "
                f"({now - last[0]:.2f}s since previous)", flush=True,
            )
            last[0] = now

        generate_episodes_chunked(
            env, policy, key, args.episodes, chunk=args.chunk, on_episode=save
        )
        if shard is not None:
            shard.finish()
    else:
        for i in range(args.episodes):
            key, k = jax.random.split(key)
            t0 = time.time()
            _, ep = generate_episode(env, policy, k)
            jax.block_until_ready(ep.y)
            save_episode(
                ep, os.path.join(args.out, "episodes", f"episode{i + 1}.{args.format}")
            )
            print(f"episode {i + 1}/{args.episodes} in {time.time() - t0:.2f}s", flush=True)
    total = time.time() - t_start
    print(f"TOTAL {args.episodes} episodes in {total:.1f}s "
          f"({total / args.episodes:.2f}s/episode)", flush=True)


if __name__ == "__main__":
    main()
