"""Render a random-policy episode to video (reference `scripts/data.jl:66` /
`render!`).

Usage: python scripts_tpu/render.py --out vid.mp4 [--n 256 --actions 10 --field tot]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from waves_jl_tpu.env import RandomDesignPolicy
from waves_jl_tpu.viz.episode import render_episode
from datagen import build_env


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="vid.mp4")
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--actions", type=int, default=10)
    p.add_argument("--field", choices=["tot", "inc", "sc"], default="tot")
    p.add_argument("--bound", type=float, default=1.0)
    p.add_argument("--energy", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--render-size", type=int, default=None,
                   help="on-device frame downsampling (e.g. 350 for a 700^2 "
                        "sim rendered at 350^2; host pull drops ~4 GB -> MBs)")
    args = p.parse_args()

    env = build_env(args.n, 100, args.actions)
    policy = RandomDesignPolicy(env.action_space)
    signals = render_episode(
        env, policy, jax.random.PRNGKey(args.seed), args.out,
        field=args.field, bound=args.bound, energy=args.energy,
        render_size=args.render_size,
    )
    print(f"rendered {args.out}; final window scattered energy "
          f"{float(signals[-1, -1, 2]):.4g}")


if __name__ == "__main__":
    main()
