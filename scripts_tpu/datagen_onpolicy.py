"""On-policy dataset generation: episodes rolled under the MPC controller.

The surrogate is trained on random-policy episodes (reference
`scripts/data.jl`), but control evaluates it on the states the CONTROLLER
visits — systematically lower-energy configurations the random policy
rarely reaches. This workflow closes that distribution gap: it rolls
episodes with a trained surrogate's MPC controller (optionally
epsilon-mixed with random actions for candidate contrast) and saves them in
the standard episode format, ready to mix into a fine-tune via
`train.py --data <random_dir> <onpolicy_dir>`. Beyond-reference (the
reference only ever trains on random data).

Usage:
  python scripts_tpu/datagen_onpolicy.py --episodes 200 --out data/onpol \
      --checkpoint models/ref500_h8s4/checkpoint_step=2184 --latent-stride 4 \
      [--epsilon 0.25 --horizon 5 --shots 256]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import waves_jl_tpu as w
from waves_jl_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
from waves_jl_tpu.control import RandomShooting, make_mpc_episode_recorded
from waves_jl_tpu.data import save_episode
from waves_jl_tpu.env import env_reset
from waves_jl_tpu.models import AcousticEnergyModel
from waves_jl_tpu.train import load_checkpoint
from datagen import build_env


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--episodes", type=int, default=200)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--epsilon", type=float, default=0.25,
                   help="per-window probability of a random action instead "
                        "of the controller's choice")
    p.add_argument("--horizon", type=int, default=5)
    p.add_argument("--shots", type=int, default=256)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--controller", choices=["random_shooting", "cem"],
                   default="random_shooting",
                   help="cem (optionally with --polish) records traces of "
                        "the deployed record controller — the behavior-"
                        "cloning harvest")
    p.add_argument("--cem-iters", type=int, default=3)
    p.add_argument("--cem-elites", type=int, default=32)
    p.add_argument("--polish", type=int, default=0,
                   help="gradient-polish steps on the CEM elites")
    p.add_argument("--polish-topk", type=int, default=16)
    p.add_argument("--polish-lr", type=float, default=0.02)
    p.add_argument("--latent-stride", type=int, default=1)
    p.add_argument("--n", type=int, default=700)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--actions", type=int, default=20)
    p.add_argument("--h-size", type=int, default=256)
    p.add_argument("--nfreq", type=int, default=500)
    p.add_argument("--elements", type=int, default=1024)
    p.add_argument("--seed", type=int, default=100)
    p.add_argument("--format", choices=["wbin", "npz"], default="wbin")
    args = p.parse_args()

    os.makedirs(os.path.join(args.out, "episodes"), exist_ok=True)
    env = build_env(args.n, args.steps, args.actions)
    with open(os.path.join(args.out, "env.json"), "w") as f:
        json.dump(
            {"n": args.n, "integration_steps": args.steps,
             "actions": args.actions, "grid_size": 15.0, "c0": float(w.WATER),
             "source_freq": 1000.0, "onpolicy": {
                 "checkpoint": args.checkpoint, "epsilon": args.epsilon,
                 "horizon": args.horizon, "shots": args.shots,
                 "controller": args.controller, "cem_iters": args.cem_iters,
                 "cem_elites": args.cem_elites, "polish": args.polish,
                 "polish_topk": args.polish_topk}}, f,
        )

    model = AcousticEnergyModel.create(
        design_space=w.build_triple_ring_design_space(), source_freq=1000.0,
        elements=args.elements, h_size=args.h_size, nfreq=args.nfreq,
        integration_steps=args.steps // args.latent_stride,
        dt=1e-5 * args.latent_stride,
    )
    from __graft_entry__ import _tiny_batch

    params_like = model.init(
        jax.random.PRNGKey(0),
        _tiny_batch(model, B=1, horizon=1,
                    steps=args.steps // args.latent_stride, res=128),
    )
    params, _, step_no = load_checkpoint(args.checkpoint, params_like)
    print(f"loaded checkpoint step {step_no} ({args.checkpoint})")

    if args.controller == "cem":
        from waves_jl_tpu.control import CEMShooting

        mpc = CEMShooting(model=model, horizon=args.horizon, shots=args.shots,
                          alpha=args.alpha, iters=args.cem_iters,
                          elites=args.cem_elites,
                          polish_steps=args.polish,
                          polish_topk=args.polish_topk,
                          polish_lr=args.polish_lr)
    else:
        mpc = RandomShooting(model=model, horizon=args.horizon,
                             shots=args.shots, alpha=args.alpha)
    run = make_mpc_episode_recorded(env, mpc, epsilon=args.epsilon)

    key = jax.random.PRNGKey(args.seed)
    t_start = time.time()
    last = time.time()
    for i in range(args.episodes):
        key, k_reset, k_ep = jax.random.split(key, 3)
        state = env_reset(env, k_reset)
        _, ep = run(params, state, k_ep)
        ep = jax.device_get(ep)
        save_episode(
            ep, os.path.join(args.out, "episodes", f"episode{i + 1}.{args.format}")
        )
        now = time.time()
        print(f"episode {i + 1}/{args.episodes} ({now - last:.2f}s)", flush=True)
        last = now
    total = time.time() - t_start
    print(f"TOTAL {args.episodes} episodes in {total:.1f}s "
          f"({total / args.episodes:.2f}s/episode)", flush=True)


if __name__ == "__main__":
    main()
