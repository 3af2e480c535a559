"""Behavior-clone a search-based MPC controller into a one-shot policy.

The distillation ladder's endgame (RESULTS.md): the deployed record
controller (CEM + gradient polish on the DAgger-iterated distilled
surrogate) is amortized into `models.AmortizedPolicy` — one conv forward
per action, zero candidate rollouts at decision time. Train on its own
episode traces harvested with
`datagen_onpolicy.py --controller cem --polish ... --epsilon 0`.

No reference counterpart (`scripts/mpc.jl` always searches at decision
time); evaluate with `scripts_tpu/mpc.py --controller policy`.

Usage:
  python scripts_tpu/train_bc.py --data data/bc_traces --out models/bc \
      [--epochs 20 --batch 32 --lr 3e-4 --h-size 256]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import waves_jl_tpu as w
from waves_jl_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
from waves_jl_tpu.models import AmortizedPolicy, bc_loss
from waves_jl_tpu.train import TrainConfig, train
from train import load_episodes_split  # scripts_tpu/train.py helpers


def episodes_to_bc_dataset(eps):
    """Stack per-action (observation, design, chosen action) records from
    recorded controller episodes into one flat dataset dict (keys match
    the Episode fields so the generic dataloader applies)."""
    stacked = [
        {"s_wave": ep.s_wave, "s_design": ep.s_design, "a": ep.a}
        for ep in eps
    ]
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate([jnp.asarray(x) for x in xs], axis=0),
        *stacked,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, nargs="+",
                   help="recorded-controller episode dir(s) "
                        "(datagen_onpolicy --epsilon 0)")
    p.add_argument("--out", required=True)
    p.add_argument("--episodes", type=int, default=1000)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--accumulate", type=int, default=1)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--val-every", type=int, default=50)
    p.add_argument("--h-size", type=int, default=256)
    p.add_argument("--action-scale", type=float, default=0.25,
                   help="env action-space scale = action_speed*dt*steps "
                        "(make_wave_env reference defaults: 250*1e-5*100)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    train_eps, val_eps = load_episodes_split(args.data, args.episodes)
    train_data = episodes_to_bc_dataset(train_eps)
    val_data = episodes_to_bc_dataset(val_eps)
    n = train_data["s_wave"].shape[0]
    print(f"{n} train / {val_data['s_wave'].shape[0]} val state-action pairs")

    space = w.build_triple_ring_design_space()
    action_space = w.build_action_space(space.low, args.action_scale)
    policy = AmortizedPolicy.create(space, action_space, h_size=args.h_size)
    sample_design = jax.tree_util.tree_map(lambda x: x[0], train_data["s_design"])
    params = policy.init(
        jax.random.PRNGKey(args.seed), train_data["s_wave"][0], sample_design
    )

    os.makedirs(args.out, exist_ok=True)
    config = TrainConfig(
        lr=args.lr, batch_size=args.batch, accumulate=args.accumulate,
        epochs=args.epochs, val_every=args.val_every,
        val_batches=args.val_every, checkpoint_dir=args.out,
        metrics_path=os.path.join(args.out, "metrics.jsonl"), seed=args.seed,
    )
    train(lambda p_, b: bc_loss(policy, p_, b), params, train_data, val_data,
          config)


if __name__ == "__main__":
    main()
