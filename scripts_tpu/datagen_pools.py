"""Exact-ranked candidate-pool dataset generation for ranking distillation.

Round-3 finding (RESULTS.md): every pure-surrogate search upgrade (CEM,
ensembles, ranking-aligned window loss, longer lookahead) lands within ~2
points of plain shooting — the surrogate's candidate ORDERING, not the
optimizer, binds control quality. This workflow manufactures direct
supervision for that ordering: at each state of a controlled episode it
samples K uniform candidate action sequences, evaluates every one with the
TRUE fused-kernel simulator (on a reduced-resolution grid — measured
ranking-equivalent, RESULTS.md), and records the pool. Episodes advance
under the exact-cost argmin (epsilon-mixed with random actions), so the
recorded states cover the controlled-trajectory distribution the controller
is evaluated on. Beyond-reference (`scripts/data.jl` trains on random
windows only).

Fine-tune with `scripts_tpu/train_pools.py` (`models.pool_ranking_loss`).

Usage:
  python scripts_tpu/datagen_pools.py --episodes 40 --out data/pools \
      [--pool 16 --horizon 5 --rerank-n 350 --epsilon 0.2]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import waves_jl_tpu as w
from waves_jl_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
from waves_jl_tpu.control import make_pool_probe_fused
from waves_jl_tpu.env import RandomDesignPolicy, env_reset, env_terminated
from datagen import build_env


def save_pools(path: str, pools: list[dict]):
    """Stack per-action pool records and save one flat npz; pytree-valued
    fields (design, actions) are flattened to indexed leaves — the loader
    rebuilds them against a treedef from the same env construction."""
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *pools)
    flat = {}
    for name in ("s_wave", "t0", "y_true", "penalty"):
        flat[name] = np.asarray(stacked[name])
    for prefix in ("s_design", "a"):
        for i, leaf in enumerate(jax.tree_util.tree_leaves(stacked[prefix])):
            flat[f"{prefix}_{i}"] = np.asarray(leaf)
    np.savez_compressed(path, **flat)


def load_pools(path: str, env) -> dict:
    """Rebuild the pool pytrees using treedefs from `env`'s design/action
    spaces (the same construction `save_pools`'s producer used)."""
    data = np.load(path)
    d_tree = jax.tree_util.tree_structure(env.design_space.low)
    a_tree = jax.tree_util.tree_structure(env.action_space.low)
    out = {name: jax.numpy.asarray(data[name])
           for name in ("s_wave", "t0", "y_true", "penalty")}
    for prefix, tdef in (("s_design", d_tree), ("a", a_tree)):
        leaves = [jax.numpy.asarray(data[f"{prefix}_{i}"])
                  for i in range(tdef.num_leaves)]
        out[prefix] = jax.tree_util.tree_unflatten(tdef, leaves)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--episodes", type=int, default=40)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--pool", type=int, default=16,
                   help="candidates exactly evaluated per state")
    p.add_argument("--horizon", type=int, default=5)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--epsilon", type=float, default=0.2,
                   help="per-window probability of advancing with a random "
                        "action instead of the exact-cost argmin")
    p.add_argument("--n", type=int, default=700)
    p.add_argument("--rerank-n", type=int, default=350,
                   help="grid for the exact pool evaluations (ranking-"
                        "equivalent at ~(n/m)^2 the cost)")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--actions", type=int, default=20)
    p.add_argument("--refine-samples", type=int, default=0,
                   help="exact-elite Gaussian resamples added to each pool "
                        "(near-optimal contrast candidates; pool size grows "
                        "to pool + refine_samples)")
    p.add_argument("--refine-elites", type=int, default=4)
    p.add_argument("--checkpoint", type=str, default=None,
                   help="distilled surrogate checkpoint — enables the DAgger "
                        "harvest: episodes advance under THIS controller's "
                        "CEM choice and --searcher-samples of each pool are "
                        "its own surrogate-best proposals")
    p.add_argument("--searcher-samples", type=int, default=8)
    p.add_argument("--cem-iters", type=int, default=3)
    p.add_argument("--cem-elites", type=int, default=32)
    p.add_argument("--polish", type=int, default=0,
                   help="gradient-polish steps for the DAgger searcher — "
                        "harvest under the deployed CEM+polish controller")
    p.add_argument("--polish-topk", type=int, default=16)
    p.add_argument("--polish-lr", type=float, default=0.02)
    p.add_argument("--shots", type=int, default=256)
    p.add_argument("--latent-stride", type=int, default=4)
    p.add_argument("--seed", type=int, default=1000)
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    env = build_env(args.n, args.steps, args.actions)
    rerank_env = build_env(args.rerank_n, args.steps, args.actions) \
        if args.rerank_n and args.rerank_n != args.n else None
    with open(os.path.join(args.out, "pools.json"), "w") as f:
        json.dump({"n": args.n, "rerank_n": args.rerank_n, "pool": args.pool,
                   "horizon": args.horizon, "alpha": args.alpha,
                   "epsilon": args.epsilon, "steps": args.steps,
                   "actions": args.actions, "episodes": args.episodes,
                   "refine_samples": args.refine_samples,
                   "refine_elites": args.refine_elites,
                   "checkpoint": args.checkpoint,
                   "searcher_samples":
                       args.searcher_samples if args.checkpoint else 0,
                   "shots": args.shots if args.checkpoint else None,
                   "polish": args.polish if args.checkpoint else 0,
                   "polish_topk": args.polish_topk,
                   "polish_lr": args.polish_lr}, f)

    searcher, params = None, None
    if args.checkpoint:
        import waves_jl_tpu as w
        from waves_jl_tpu.control import CEMShooting
        from waves_jl_tpu.models import AcousticEnergyModel
        from waves_jl_tpu.train import load_checkpoint
        from __graft_entry__ import _tiny_batch

        model = AcousticEnergyModel.create(
            design_space=w.build_triple_ring_design_space(),
            source_freq=1000.0, elements=1024, h_size=256, nfreq=500,
            integration_steps=args.steps // args.latent_stride,
            dt=1e-5 * args.latent_stride,
        )
        like = model.init(
            jax.random.PRNGKey(0),
            _tiny_batch(model, B=1, horizon=1,
                        steps=args.steps // args.latent_stride, res=128),
        )
        params, _, step_no = load_checkpoint(args.checkpoint, like)
        print(f"DAgger harvest under CEM on checkpoint step {step_no}")
        searcher = CEMShooting(
            model=model, horizon=args.horizon, shots=args.shots,
            alpha=args.alpha, iters=args.cem_iters, elites=args.cem_elites,
            polish_steps=args.polish, polish_topk=args.polish_topk,
            polish_lr=args.polish_lr,
        )

    probe, step = make_pool_probe_fused(
        env, K=args.pool, horizon=args.horizon, alpha=args.alpha,
        rerank_env=rerank_env,
        refine_samples=args.refine_samples, refine_elites=args.refine_elites,
        searcher=searcher,
        searcher_samples=args.searcher_samples if searcher else 0,
    )
    policy = RandomDesignPolicy(env.action_space)
    rng = np.random.default_rng(args.seed)

    key = jax.random.PRNGKey(args.seed)
    t_start = time.time()
    for i in range(args.episodes):
        key, k_reset = jax.random.split(key)
        state = env_reset(env, k_reset)
        pools = []
        last = time.time()
        while not bool(env_terminated(env, state)):
            key, k_pool, k_rnd = jax.random.split(key, 3)
            if searcher is None:
                pool, a_best = probe(state, k_pool)
            else:
                pool, a_best = probe(params, state, k_pool)
            pools.append(jax.device_get(pool))
            a = policy(k_rnd) if rng.random() < args.epsilon else a_best
            state, _ = step(state, a)
        save_pools(os.path.join(args.out, f"pools{i + 1}.npz"), pools)
        print(f"episode {i + 1}/{args.episodes}: {len(pools)} pools "
              f"({time.time() - last:.2f}s)", flush=True)
    total = time.time() - t_start
    print(f"TOTAL {args.episodes} episodes in {total:.1f}s "
          f"({total / args.episodes:.2f}s/episode)", flush=True)


if __name__ == "__main__":
    main()
