"""Ranking-distillation fine-tune on exact-ranked candidate pools.

Fine-tunes a trained AcousticEnergyModel checkpoint with a mixed objective:
the standard window MSE on the random-episode dataset (calibration anchor)
plus `models.pool_ranking_loss` on pools of candidate action sequences whose
TRUE simulated cumulative scattered energies were recorded by
`scripts_tpu/datagen_pools.py`. Targets the round-3-measured binding
constraint on pure-surrogate MPC: candidate-ORDERING fidelity on
controlled-trajectory states (RESULTS.md — every optimizer upgrade lands
within ~2 points of plain shooting; the ranking, not the search, binds).

Reports, per validation pass: window val MSE, pool z-MSE, Spearman rank
correlation, top-1 agreement, and mean normalized REGRET (the true-energy
excess of the surrogate's argmin over the pool's true best — the quantity
MPC actually pays). Beyond-reference.

Usage:
  python scripts_tpu/train_pools.py --data data/ref500 --pools data/pools \
      --init-from models/ref500_h8s4_ft/checkpoint_step=1320 \
      --out models/ref500_h8s4_pools [--latent-stride 4 --lr 3e-5]
"""
from __future__ import annotations

import argparse
import glob
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import waves_jl_tpu as w
from waves_jl_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
from waves_jl_tpu.data import dataloader
from waves_jl_tpu.models import AcousticEnergyModel, energy_loss, pool_ranking_loss
from waves_jl_tpu.physics.dynamics import build_tspan
from waves_jl_tpu.train import load_checkpoint, save_checkpoint
from datagen import build_env
from datagen_pools import load_pools
from train import load_dataset


def concat_pools(pool_dicts: list[dict]) -> dict:
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *pool_dicts
    )


def index_pools(pools: dict, idx) -> dict:
    return jax.tree_util.tree_map(lambda v: v[idx], pools)


def pool_metrics(model, params, pools, batch_p: int = 8):
    """Host-side eval over a pool set: z-MSE, Spearman rank correlation,
    top-1 agreement, mean normalized regret."""
    P = pools["y_true"].shape[0]
    K = pools["y_true"].shape[1]
    H = jax.tree_util.tree_leaves(pools["a"])[0].shape[2]
    tgrid = build_tspan(0.0, model.integrator.dt, model.integration_steps * H)

    @jax.jit
    def predict(pb):
        def one(s_wave, s_design, t0, a):
            t = jnp.broadcast_to((t0 + tgrid)[None], (K, tgrid.shape[0]))
            return model.predict_shot_energy(params, s_wave, s_design, a, t)

        return jax.vmap(one)(pb["s_wave"], pb["s_design"], pb["t0"], pb["a"])

    e_hat, y = [], []
    for s in range(0, P - P % batch_p, batch_p):
        pb = index_pools(pools, jnp.arange(s, s + batch_p))
        e_hat.append(np.asarray(predict(pb)))
        y.append(np.asarray(pb["y_true"]))
    e_hat, y = np.concatenate(e_hat), np.concatenate(y)
    # drop no-signal pools (all candidates ~equal, e.g. pre-wavefront
    # states): rank metrics are undefined there and the loss zero-weights
    # them (pool_ranking_loss)
    live = y.std(1) > 0.01 * np.abs(y.mean(1)) + 1e-9
    n_total = len(y)
    e_hat, y = e_hat[live], y[live]
    if len(y) == 0:
        return {"pool_zmse": float("nan"), "spearman": float("nan"),
                "top1": float("nan"), "regret": float("nan"),
                "live_pools": 0, "total_pools": n_total}

    def zscore(v):
        return (v - v.mean(1, keepdims=True)) / (v.std(1, keepdims=True) + 1e-6)

    zmse = float(((zscore(e_hat) - zscore(y)) ** 2).mean())
    r_e = np.argsort(np.argsort(e_hat, axis=1), axis=1)
    r_y = np.argsort(np.argsort(y, axis=1), axis=1)
    spear = float(
        np.mean([np.corrcoef(a, b)[0, 1] for a, b in zip(r_e, r_y)])
    )
    top1 = float(np.mean(e_hat.argmin(1) == y.argmin(1)))
    picked = y[np.arange(len(y)), e_hat.argmin(1)]
    spread = y.max(1) - y.min(1) + 1e-9
    regret = float(np.mean((picked - y.min(1)) / spread))
    return {"pool_zmse": zmse, "spearman": spear, "top1": top1,
            "regret": regret, "live_pools": int(live.sum()),
            "total_pools": n_total}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, nargs="+")
    p.add_argument("--pools", required=True, nargs="+",
                   help="one or more pool dirs; sets with different pool "
                        "sizes K are grouped and interleaved round-robin "
                        "(each K gets its own jit specialization)")
    p.add_argument("--init-from", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--episodes", type=int, default=500)
    p.add_argument("--horizon", type=int, default=8,
                   help="window horizon of the anchor MSE dataset")
    p.add_argument("--latent-stride", type=int, default=4)
    p.add_argument("--epochs", type=int, default=8,
                   help="passes over the pool set")
    p.add_argument("--batch", type=int, default=8, help="anchor window batch")
    p.add_argument("--batch-pools", type=int, default=4,
                   help="pools per update (each K candidates)")
    p.add_argument("--lam", type=float, default=1.0,
                   help="pool ranking-loss weight vs window MSE")
    p.add_argument("--tau", type=float, default=1.0)
    p.add_argument("--listwise-weight", type=float, default=0.5)
    p.add_argument("--lr", type=float, default=3e-5)
    p.add_argument("--val-every", type=int, default=50)
    p.add_argument("--h-size", type=int, default=256)
    p.add_argument("--nfreq", type=int, default=500)
    p.add_argument("--elements", type=int, default=1024)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    # spaces only (treedefs for loading pools); grid must exceed the 128^2
    # observation resolution but is otherwise never integrated
    env = build_env(256, args.steps, 1)
    by_k: dict[int, list] = {}
    for pdir in args.pools:
        paths = sorted(
            glob.glob(os.path.join(pdir, "pools*.npz")),
            key=lambda q: int(
                "".join(c for c in os.path.basename(q) if c.isdigit())),
        )
        assert paths, f"no pools under {pdir}"
        for q in paths:
            ps = load_pools(q, env)
            by_k.setdefault(int(ps["y_true"].shape[1]), []).append(ps)
    train_groups, val_groups = [], []
    for k_size in sorted(by_k):
        sets = by_k[k_size]
        n_val = max(1, len(sets) // 10)
        val_groups.append(concat_pools(sets[-n_val:]))
        train_groups.append(concat_pools(sets[:-n_val]))
        print(f"pools K={k_size}: "
              f"{int(train_groups[-1]['y_true'].shape[0])} train / "
              f"{int(val_groups[-1]['y_true'].shape[0])} val")

    train_data, val_data = load_dataset(
        args.data, args.episodes, args.horizon, stride=args.latent_stride
    )

    model = AcousticEnergyModel.create(
        design_space=w.build_triple_ring_design_space(), source_freq=1000.0,
        elements=args.elements, h_size=args.h_size, nfreq=args.nfreq,
        integration_steps=args.steps // args.latent_stride,
        dt=1e-5 * args.latent_stride,
    )
    init_batch = jax.tree_util.tree_map(lambda x: x[: args.batch], train_data)
    params = model.init(jax.random.PRNGKey(args.seed), init_batch)
    params, _, step0 = load_checkpoint(args.init_from, params)
    print(f"initialized from {args.init_from} (step {step0})")

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def update(params, opt_state, wbatch, pbatch):
        def total(p):
            anchor = energy_loss(model, p, wbatch)
            rank = pool_ranking_loss(
                model, p, pbatch, tau=args.tau,
                listwise_weight=args.listwise_weight,
            )
            return anchor + args.lam * rank, (anchor, rank)

        (loss, (anchor, rank)), grads = jax.value_and_grad(
            total, has_aux=True
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, anchor, rank

    @jax.jit
    def val_mse(params, batch):
        return energy_loss(model, params, batch)

    os.makedirs(args.out, exist_ok=True)
    metrics_path = os.path.join(args.out, "metrics.jsonl")

    def all_val_metrics(params):
        """live-pool-weighted combination over the K-groups' val sets (a
        single pool_metrics dict when only one group exists)."""
        per = [pool_metrics(model, params, vg) for vg in val_groups]
        live = [m for m in per if m["live_pools"]]
        tot = sum(m["live_pools"] for m in live) or 1
        comb = {
            k: sum(m[k] * m["live_pools"] for m in live) / tot
            for k in ("pool_zmse", "spearman", "top1", "regret")
        } if live else {k: float("nan") for k in
                        ("pool_zmse", "spearman", "top1", "regret")}
        comb["live_pools"] = sum(m["live_pools"] for m in per)
        comb["total_pools"] = sum(m["total_pools"] for m in per)
        if len(per) > 1:
            comb["regret_by_k"] = {
                str(int(vg["y_true"].shape[1])): m["regret"]
                for vg, m in zip(val_groups, per)
            }
        return comb

    base = all_val_metrics(params)
    print(f"BEFORE: {base}")
    with open(metrics_path, "a") as f:
        f.write(json.dumps({"step": 0, **base}) + "\n")

    key = jax.random.PRNGKey(args.seed)
    rng = np.random.default_rng(args.seed)
    step = 0
    best = (float("inf"), None)
    for epoch in range(args.epochs):
        key, k_loader = jax.random.split(key)
        # one shuffled schedule of (group, batch-start) over every K-group
        schedule = []
        perms = []
        for g, tg in enumerate(train_groups):
            Pg = int(tg["y_true"].shape[0])
            perms.append(rng.permutation(Pg))
            schedule += [
                (g, s) for s in
                range(0, Pg - Pg % args.batch_pools, args.batch_pools)
            ]
        rng.shuffle(schedule)
        loader = dataloader(train_data, args.batch, k_loader)
        wb_iter = iter(loader)
        for bi, (g, s) in enumerate(schedule):
            try:
                wbatch = next(wb_iter)
            except StopIteration:
                key, k_loader = jax.random.split(key)
                wb_iter = iter(dataloader(train_data, args.batch, k_loader))
                wbatch = next(wb_iter)
            pbatch = index_pools(
                train_groups[g], perms[g][s : s + args.batch_pools]
            )
            t0 = time.time()
            params, opt_state, anchor, rank = update(
                params, opt_state, wbatch, pbatch
            )
            step += 1
            if step % args.val_every == 0 or bi + 1 == len(schedule):
                vloader = dataloader(val_data, args.batch,
                                     jax.random.PRNGKey(step))
                vm = float(np.mean([
                    float(val_mse(params, b))
                    for b in itertools.islice(vloader, 10)
                ]))
                pm = all_val_metrics(params)
                rec = {"step": step, "epoch": epoch,
                       "anchor": float(anchor), "rank": float(rank),
                       "val_mse": vm, **pm,
                       "step_time": time.time() - t0}
                print(json.dumps(rec), flush=True)
                with open(metrics_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                save_checkpoint(
                    os.path.join(args.out, f"checkpoint_step={step}"),
                    params, opt_state, step,
                )
                if pm["regret"] < best[0]:
                    best = (pm["regret"], step)
    print(f"best val regret {best[0]:.4f} @ step {best[1]}")


if __name__ == "__main__":
    main()
