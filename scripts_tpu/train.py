"""Training workflow (reference `scripts/main.jl`).

Loads episodes, prepares horizon windows, trains one of the three surrogate
families with gradient accumulation, periodic validation, checkpoints and
dashboards. Multi-device data parallelism via --dp.

Usage:
  python scripts_tpu/train.py --data data/run1 --model acoustic --out models/run1 \
      [--horizon 1 --epochs 10 --batch 4 --accumulate 8 --episodes 500 --dp]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import waves_jl_tpu as w
from waves_jl_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
from waves_jl_tpu.data import load_episode, prepare_dataset
from waves_jl_tpu.models import (
    AcousticEnergyModel,
    NODEEnergyModel,
    WaveControlPINN,
    WaveControlPINNLoss,
    energy_loss,
    energy_loss_ranking,
    node_loss,
)
from waves_jl_tpu.train import TrainConfig, train


def _load_episodes_dir(data_dir: str, episodes: int):
    shard = (
        data_dir if data_dir.endswith(".wshard")
        else os.path.join(data_dir, "data.wshard")
    )
    if os.path.exists(shard):
        from waves_jl_tpu.data import load_episodes_shard

        return load_episodes_shard(shard, limit=episodes)
    paths = sorted(
        glob.glob(os.path.join(data_dir, "episodes", "episode*.npz"))
        + glob.glob(os.path.join(data_dir, "episodes", "episode*.wbin")),
        key=lambda p: int("".join(c for c in os.path.basename(p) if c.isdigit())),
    )[:episodes]
    assert paths, f"no episodes under {data_dir}"
    return [load_episode(p, device=False) for p in paths]


def load_episodes_split(data_dir, episodes: int, train_val_split: float = 0.9):
    """Load and 90/10-split episodes. `data_dir` may be a list of dataset
    dirs (e.g. random-policy + on-policy); the split is applied per dir so
    validation covers every source distribution, `episodes` caps each dir."""
    dirs = [data_dir] if isinstance(data_dir, str) else list(data_dir)
    train_eps, val_eps = [], []
    for d in dirs:
        eps = _load_episodes_dir(d, episodes)
        idx = int(round(len(eps) * train_val_split))
        train_eps.extend(eps[:idx])
        val_eps.extend(eps[idx:] or eps[-1:])
    return train_eps, val_eps


def load_dataset(data_dir: str, episodes: int, horizon: int,
                 train_val_split: float = 0.9, stride: int = 1):
    train_eps, val_eps = load_episodes_split(data_dir, episodes, train_val_split)
    train_data = prepare_dataset(train_eps, horizon, stride)
    val_data = prepare_dataset(val_eps, horizon, stride)
    return train_data, val_data


def build_model(name: str, steps: int, args):
    space = w.build_triple_ring_design_space()
    stride = getattr(args, "latent_stride", 1)
    assert steps % stride == 0, f"latent stride {stride} must divide {steps}"
    kw = dict(
        elements=args.elements, latent_grid_size=args.latent_gs,
        h_size=args.h_size, nfreq=args.nfreq,
        integration_steps=steps // stride,
    )
    if name == "acoustic":
        model = AcousticEnergyModel.create(
            design_space=space, source_freq=1000.0,
            pml_width=args.pml_width, pml_scale=args.pml_scale,
            dt=1e-5 * stride, **kw,
        )
        if getattr(args, "loss", "mse") == "ranking":
            return model, lambda p, b: energy_loss_ranking(
                model, p, b, beta=args.ranking_beta
            )
        sc_w = getattr(args, "sc_weight", 1.0)
        return model, lambda p, b: energy_loss(model, p, b, sc_weight=sc_w)
    if name == "node":
        model = NODEEnergyModel.create(design_space=space, **kw)
        return model, lambda p, b: node_loss(model, p, b)
    if name == "pinn":
        model = WaveControlPINN.create(design_space=space, source_freq=1000.0, **kw)
        loss = WaveControlPINNLoss(model=model, c0=float(w.WATER))
        return model, lambda p, b: loss(p, b)
    raise ValueError(name)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, nargs="+",
                   help="dataset dir(s); several dirs are concatenated "
                        "(e.g. random-policy + on-policy fine-tune mixes)")
    p.add_argument("--out", required=True)
    p.add_argument("--model", choices=["acoustic", "node", "pinn"], default="acoustic")
    p.add_argument("--episodes", type=int, default=500)
    p.add_argument("--horizon", type=int, default=1)
    p.add_argument("--horizons", type=int, nargs="+", default=None,
                   help="mixed-horizon curriculum via the windowed store "
                        "(round-robin scan chunks; one checkpoint for all "
                        "horizons). Overrides --horizon.")
    p.add_argument("--latent-stride", type=int, default=1,
                   help="latent-dt coarsening factor: the surrogate "
                        "integrates stride-times fewer latent steps per "
                        "action window (dt scaled up to match); targets "
                        "subsampled accordingly. acoustic model only.")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--accumulate", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--val-every", type=int, default=20)
    p.add_argument("--val-batches", type=int, default=None,
                   help="validation minibatches per pass (default: val-every)")
    p.add_argument("--h-size", type=int, default=256)
    p.add_argument("--nfreq", type=int, default=500)
    p.add_argument("--elements", type=int, default=1024)
    p.add_argument("--latent-gs", type=float, default=100.0)
    p.add_argument("--pml-width", type=float, default=10.0)
    p.add_argument("--pml-scale", type=float, default=10000.0)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--loss", choices=["mse", "ranking"], default="mse",
                   help="'ranking' adds a cumulative-scattered-energy term "
                        "(the MPC shot-selection cost) — acoustic only")
    p.add_argument("--ranking-beta", type=float, default=1.0)
    p.add_argument("--sc-weight", type=float, default=1.0,
                   help="scattered-channel weight in the mse loss "
                        "(mean-normalized; 1.0 = reference equal-weight). "
                        "acoustic only")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dp", action="store_true",
                   help="data-parallel over all devices via shard_map")
    p.add_argument("--stream", action="store_true",
                   help="host-resident episode store with per-dispatch "
                        "window upload — removes the HBM dataset-size cap "
                        "(use for >~700 reference-width episodes); "
                        "single-device, fixed --horizon only")
    p.add_argument("--init-from", type=str, default=None,
                   help="checkpoint dir to initialize params from "
                        "(e.g. horizon-20 fine-tune of a horizon-8 run)")
    args = p.parse_args()

    if args.latent_stride > 1:
        assert args.model == "acoustic", "--latent-stride is acoustic-only"

    if args.stream:
        assert not args.horizons and not args.dp, \
            "--stream is single-device, fixed-horizon"
        train_eps, val_eps = load_episodes_split(args.data, args.episodes)
        print(f"streaming over {len(train_eps)} host-resident episodes")
        val_data = prepare_dataset(val_eps, args.horizon, args.latent_stride)
        model, loss_fn = build_model(args.model, args.steps, args)
        init_batch = jax.tree_util.tree_map(lambda x: x[: args.batch], val_data)
        params = model.init(jax.random.PRNGKey(args.seed), init_batch)
    elif args.horizons:
        train_eps, val_eps = load_episodes_split(args.data, args.episodes)
        model, loss_fn = build_model(args.model, args.steps, args)
        from waves_jl_tpu.train import stack_episodes

        # stack the (small) val store for init/plots; the train store is
        # stacked (and mesh-sharded under --dp) inside train_windowed
        store_v = stack_episodes(val_eps)
        from waves_jl_tpu.train.windows import gather_window_batch

        init_idx = jax.numpy.zeros((args.batch, 2), jax.numpy.int32)
        init_batch = gather_window_batch(
            store_v, init_idx, args.horizons[0], args.latent_stride
        )
        params = model.init(jax.random.PRNGKey(args.seed), init_batch)
    else:
        train_data, val_data = load_dataset(
            args.data, args.episodes, args.horizon, stride=args.latent_stride
        )
        model, loss_fn = build_model(args.model, args.steps, args)
        # init on one minibatch, not the whole dataset (a full-dataset forward
        # through the conv encoder OOMs at reference scale)
        init_batch = jax.tree_util.tree_map(lambda x: x[: args.batch], train_data)
        params = model.init(jax.random.PRNGKey(args.seed), init_batch)
    if args.init_from:
        from waves_jl_tpu.train.checkpoint import load_checkpoint

        params, _, step0 = load_checkpoint(args.init_from, params)
        print(f"initialized params from {args.init_from} (step {step0})")

    os.makedirs(args.out, exist_ok=True)
    config = TrainConfig(
        lr=args.lr, batch_size=args.batch, accumulate=args.accumulate,
        epochs=args.epochs, val_every=args.val_every,
        val_batches=args.val_batches or args.val_every, checkpoint_dir=args.out,
        metrics_path=os.path.join(args.out, "metrics.jsonl"), seed=args.seed,
    )

    def on_checkpoint(path, p_):
        from waves_jl_tpu.viz import (
            make_plots_acoustic,
            make_plots_node,
            make_plots_pinn,
        )

        if args.horizons:
            from waves_jl_tpu.train.windows import gather_window_batch

            batch = gather_window_batch(
                store_v,
                jax.numpy.zeros((args.batch, 2), jax.numpy.int32),
                args.horizons[-1], args.latent_stride,
            )
        else:
            from waves_jl_tpu.data import dataloader

            batch = next(iter(dataloader(val_data, args.batch, jax.random.PRNGKey(1))))
        try:
            if args.model == "acoustic":
                make_plots_acoustic(model, p_, batch, path, samples=2)
            elif args.model == "node":
                make_plots_node(model, p_, batch, path, samples=2)
            else:
                make_plots_pinn(model, p_, batch, path, samples=2)
        except Exception as e:  # plots must never kill training
            print(f"plotting failed: {e}")

    mesh = None
    if args.dp:
        from waves_jl_tpu.parallel import make_mesh

        mesh = make_mesh(axis_name="data")
        print(f"data-parallel over {mesh.devices.size} devices")
    if args.stream:
        from waves_jl_tpu.train import train_streaming

        train_streaming(
            loss_fn, params, train_eps, val_data, config,
            horizon=args.horizon, stride=args.latent_stride,
            on_checkpoint=on_checkpoint,
        )
    elif args.horizons:
        from waves_jl_tpu.train import train_windowed

        train_windowed(
            loss_fn, params, train_eps, store_v, config,
            horizons=tuple(args.horizons), stride=args.latent_stride,
            mesh=mesh, on_checkpoint=on_checkpoint,
        )
    else:
        train(loss_fn, params, train_data, val_data, config,
              on_checkpoint=on_checkpoint, mesh=mesh)


if __name__ == "__main__":
    main()
