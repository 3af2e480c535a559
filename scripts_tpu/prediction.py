"""Horizon-sweep prediction error (reference `scripts/prediction.jl` +
`scripts/error_plot.jl`): per-horizon MSE of the scattered-energy
prediction for trained surrogates, with a smoothed comparison plot.

Usage:
  python scripts_tpu/prediction.py --data data/run1 \
      --acoustic models/a/checkpoint_step=N [--node ... --pinn ...] \
      [--horizons 2 4 8 ... --episodes 30 --out error_plot.png]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import waves_jl_tpu as w
from waves_jl_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
from waves_jl_tpu.data import concat_datasets, dataloader, load_episode, prepare_data
from waves_jl_tpu.models import AcousticEnergyModel, NODEEnergyModel, WaveControlPINN
from waves_jl_tpu.train import load_checkpoint


def sweep(model, params, eps, horizons, batch: int, batches: int, scalar_out: bool,
          stride: int = 1, fwd_fn=None, done: dict | None = None,
          on_horizon=None):
    """Per-horizon MSE sample lists. `done` (horizon -> errs) pre-seeds
    results and skips those horizons; `on_horizon(errors_so_far)` fires
    after each fresh horizon — the caller persists partial results so a
    killed run (the axon tunnel can wedge mid-dispatch) resumes where it
    left."""
    errors = dict(done or {})
    for h in horizons:
        if h in errors:
            print(f"horizon {h}: mse {np.mean(errors[h]):.5g} (resumed)",
                  flush=True)
            continue
        data = concat_datasets([prepare_data(ep, h, stride) for ep in eps])
        fwd = jax.jit(fwd_fn or (lambda p, b: model(p, b)))
        errs = []
        for i, b in enumerate(dataloader(data, batch, jax.random.PRNGKey(0))):
            pred = np.asarray(fwd(params, b))
            y_sc = np.asarray(b["y"][:, :, 2])
            p_sc = pred if scalar_out else pred[:, :, 2]
            errs.extend(((p_sc - y_sc) ** 2).mean(axis=1).tolist())
            if i + 1 >= batches:
                break
        errors[h] = errs
        print(f"horizon {h}: mse {np.mean(errs):.5g}", flush=True)
        if on_horizon is not None:
            on_horizon(dict(errors))
    return errors


def loess(x, y, frac: float = 0.6, degree: int = 1):
    """Locally weighted least-squares smoother (tricube weights) — the same
    smoother the reference's error-comparison plot uses
    (`scripts/error_plot.jl:13-51`, Loess.jl defaults: span 0.75-ish,
    degree 2 on dense grids; degree 1 is standard for the short horizon
    grids here). Returns the smooth evaluated at each x."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(x)
    if n < degree + 2:
        return y
    k = max(degree + 2, int(np.ceil(frac * n)))
    out = np.empty(n)
    for i, xi in enumerate(x):
        d = np.abs(x - xi)
        idx = np.argsort(d)[:k]
        dmax = d[idx].max()
        w = (1 - (d[idx] / max(dmax, 1e-12)) ** 3) ** 3
        A = np.vander(x[idx] - xi, degree + 1, increasing=True)
        W = w[:, None]
        coef, *_ = np.linalg.lstsq(A * W, y[idx] * w, rcond=None)
        out[i] = coef[0]
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--acoustic", default=None)
    p.add_argument("--node", default=None)
    p.add_argument("--pinn", default=None)
    p.add_argument("--episodes", type=int, default=30)
    p.add_argument("--horizons", type=int, nargs="+", default=[2, 4, 6, 8, 10, 15, 20])
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--batches", type=int, default=8)
    p.add_argument("--out", default="error_plot.png")
    p.add_argument("--json-out", default="prediction_errors.json")
    p.add_argument("--force", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="seed from an existing --json-out and skip its "
                        "(model, horizon) entries; partial results are "
                        "flushed to --json-out after every horizon")
    p.add_argument("--h-size", type=int, default=256)
    p.add_argument("--nfreq", type=int, default=500)
    p.add_argument("--elements", type=int, default=1024)
    p.add_argument("--latent-stride", type=int, default=1,
                   help="latent-dt coarsening of the acoustic checkpoint")
    p.add_argument("--pinn-chunk", type=int, default=16,
                   help="PINC field-net time-rows per evaluation chunk "
                        "(bounds live activations to (B, chunk*E, h) so "
                        "long horizons fit HBM; 0 = unchunked full-field "
                        "path)")
    args = p.parse_args()

    if os.path.exists(args.json_out) and not (args.force or args.resume):
        sys.exit(f"refusing to overwrite {args.json_out} (pass --force, "
                 "--resume or --json-out)")

    prior = {}
    if args.resume and os.path.exists(args.json_out):
        with open(args.json_out) as f:
            prior = {k: {int(h): v for h, v in r.items()}
                     for k, r in json.load(f).items()}
        print(f"resuming from {args.json_out}: "
              f"{ {k: len(v) for k, v in prior.items()} }", flush=True)

    import glob

    paths = sorted(
        glob.glob(os.path.join(args.data, "episodes", "episode*.npz"))
        + glob.glob(os.path.join(args.data, "episodes", "episode*.wbin"))
    )
    if paths:
        eps = [load_episode(pth) for pth in paths[-args.episodes :]]
    else:
        # `datagen --format shard` stores the whole dataset in one mmap
        from waves_jl_tpu.data import load_episodes_shard

        eps = load_episodes_shard(
            os.path.join(args.data, "data.wshard"), limit=args.episodes
        )
    print(f"{len(eps)} evaluation episodes", flush=True)
    space = w.build_triple_ring_design_space()
    kw = dict(elements=args.elements, h_size=args.h_size, nfreq=args.nfreq,
              integration_steps=100)
    stride = args.latent_stride
    akw = dict(kw, integration_steps=100 // stride, dt=1e-5 * stride)

    from __graft_entry__ import _tiny_batch

    results = {}
    specs = [
        ("acoustic", args.acoustic,
         lambda: AcousticEnergyModel.create(design_space=space, source_freq=1000.0, **akw),
         False, stride),
        ("node", args.node,
         lambda: NODEEnergyModel.create(design_space=space, **kw), True, 1),
        ("pinn", args.pinn,
         lambda: WaveControlPINN.create(design_space=space, source_freq=1000.0, **kw),
         False, 1),
    ]
    for name, ckpt, make, scalar_out, mstride in specs:
        if ckpt is None:
            continue
        model = make()
        like = model.init(jax.random.PRNGKey(0),
                          _tiny_batch(model, B=1, horizon=1,
                                      steps=100 // mstride, res=128))
        params, _, _ = load_checkpoint(ckpt, like)
        fwd_fn = None
        if name == "pinn" and args.pinn_chunk:
            chunk = args.pinn_chunk
            fwd_fn = lambda p, b: model.predict_energy(p, b, time_chunk=chunk)
        def flush_partial(errors_so_far, _name=name):
            snap = dict(results)
            snap[_name] = errors_so_far
            with open(args.json_out, "w") as f:
                json.dump({k: {str(hh): v for hh, v in r.items()}
                           for k, r in snap.items()}, f)

        results[name] = sweep(model, params, eps, args.horizons, args.batch,
                              args.batches, scalar_out, mstride, fwd_fn=fwd_fn,
                              done=prior.get(name), on_horizon=flush_partial)

    with open(args.json_out, "w") as f:
        json.dump({k: {str(h): v for h, v in r.items()} for k, r in results.items()}, f)
    print(f"wrote {args.json_out}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    colors = {"acoustic": "green", "node": "red", "pinn": "purple"}
    labels = {"acoustic": "Ours (PML)", "node": "NeuralODE", "pinn": "PINC"}
    for name, errs in results.items():
        hs = sorted(errs)
        means = [float(np.mean(errs[h])) for h in hs]
        smooth = loess(hs, means)
        # +-1.92 std/sqrt(n) band around the loess line, as the reference
        # plot draws (`scripts/error_plot.jl:17-19`)
        half = np.array([
            1.92 * float(np.std(errs[h])) / np.sqrt(max(len(errs[h]), 1))
            for h in hs
        ])
        ax.plot(hs, smooth, color=colors[name], label=labels[name])
        ax.fill_between(hs, smooth - half, smooth + half,
                        color=colors[name], alpha=0.1)
        ax.scatter(hs, means, color=colors[name], s=12)
    ax.set_xlabel("Prediction horizon (actions)")
    ax.set_ylabel("Scattered-energy MSE")
    ax.legend()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
