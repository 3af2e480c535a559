"""Latent-space dashboard (reference `scripts/latent_space.jl`): roll the
real env for T actions, run the surrogate over the same (s, a, t) horizon,
and produce: real-vs-latent scattered-energy comparison, the real field
video, and the latent scattered-field video.

Usage:
  python scripts_tpu/latent_space.py --checkpoint models/.../checkpoint_step=N \
      [--actions 20 --out dashboard/ --n 700 --h-size 256 --nfreq 500 --elements 1024]

(the dashboard rolls its own episode; --data is accepted but unused, kept
only for CLI compatibility with the other workflow scripts)
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import waves_jl_tpu as w
from waves_jl_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
from waves_jl_tpu.data import generate_episode_fused
from waves_jl_tpu.env import RandomDesignPolicy, env_reset
from waves_jl_tpu.models import AcousticEnergyModel
from waves_jl_tpu.physics.fused import make_env_step_fused
from waves_jl_tpu.train import load_checkpoint
from waves_jl_tpu.utils.interp import flatten_repeated_last_dim
from datagen import build_env


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default=None,
                   help="unused (the dashboard rolls its own episode); "
                        "kept for CLI compatibility")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--actions", type=int, default=20)
    p.add_argument("--out", default="dashboard")
    p.add_argument("--n", type=int, default=700)
    p.add_argument("--h-size", type=int, default=256)
    p.add_argument("--nfreq", type=int, default=500)
    p.add_argument("--elements", type=int, default=1024)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--latent-stride", type=int, default=1,
                   help="latent-dt coarsening of the checkpoint (must match "
                        "its training; the flagship h8s4 family is stride 4)")
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    stride = args.latent_stride
    env = build_env(args.n, 100, args.actions)
    model = AcousticEnergyModel.create(
        design_space=w.build_triple_ring_design_space(), source_freq=1000.0,
        elements=args.elements, h_size=args.h_size, nfreq=args.nfreq,
        integration_steps=100 // stride, dt=1e-5 * stride,
    )
    from __graft_entry__ import _tiny_batch

    like = model.init(
        jax.random.PRNGKey(0),
        _tiny_batch(model, B=1, horizon=1, steps=100 // stride, res=128),
    )
    params, _, _ = load_checkpoint(args.checkpoint, like)

    # real rollout: one episode with recorded obs/actions/signals
    key = jax.random.PRNGKey(args.seed)
    fused_step = make_env_step_fused(env)
    policy = RandomDesignPolicy(env.action_space)
    state = env_reset(env, key)
    final, ep = generate_episode_fused(env, policy, key, fused_step, state=state)
    # joined real signal over the full horizon: (L, 3)
    y = np.asarray(
        flatten_repeated_last_dim(jnp.moveaxis(ep.y, -1, 0))
    ).T  # (L, 3)
    t = np.asarray(flatten_repeated_last_dim(ep.s_tspan))  # (L,)

    # surrogate over the same initial state + full action sequence; a
    # stride-s checkpoint integrates on the stride-subsampled time grid,
    # so compare against the real signal at the same instants
    t_lat = t[::stride]
    y_cmp = y[::stride]
    batch = {
        "s_wave": ep.s_wave[:1],
        "s_design": jax.tree_util.tree_map(lambda x: x[:1], ep.s_design),
        "a": jax.tree_util.tree_map(lambda x: x[None], ep.a),
        "t": jnp.asarray(t_lat)[None],
    }
    y_hat = np.asarray(model(params, batch))[0]  # (L/stride, 3)
    z = np.asarray(model.generate_latent_solution(params, batch))[:, 0]

    # 1. real vs latent scattered energy
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.plot(t, y[:, 2], color="blue", label="Real")
    ax.plot(t_lat, y_hat[:, 2], color="green", alpha=0.7, label="Latent (surrogate)")
    ax.set_title("Real vs Latent Scattered Energy over Time")
    ax.set_xlabel("Time (s)")
    ax.set_ylabel("Energy")
    ax.legend()
    fig.savefig(os.path.join(args.out, "real_vs_latent_sc.png"), dpi=120)
    plt.close(fig)
    mse = float(np.mean((y_cmp - y_hat) ** 2))
    print(f"real-vs-latent energy mse over {args.actions} actions: {mse:.5g}")

    # 2. latent scattered-field video
    from waves_jl_tpu.viz import render_line_video

    sc = z[:, 0] - z[:, 2]
    render_line_video(
        np.asarray(model.latent_dim.x), sc[:: max(1, len(sc) // 240)],
        os.path.join(args.out, "latent_sc.mp4"),
    )
    print(f"wrote {args.out}/")


if __name__ == "__main__":
    main()
