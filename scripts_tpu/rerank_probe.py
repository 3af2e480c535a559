"""Hardware probe: hybrid exact re-rank cost — sequential scan-of-K vs the
candidate-batched kernel, at full and reduced re-rank resolution.

Measures ONE hybrid selection (topk x horizon true-simulator windows) with
random surrogate params; quality is unaffected by params here — this probe
times the re-rank machinery only. Run when the TPU is otherwise idle.

Usage: python scripts_tpu/rerank_probe.py [--n 700 --rerank-n 350 --topk 16]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import waves_jl_tpu as w
from waves_jl_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
from waves_jl_tpu.control import make_hybrid_action_fused
from waves_jl_tpu.env import env_reset
from waves_jl_tpu.models import AcousticEnergyModel
from datagen import build_env


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=700)
    p.add_argument("--rerank-n", type=int, default=None)
    p.add_argument("--topk", type=int, default=16)
    p.add_argument("--horizon", type=int, default=5)
    p.add_argument("--shots", type=int, default=256)
    p.add_argument("--latent-stride", type=int, default=4)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    env = build_env(args.n, 100, 20)
    model = AcousticEnergyModel.create(
        design_space=w.build_triple_ring_design_space(), source_freq=1000.0,
        elements=1024, h_size=256, nfreq=500,
        integration_steps=100 // args.latent_stride,
        dt=1e-5 * args.latent_stride,
    )
    from __graft_entry__ import _tiny_batch

    params = model.init(
        jax.random.PRNGKey(0),
        _tiny_batch(model, B=1, horizon=1, steps=100 // args.latent_stride,
                    res=128),
    )
    state = env_reset(env, jax.random.PRNGKey(1))
    rerank_env = build_env(args.rerank_n, 100, 20) if args.rerank_n else None

    for batched in (False, True):
        act, _ = make_hybrid_action_fused(
            env, model, horizon=args.horizon, shots=args.shots,
            topk=args.topk, rerank_env=rerank_env, batched=batched,
        )
        k = jax.random.PRNGKey(2)
        a, c = act(params, state, k)  # compile + warm
        jax.block_until_ready(c)
        t0 = time.time()
        for r in range(args.reps):
            a, c = act(params, state, jax.random.fold_in(k, r))
            jax.block_until_ready(c)
        dt_act = (time.time() - t0) / args.reps
        print(
            f"batched={batched}: {dt_act * 1e3:.1f} ms/selection "
            f"(topk={args.topk} x horizon={args.horizon} windows at "
            f"n={args.rerank_n or args.n}; cost={float(c):.4g})",
            flush=True,
        )


if __name__ == "__main__":
    main()
