"""MPC evaluation workflow (reference `scripts/mpc.jl` + `scripts/test.jl`).

Loads a trained surrogate checkpoint, runs MPC-controlled episodes vs
random-policy episodes from identical (design, source) resets, reports the
percentage decrease in scattered energy, and optionally renders videos.

Usage:
  python scripts_tpu/mpc.py --data data/run1 --checkpoint models/run1/checkpoint_step=N \
      [--episodes 4 --horizon 5 --shots 256 --alpha 1.0 --actions 20 --render out.mp4 \
       --controller random_shooting|gradient]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import waves_jl_tpu as w
from waves_jl_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
from waves_jl_tpu.control import (
    CEMShooting,
    GradientShooting,
    RandomShooting,
)
from waves_jl_tpu.env import (
    RandomDesignPolicy,
    env_reset,
    env_step,
    env_terminated,
)
from waves_jl_tpu.models import AcousticEnergyModel
from waves_jl_tpu.train import load_checkpoint
from datagen import build_env


def run_episode(env, act_fn, state, key, step=None):
    """Roll an episode from a fixed reset; act_fn(state, key) -> action.
    Returns stacked signals (A, steps+1, 3)."""
    if step is None:
        step = jax.jit(lambda s, a: env_step(env, s, a))
    signals = []
    import time as _time

    while not bool(env_terminated(env, state)):
        t0 = _time.time()
        key, k = jax.random.split(key)
        state, _ = step(state, act_fn(state, k))
        signals.append(np.asarray(state.signal))
        print(f"  t={int(state.time_step)} ({_time.time() - t0:.2f}s)", flush=True)
    return np.stack(signals)


def scattered_tail_mean(signals):
    """Mean scattered energy over the second half of the episode
    (reference `scripts/test.jl:36-41`)."""
    sc = signals[:, :, 2].reshape(-1)
    return float(sc[len(sc) // 2 :].mean())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default=None,
                   help="unused; kept for launcher compatibility "
                        "(the protocol builds its own envs/resets)")
    p.add_argument("--checkpoint", default=None, nargs="+",
                   help="surrogate checkpoint(s); several for --controller "
                        "ensemble (not needed for --controller oracle)")
    p.add_argument("--episodes", type=int, default=4)
    p.add_argument("--locations", type=int, default=5,
                   help="fixed source y-locations (reference scripts/test.jl)")
    p.add_argument("--fast", action="store_true",
                   help="bf16 latent-matmul action ranking (~4x selection rate)")
    p.add_argument("--horizon", type=int, default=5)
    p.add_argument("--shots", type=int, default=256)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--actions", type=int, default=20)
    p.add_argument("--n", type=int, default=700)
    p.add_argument("--controller",
                   choices=["random_shooting", "cem", "gradient", "oracle",
                            "ensemble", "hybrid", "policy"],
                   default="random_shooting")
    p.add_argument("--policy-h-size", type=int, default=256,
                   help="policy net width (--controller policy; the "
                        "checkpoint is a train_bc.py AmortizedPolicy)")
    p.add_argument("--beta", type=float, default=1.0,
                   help="ensemble disagreement-penalty weight")
    p.add_argument("--topk", type=int, default=8,
                   help="hybrid: candidates the true simulator re-ranks")
    p.add_argument("--hybrid-cem", action="store_true",
                   help="hybrid: prune a CEM-refined pool instead of raw "
                        "uniform samples")
    p.add_argument("--rerank-n", type=int, default=None,
                   help="hybrid: grid size for a reduced-resolution exact "
                        "re-rank (winning action still applied at --n)")
    p.add_argument("--batched-rerank", action="store_true",
                   help="hybrid: run the top-k re-rank through the "
                        "candidate-batched kernel (one grid-(K, tiles) "
                        "program instead of a scan of K rollouts)")
    p.add_argument("--exact-rounds", type=int, default=1,
                   help="hybrid: exact-CEM refinement rounds — each extra "
                        "round exactly evaluates topk fresh candidates "
                        "sampled around the exact-cost elites; the chosen "
                        "true cost is monotone in rounds (total exact "
                        "budget = rounds x topk)")
    p.add_argument("--exact-elites", type=int, default=8)
    p.add_argument("--fused-episode", action="store_true",
                   help="hybrid: whole episode in ONE device program "
                        "(removes ~60 ms/action of tunnel dispatches; only "
                        "for configs whose episode device time is under the "
                        "tunneled worker's ~1 min dispatch kill — topk<=64 "
                        "at --rerank-n 350, anything at 175)")
    p.add_argument("--cem-iters", type=int, default=3)
    p.add_argument("--cem-elites", type=int, default=32)
    p.add_argument("--cem-polish", type=int, default=0,
                   help="CEM-then-gradient polish: projected descent steps "
                        "applied to the top-k elites through the "
                        "differentiable surrogate rollout (remat)")
    p.add_argument("--cem-polish-topk", type=int, default=8)
    p.add_argument("--cem-polish-lr", type=float, default=0.02)
    p.add_argument("--cem-warm", action="store_true",
                   help="receding-horizon warm start: the previous "
                        "selection's shifted plan seeds each round-0 pool")
    p.add_argument("--latent-stride", type=int, default=1,
                   help="latent-dt coarsening of the surrogate checkpoint "
                        "(must match how it was trained)")
    p.add_argument("--render", type=str, default=None)
    p.add_argument("--h-size", type=int, default=256)
    p.add_argument("--nfreq", type=int, default=500)
    p.add_argument("--elements", type=int, default=1024)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="mpc_results.json",
                   help="result JSON path; refuses to overwrite unless "
                        "--force (artifact hygiene: the round-2 headline "
                        "was clobbered by a later demo run)")
    p.add_argument("--force", action="store_true")
    args = p.parse_args()

    if os.path.exists(args.out) and not args.force:
        sys.exit(f"refusing to overwrite {args.out} (pass --force or --out)")
    if args.controller != "oracle" and not args.checkpoint:
        sys.exit("--checkpoint is required for surrogate controllers")

    env = build_env(args.n, 100, args.actions)
    model = AcousticEnergyModel.create(
        design_space=w.build_triple_ring_design_space(), source_freq=1000.0,
        elements=args.elements, h_size=args.h_size, nfreq=args.nfreq,
        integration_steps=100 // args.latent_stride, dt=1e-5 * args.latent_stride,
    )
    dummy = env_reset(env, jax.random.PRNGKey(0))
    if args.controller == "policy":
        from waves_jl_tpu.env import env_observe
        from waves_jl_tpu.models import AmortizedPolicy

        space = w.build_triple_ring_design_space()
        policy_model = AmortizedPolicy.create(
            space, env.action_space, h_size=args.policy_h_size
        )
        obs0 = env_observe(env, dummy)
        params_like = policy_model.init(
            jax.random.PRNGKey(0), obs0.wave, dummy.design
        )
        assert len(args.checkpoint) == 1, "--controller policy takes one ckpt"
        params, _, step_no = load_checkpoint(args.checkpoint[0], params_like)
        print(f"loaded policy checkpoint step {step_no} "
              f"({args.checkpoint[0]})")
    elif args.controller == "oracle":
        params = None  # true-simulator shooting needs no surrogate weights
    else:
        from __graft_entry__ import _tiny_batch

        params_like = model.init(
            jax.random.PRNGKey(0),
            _tiny_batch(model, B=1, horizon=1,
                        steps=100 // args.latent_stride, res=128),
        )
        loaded = []
        for ck in args.checkpoint:
            pm, _, step_no = load_checkpoint(ck, params_like)
            loaded.append(pm)
            print(f"loaded checkpoint step {step_no} ({ck})")
        params = tuple(loaded) if args.controller == "ensemble" else loaded[0]
        if args.controller != "ensemble" and len(loaded) > 1:
            sys.exit("multiple checkpoints require --controller ensemble")

    if args.fast:
        model = model.fast_ranking()
        print("fast-ranking mode: bf16 latent matmul")
    if args.controller == "random_shooting":
        mpc = RandomShooting(model=model, horizon=args.horizon, shots=args.shots,
                             alpha=args.alpha)
    elif args.controller == "cem":
        mpc = CEMShooting(model=model, horizon=args.horizon, shots=args.shots,
                          alpha=args.alpha, iters=args.cem_iters,
                          elites=args.cem_elites, warm=args.cem_warm,
                          polish_steps=args.cem_polish,
                          polish_topk=args.cem_polish_topk,
                          polish_lr=args.cem_polish_lr)
    elif args.controller == "ensemble":
        from waves_jl_tpu.control import EnsembleShooting

        mpc = EnsembleShooting(models=tuple(model for _ in params),
                               horizon=args.horizon, shots=args.shots,
                               alpha=args.alpha, beta=args.beta)
    elif args.controller in ("oracle", "hybrid", "policy"):
        mpc = None  # selection is built below (per-action fused programs)
    else:
        mpc = GradientShooting(model=model, horizon=args.horizon,
                               shots=max(8, args.shots // 8), alpha=args.alpha)
    policy = RandomDesignPolicy(env.action_space)

    # whole-episode fused programs: one dispatch per episode for both the
    # MPC controller (observe -> shots-batch surrogate -> argmin -> Pallas
    # window, scanned over actions) and the random baseline
    from waves_jl_tpu.control import make_mpc_episode_fused
    from waves_jl_tpu.data import make_episode_fused

    # the bf16-fast program raises XLA's context-dependent scoped-VMEM
    # pressure around the Pallas call past the 16 MB budget at tile 48;
    # tile 40 costs ~3% on the env windows and compiles in both programs
    if args.controller == "oracle":
        # per-action dispatches: the tunneled worker kills single dispatches
        # past ~1 min, which a whole-episode 64+-shot oracle exceeds
        from waves_jl_tpu.control import make_oracle_action_fused

        oracle_act, oracle_step = make_oracle_action_fused(
            env, horizon=args.horizon, shots=args.shots, alpha=args.alpha
        )

        def run_mpc(pm, s, k):
            signals, costs = [], []
            for _ in range(env.actions):
                k, kk = jax.random.split(k)
                a, c = oracle_act(s, kk)
                s, _ = oracle_step(s, a)
                signals.append(s.signal)
                costs.append(c)
            return s, jnp.stack(signals), jnp.stack(costs)
    elif args.controller == "hybrid":
        from waves_jl_tpu.control import make_hybrid_action_fused

        searcher = None
        if args.hybrid_cem:
            searcher = CEMShooting(
                model=model, horizon=args.horizon, shots=args.shots,
                alpha=args.alpha, iters=args.cem_iters, elites=args.cem_elites,
            )
        rerank_env = (
            build_env(args.rerank_n, 100, args.actions)
            if args.rerank_n else None
        )
        if args.fused_episode:
            from waves_jl_tpu.control import make_hybrid_episode_fused

            run_mpc = make_hybrid_episode_fused(
                env, model, horizon=args.horizon, shots=args.shots,
                topk=args.topk, alpha=args.alpha, searcher=searcher,
                rerank_env=rerank_env, exact_rounds=args.exact_rounds,
                exact_elites=args.exact_elites,
            )
        else:
            hybrid_act, hybrid_step = make_hybrid_action_fused(
                env, model, horizon=args.horizon, shots=args.shots,
                topk=args.topk, alpha=args.alpha, searcher=searcher,
                rerank_env=rerank_env, batched=args.batched_rerank,
                exact_rounds=args.exact_rounds,
                exact_elites=args.exact_elites,
            )

            def run_mpc(pm, s, k):
                signals, costs = [], []
                for _ in range(env.actions):
                    k, kk = jax.random.split(k)
                    a, c = hybrid_act(pm, s, kk)
                    s, _ = hybrid_step(s, a)
                    signals.append(s.signal)
                    costs.append(c)
                return s, jnp.stack(signals), jnp.stack(costs)
    elif args.controller == "policy":
        from waves_jl_tpu.control import make_policy_episode_fused

        run_mpc = make_policy_episode_fused(env, policy_model)
    else:
        run_mpc = make_mpc_episode_fused(
            env, mpc, tile_interior=40 if args.fast else 48
        )
    run_rnd = make_episode_fused(env)

    import dataclasses
    import time as _time

    def fixed_source_state(key, y_pos):
        """Reset with the source pinned at (-10, y_pos) — the reference
        protocol evaluates 5 fixed source locations x `episodes` resets
        (`scripts/test.jl:8-18`, source line x=-10, y in [-10, 10])."""
        state = env_reset(env, key)
        mu = jnp.array([[-10.0, float(y_pos)]], jnp.float32)
        src = state.source
        src = dataclasses.replace(
            src, mu_low=mu, mu_high=mu,
            shape=w.build_normal(src.grid, mu, src.sigma, src.a),
        )
        return dataclasses.replace(state, source=src)

    locations = np.linspace(-10.0, 10.0, args.locations) if args.locations > 1 else [0.0]
    per_location = []
    episode_times = []
    for li, y_pos in enumerate(locations):
        mpc_tails, rnd_tails = [], []
        for ep in range(args.episodes):
            base = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(args.seed), li), ep
            )
            k_reset, k_mpc, k_rnd = jax.random.split(base, 3)
            state = fixed_source_state(k_reset, y_pos)

            t0 = _time.time()
            _, mpc_sig, _ = run_mpc(params, state, k_mpc)
            mpc_sig = np.asarray(mpc_sig)
            el = _time.time() - t0
            episode_times.append(el)

            akeys = jax.random.split(k_rnd, env.actions)
            actions = jax.vmap(policy)(akeys)
            _, rnd_ep = run_rnd(state, actions)
            rnd_sig = np.asarray(rnd_ep.y)

            m, r = scattered_tail_mean(mpc_sig), scattered_tail_mean(rnd_sig)
            mpc_tails.append(m)
            rnd_tails.append(r)
            print(f"loc {li + 1} ep {ep + 1}: mpc={m:.4g} random={r:.4g} "
                  f"({el:.2f}s/episode)", flush=True)
        m, r = float(np.mean(mpc_tails)), float(np.mean(rnd_tails))
        dec = (r - m) / r if r > 0 else 0.0
        per_location.append(dec)
        print(f"location {li + 1} (y={y_pos:+.1f}): decrease={dec:.1%}", flush=True)

    result = {
        "percentage_decrease": per_location,
        "mean_decrease": float(np.mean(per_location)),
        "controller": args.controller,
        "checkpoint": (args.checkpoint[0]
                       if args.checkpoint and len(args.checkpoint) == 1
                       else args.checkpoint),
        "beta": args.beta if args.controller == "ensemble" else None,
        "topk": args.topk if args.controller == "hybrid" else None,
        "rerank_n": args.rerank_n if args.controller == "hybrid" else None,
        "hybrid_cem": args.hybrid_cem if args.controller == "hybrid" else None,
        "cem_warm": args.cem_warm if args.controller == "cem" else None,
        "cem_polish": (args.cem_polish
                       if args.controller == "cem" and args.cem_polish
                       else None),
        "exact_rounds": (args.exact_rounds
                         if args.controller == "hybrid" else None),
        "actions": args.actions,
        "shots": args.shots,
        "horizon": args.horizon,
        "latent_stride": args.latent_stride,
        "protocol": f"{args.locations} locations x {args.episodes} episodes, "
                    f"tail-mean scattered energy (scripts/test.jl)",
        "mpc_episode_seconds": {
            "first": episode_times[0] if episode_times else None,
            "warm_mean": float(np.mean(episode_times[1:])) if len(episode_times) > 1 else None,
        },
    }
    print(json.dumps(result))
    with open(args.out, "w") as f:
        json.dump(result, f)
    print(f"wrote {args.out}")

    if args.render:
        from waves_jl_tpu.viz.episode import render_episode

        mpc_jit = jax.jit(lambda pm, s, k: mpc(pm, env, s, k))
        key = jax.random.PRNGKey(args.seed)
        render_episode(
            env, lambda k, s: mpc_jit(params, s, k)[0], key,
            args.render, field="sc", bound=0.2, energy=True,
            # on-device downsample keeps the 700^2 episode's host pull at
            # ~MBs (the frames are a view; energies stay full-resolution)
            render_size=min(350, args.n),
        )


if __name__ == "__main__":
    main()
