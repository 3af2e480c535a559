"""SimpleWave standalone-PINN acceptance experiment (reference
`test/pinn.jl:13-36,83-156`): the reference's only end-to-end learned-model
validation recipe.

1. Define a 2-field 1D transmission system (SimpleWave) with a spatially
   varying wavespeed and PML — a THIRD dynamics implementation, exercising
   the physics-agnostic Integrator interface.
2. Generate a ground-truth rollout with the real RK4 integrator.
3. Train a standalone coordinate-MLP PINN against finite-difference
   residuals of that solution (+ IC/boundary/energy supervision,
   `test/pinn.jl:120-148`).
4. Render the energy comparison, solution heatmaps, and overlay frames.

Usage: python scripts_tpu/pinn_acceptance.py --out runs/pinn_acceptance
       [--elements 1024 --steps 300 --iters 5000]
"""
from __future__ import annotations

import argparse
import os
import sys
from dataclasses import dataclass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import waves_jl_tpu as w
from waves_jl_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import optax

from waves_jl_tpu.ops.fd import gradient_matrix
from waves_jl_tpu.physics.dynamics import Integrator, build_tspan
from waves_jl_tpu.utils.trees import register_pytree_dataclass


@register_pytree_dataclass
@dataclass(frozen=True)
class SimpleWave:
    """2-field (u, v) 1D transmission system with spatially varying speed
    and PML (reference `SimpleWave`, `test/pinn.jl:13-36`):
        u_t = WATER * c * grad(v) - pml * u     (Dirichlet-masked)
        v_t = WATER * c * grad(u + f) - pml * v
    """

    grad: jax.Array  # (E, E) FD gradient matrix
    c: jax.Array  # (E,) spatial wavespeed profile
    pml: jax.Array  # (E,)
    bc: jax.Array  # (E,)

    def __call__(self, x, t, theta):
        source = theta
        f = source(t)
        u, v = x[:, 0], x[:, 1]
        u_t = (w.WATER * self.c * (self.grad @ v) - self.pml * u) * self.bc
        v_t = w.WATER * self.c * (self.grad @ (u + f)) - self.pml * v
        return jnp.stack([u_t, v_t], axis=1)


@register_pytree_dataclass
@dataclass(frozen=True)
class BumpSource:
    shape: jax.Array  # (E,)
    freq: jax.Array

    def __call__(self, t):
        return self.shape * jnp.sin(2.0 * jnp.pi * self.freq * t)


def mlp_init(key, sizes):
    params = []
    for k, (m, n_) in zip(jax.random.split(key, len(sizes) - 1), zip(sizes, sizes[1:])):
        lim = jnp.sqrt(6.0 / m)  # kaiming-uniform-ish, matches Flux default scale
        params.append({
            "w": jax.random.uniform(k, (m, n_), jnp.float32, -lim, lim),
            "b": jnp.zeros((n_,), jnp.float32),
        })
    return params


def mlp_apply(params, x):
    """x (..., 2) -> (..., 2); leaky_relu hidden activations."""
    for layer in params[:-1]:
        x = jax.nn.leaky_relu(x @ layer["w"] + layer["b"])
    return x @ params[-1]["w"] + params[-1]["b"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="runs/pinn_acceptance")
    p.add_argument("--elements", type=int, default=1024)
    p.add_argument("--latent-gs", type=float, default=100.0)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--h-size", type=int, default=256)
    p.add_argument("--depth", type=int, default=15)
    p.add_argument("--iters", type=int, default=5000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--chunk", type=int, default=100, help="train iters per dispatch")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    dim = w.one_dim(args.latent_gs, args.elements)
    x = dim.x
    dx = float(x[1] - x[0])
    dt = 1e-5
    T = args.steps

    # spatially varying speed + PML (test/pinn.jl:9-11)
    c = jnp.sin(5.0 * 2.0 * jnp.pi / 10.0 * x) / 2.0 + 1.0
    pml = w.build_pml(dim, 3.0, 10000.0)
    dyn = SimpleWave(
        grad=gradient_matrix(x), c=c, pml=pml, bc=w.build_dirichlet(dim)
    )
    source = BumpSource(
        shape=w.build_normal(
            x, jnp.array([-2.0, 2.0, 3.0]), jnp.array([0.3, 0.3, 0.4]),
            jnp.array([1.0, -1.0, 1.0]),
        ),
        freq=jnp.float32(1000.0),
    )

    # ground truth rollout (test/pinn.jl:83)
    tspan = build_tspan(0.0, dt, T)  # (T+1,)
    iter_ = Integrator(dynamics=dyn, dt=dt)
    z = jax.jit(lambda u0: iter_(u0, tspan, source))(
        jnp.zeros((args.elements, 2), jnp.float32)
    )  # (T+1, E, 2)
    u_true = z[:, :, 0].T  # (E, T+1)
    energy_true = jnp.sum(u_true**2, axis=0) * dx  # (T+1,)
    f_t = jax.vmap(source)(tspan).T  # (E, T+1)

    # PINN coordinate grid (test/pinn.jl:46-57): (x/L, t/(dt*T)) pairs
    xg = jnp.broadcast_to(x[:, None] / args.latent_gs, (args.elements, T + 1))
    tg = jnp.broadcast_to(tspan[None, :] / (dt * T), (args.elements, T + 1))
    grid = jnp.stack([xg, tg], axis=-1)  # (E, T+1, 2)

    grad_x = gradient_matrix(x)  # (E, E)
    grad_t = gradient_matrix(tspan)  # (T+1, T+1)

    def losses(params):
        out = mlp_apply(params, grid)  # (E, T+1, 2)
        u, v = out[..., 0], out[..., 1]
        u_t = u @ grad_t.T
        v_t = v @ grad_t.T
        n_u = (w.WATER * c[:, None] * (grad_x @ v) - pml[:, None] * u) * dyn.bc[:, None]
        n_v = w.WATER * c[:, None] * (grad_x @ (u + f_t)) - pml[:, None] * v
        energy = jnp.sum(u**2, axis=0) * dx
        mse = lambda a, b: jnp.mean((a - b) ** 2)
        return {
            "u": mse(u_t, n_u) / w.WATER,
            "v": mse(v_t, n_v) / w.WATER,
            "boundary": jnp.mean(u[0] ** 2) + jnp.mean(u[-1] ** 2),
            "ic": mse(out[:, 0, :], z[0]),
            "energy": mse(energy, energy_true),
        }

    def total(params):
        l = losses(params)
        # weights from test/pinn.jl:148
        return l["u"] + l["v"] + 100.0 * w.WATER * (l["boundary"] + l["ic"]) + l["energy"]

    key = jax.random.PRNGKey(args.seed)
    params = mlp_init(key, [2] + [args.h_size] * args.depth + [2])
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    from functools import partial

    @partial(jax.jit, static_argnames="k")
    def run_chunk(params, opt_state, k):
        def body(carry, _):
            p, o = carry
            loss, grads = jax.value_and_grad(total)(p)
            updates, o = opt.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o), loss

        (params, opt_state), ls = jax.lax.scan(
            body, (params, opt_state), None, length=k
        )
        return params, opt_state, ls

    import time

    t0 = time.time()
    done = 0
    while done < args.iters:
        k = min(args.chunk, args.iters - done)
        params, opt_state, ls = run_chunk(params, opt_state, k)
        done += k
        l = jax.device_get(losses(params))
        print(
            f"iter {done}/{args.iters} total {float(ls[-1]):.5g} "
            f"u {l['u']:.4g} v {l['v']:.4g} b {l['boundary']:.4g} "
            f"ic {l['ic']:.4g} e {l['energy']:.4g}", flush=True,
        )
    print(f"trained in {time.time() - t0:.1f}s")

    # evaluation + renders (test/pinn.jl:159-187)
    out = mlp_apply(params, grid)
    u_pinn = np.asarray(out[..., 0])
    u_np = np.asarray(u_true)
    e_pinn = (u_pinn**2).sum(0) * dx
    e_np = np.asarray(energy_true)
    rel_energy_err = float(np.abs(e_pinn - e_np).mean() / (np.abs(e_np).mean() + 1e-12))
    print(f"mean relative energy error: {rel_energy_err:.4f}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.plot(e_np, label="Ground Truth")
    ax.plot(e_pinn, label="PINN")
    ax.legend(loc="upper left")
    ax.set_xlabel("step"); ax.set_ylabel("energy")
    fig.savefig(os.path.join(args.out, "energy.png"), dpi=120)

    fig, axs = plt.subplots(1, 2, figsize=(10, 4))
    for a, (img, title) in zip(
        axs, [(u_np, "Ground Truth"), (u_pinn, "PINN")]
    ):
        a.imshow(img, aspect="auto", origin="lower", cmap="seismic")
        a.set_title(title); a.set_xlabel("time step"); a.set_ylabel("x")
    fig.savefig(os.path.join(args.out, "sol.png"), dpi=120)

    fig, axs = plt.subplots(2, 2, figsize=(10, 6))
    for a, i in zip(axs.ravel(), [0, T // 3, 2 * T // 3, T]):
        a.plot(np.asarray(x), u_np[:, i], label="GT")
        a.plot(np.asarray(x), u_pinn[:, i], label="PINN")
        a.set_title(f"step {i}"); a.set_ylim(-2, 2)
    axs[0, 0].legend()
    fig.savefig(os.path.join(args.out, "frames.png"), dpi=120)
    print(f"wrote {args.out}/energy.png, sol.png, frames.png")
    return rel_energy_err


if __name__ == "__main__":
    main()
