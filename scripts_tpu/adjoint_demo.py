"""Latent-sensitivity demo (reference `scripts/adjoint_sensitivity.jl`):
optimize latent initial-condition frequency coefficients so that the
rolled-out displacement hits a target waveform — exercises jax.grad through
the scan rollout standalone (the reference's hand-written rrule demo).

Usage: python scripts_tpu/adjoint_demo.py [--steps 300 --iters 10]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

import waves_jl_tpu as w
from waves_jl_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
from waves_jl_tpu.models import embed_sin, sin_basis


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--nfreq", type=int, default=50)
    p.add_argument("--elements", type=int, default=1024)
    p.add_argument("--out", default="adjoint_wave.png")
    args = p.parse_args()

    dt = 1e-5
    grid_size = 15.0
    latent_dim = w.one_dim(grid_size, args.elements)
    dyn = w.make_acoustic_dynamics_1d(latent_dim, float(w.WATER), 5.0, 10000.0)
    it = w.Integrator(dynamics=dyn, dt=dt, checkpoint="sqrt")

    target = w.build_normal(latent_dim.x, jnp.array([0.0]), jnp.array([0.3]), jnp.array([1.0]))
    basis = sin_basis(args.elements, grid_size, args.nfreq)

    key = jax.random.PRNGKey(0)
    freq_coefs = jax.random.normal(key, (1, 4, args.nfreq)) * 0.01

    tspan = jnp.broadcast_to(w.build_tspan(0.0, dt, args.steps), (1, args.steps + 1))
    C = w.LinearInterpolation(
        X=tspan[:, jnp.array([0, -1])], Y=jnp.ones((1, 2, args.elements), jnp.float32)
    )
    F = w.Source(shape=jnp.zeros((1, args.elements), jnp.float32), freq=jnp.float32(1.0))
    PML = jnp.broadcast_to(dyn.pml / dyn.pml[0], (1, args.elements))
    theta = (C, F, PML)

    def loss_fn(coefs):
        z0 = embed_sin(basis, coefs)  # (1, 4, E)
        z = it(z0, tspan, theta)
        return jnp.mean((z[-1, 0, 0] - target) ** 2) + 0.005 * jnp.linalg.norm(coefs)

    opt = optax.adam(5e-2)
    opt_state = opt.init(freq_coefs)

    @jax.jit
    def step(coefs, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(coefs)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(coefs, updates), opt_state, loss
    losses = []
    for i in range(args.iters):
        freq_coefs, opt_state, loss = step(freq_coefs, opt_state)
        losses.append(float(loss))
        print(f"iter {i}: loss {float(loss):.6g}", flush=True)
    assert losses[-1] < losses[0], "adjoint optimization did not improve"

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    z = it(embed_sin(basis, freq_coefs), tspan, theta)
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    axes[0].imshow(np.asarray(z[:, 0, 0, :]), aspect="auto", cmap="cividis")
    axes[0].set_title("Optimized rollout u(x, t)")
    axes[1].plot(np.asarray(latent_dim.x), np.asarray(z[-1, 0, 0]), label="final")
    axes[1].plot(np.asarray(latent_dim.x), np.asarray(target), label="target")
    axes[1].legend()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
