"""Free-field PML demo (reference `scripts/pml.jl`): propagate a pulse with
no design; the PML absorbs the outgoing wave without reflection.

Usage: python scripts_tpu/pml_demo.py [--n 256 --steps 500 --out pml.mp4]
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
from waves_jl_tpu.viz import render_video


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--out", default="pml.mp4")
    args = p.parse_args()

    dim = w.two_dim(15.0, args.n)
    grid = w.build_grid(dim)
    dyn = w.make_acoustic_dynamics_2d(dim, float(w.WATER), 2.0, 20000.0)
    it = w.Integrator(dynamics=dyn, dt=1e-5)
    shape = w.build_normal(grid, jnp.array([[0.0, 0.0]]), jnp.array([0.3]), jnp.array([1.0]))
    src = w.Source(shape=shape, freq=jnp.float32(1000.0))

    class ConstC:
        def __call__(self, t):
            return jnp.float32(w.WATER)

    tspan = w.build_tspan(0.0, 1e-5, args.steps)
    u0 = w.build_wave(dim, 12)
    traj = jax.jit(lambda u: it(u, tspan, (ConstC(), src)))(u0)
    frames = np.asarray(traj[::10, 0])
    e = np.sum(np.asarray(traj[:, 0]) ** 2, axis=(1, 2))
    print(f"energy peak {e.max():.4g}, final {e[-1]:.4g} "
          f"({e[-1] / e.max():.1%} of peak — PML absorbs)")
    gs = float(dim.x[-1])
    render_video(frames, (-gs, gs, -gs, gs), args.out, bound=0.5)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
