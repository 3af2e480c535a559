"""Episode rollout -> full-field video (reference `render!`,
`src/plot.jl:5-66`).

Fields are computed on device window-by-window (`env_step_full`), pulled to
host once per window at a time stride, and rendered with the design
interpolated per frame.
"""
from __future__ import annotations

import numpy as np

import jax

from ..constants import FRAMES_PER_SECOND
from ..designs import DesignInterpolator
from ..env import WaveEnv, env_reset, env_step_full, env_terminated
from .plot import render_video


def rollout_fields(
    env: WaveEnv,
    policy,
    key: jax.Array,
    field: str = "tot",
    stride: int = 10,
    state=None,
    render_size: int | None = None,
):
    """Roll a full episode collecting the chosen displacement field at a
    time stride. Returns (times, frames (T, ry, rx), designs-per-frame,
    signals (A, steps+1, 3)).

    `render_size` downsamples frames ON DEVICE before the host pull
    (`env_step_full(render_size=...)`) — at 700^2 a full episode is ~MBs
    instead of ~4 GB through the host link; energies stay exact.
    """
    assert field in ("tot", "inc", "sc")
    if state is None:
        key, k = jax.random.split(key)
        state = env_reset(env, k)

    frames, times, designs, signals = [], [], [], []
    step_full = jax.jit(
        lambda s, a: env_step_full(env, s, a, render_size=render_size,
                                   time_stride=stride)
    )
    first = True
    while not bool(env_terminated(env, state)):
        key, k = jax.random.split(key)
        try:
            action = policy(k, state)  # state-aware policies (e.g. MPC)
        except TypeError:
            action = policy(k)
        d1 = state.design
        state, info = step_full(state, action)
        u_tot = np.asarray(info["u_tot"])
        u_inc = np.asarray(info["u_inc"])
        u = {"tot": u_tot, "inc": u_inc, "sc": u_tot - u_inc}[field]
        tspan = np.asarray(info["tspan"])  # already time-strided on device
        start = 0 if first else 1  # drop shared endpoint frame
        first = False
        interp = DesignInterpolator(d1, state.design, tspan[0], tspan[-1])
        for i in range(start, len(tspan)):
            frames.append(u[i])
            times.append(tspan[i])
            designs.append(jax.device_get(interp(tspan[i])))
        signals.append(np.asarray(state.signal))

    return np.asarray(times), np.stack(frames), designs, np.stack(signals)


def render_episode(
    env: WaveEnv,
    policy,
    key: jax.Array,
    path: str,
    field: str = "tot",
    bound: float = 1.0,
    energy: bool = False,
    stride: int = 10,
    state=None,
    render_size: int | None = None,
):
    """Render one episode to video; returns the per-window signals
    (the reference's `render!` returns sigma)."""
    times, frames, designs, signals = rollout_fields(
        env, policy, key, field=field, stride=stride, state=state,
        render_size=render_size,
    )
    gs = float(env.dim.x[-1])
    extent = (-gs, gs, -gs, gs)
    render_video(
        frames, extent, path, designs=designs,
        fps=FRAMES_PER_SECOND, bound=bound, energy=energy,
    )
    return signals
