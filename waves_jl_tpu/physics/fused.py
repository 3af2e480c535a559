"""Fused-kernel rollout path: the Pallas RK4 step wired into the
environment's action window.

Produces the same signals/frames as `env_step` (XLA path) but with the
whole RK4 step fused in VMEM. Numerics: same stencils/equations; float32
rounding differs at the reassociation level (~1e-6 relative), validated in
tests against the XLA path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..designs import Cloak, Cylinders, NoDesign, stack_cylinders
from ..ops.pallas_fd import make_fused_acoustic_step, pad_state, padded_dims, GHOST
from ..env import FRAMESKIP, N_FRAMES, EnvState, WaveEnv, env_tspan


def design_cylinders(design) -> Cylinders | None:
    """Flatten any design pytree to a single Cylinders config."""
    if isinstance(design, NoDesign) or design is None:
        return None
    if isinstance(design, Cylinders):
        return design
    if isinstance(design, Cloak):
        return stack_cylinders(design.config.cylinders, design.core)
    if hasattr(design, "cylinders"):
        return design.cylinders
    raise TypeError(f"unsupported design {type(design)}")


def cyl_params(d1, d2) -> jax.Array:
    """(8, n_cyl) [p1x, p1y, r1, c1, p2x, p2y, r2, c2] lerp endpoints."""
    c1 = design_cylinders(d1)
    c2 = design_cylinders(d2)
    if c1 is None:
        return jnp.zeros((8, 0), jnp.float32)
    return jnp.stack(
        [
            c1.pos[:, 0], c1.pos[:, 1], c1.r, c1.c,
            c2.pos[:, 0], c2.pos[:, 1], c2.r, c2.c,
        ]
    )


def radii_only_ok(space) -> bool:
    """True when the kernel's radii-only rasterization fast path is exact
    for every design reachable in `space`: cylinder positions and speeds are
    fixed (only radii actionable) and the circles at their maximum radii are
    pairwise disjoint (each pixel has a unique owning cylinder). Holds for
    the reference triple-ring cloak (`src/designs.jl:353-365`)."""
    lo = design_cylinders(space.low)
    hi = design_cylinders(space.high)
    if lo is None:
        return False  # nothing to rasterize; general path is free anyway
    pos_lo, pos_hi = np.asarray(lo.pos), np.asarray(hi.pos)
    if not (np.array_equal(pos_lo, pos_hi) and np.array_equal(np.asarray(lo.c), np.asarray(hi.c))):
        return False
    rmax = np.asarray(hi.r)
    d = np.sqrt(((pos_lo[:, None, :] - pos_lo[None, :, :]) ** 2).sum(-1))
    sep = rmax[:, None] + rmax[None, :]
    iu = np.triu_indices(len(rmax), k=1)
    return bool((d[iu] > sep[iu]).all())


def pad_profiles(pml2d: jax.Array, n: int, tile_interior: int):
    """1D sigma profiles over padded x rows / y lanes from the 2D pml
    (which varies along x only; sigma_y is its transpose)."""
    px, py, _ = padded_dims(n, tile_interior)
    prof = pml2d[:, 0]  # (n,)
    prof_x = jnp.pad(prof, (GHOST, px - GHOST - n), mode="edge")[:, None]
    prof_y = jnp.pad(prof, (0, py - n), mode="edge")[None, :]
    return prof_x, prof_y


def make_fused_window(env: WaveEnv, tile_interior: int = 48, interpret: bool = False,
                      steps_per_call: int | None = None,
                      x_matmul: bool = True, radii_only: bool | None = None):
    """Jitted fused action window mirroring `env_step`'s physics.

    Returns window(u_pad, shape_pad, prof_x, prof_y, tspan, cyl) ->
    (u_pad_final, frames(list), signal) where frames are the padded states
    at the frameskip boundaries and signal is (steps+1, 3) energies
    (d_omega applied).

    ``x_matmul=False`` selects the exact roll-stencil x-derivatives
    (~3e-7 window parity vs the XLA path) instead of the default 2-pass
    bf16-split MXU form (~1e-5 grade, +18% faster); ``radii_only`` forces
    the owner-selection rasterization fast path on/off (default: auto via
    `radii_only_ok`).
    """
    n = env.dim.shape[0]
    spacing = float(2.0 * float(env.dim.x[-1]) / (n - 1))
    x_min = float(env.dim.x[0])
    n_cyl = _design_space_n_cyl(env)
    freq = float(env.source.freq)
    steps = env.integration_steps
    fs = min(FRAMESKIP, steps // (N_FRAMES - 1))
    seg_lens = [steps - (N_FRAMES - 1) * fs] + [fs] * (N_FRAMES - 1)
    if steps_per_call is None:
        # two RK4 steps per kernel pass when the frame segments allow it
        # (halves per-step HBM traffic; measured slightly faster)
        steps_per_call = 2 if all(s_ % 2 == 0 for s_ in seg_lens) else 1
    spc = int(steps_per_call)
    step = make_fused_acoustic_step(
        n=n, spacing=spacing, dt=env.dt, c0=float(env.c0), freq=freq,
        n_cyl=n_cyl, x_min=x_min, tile_interior=tile_interior,
        interpret=interpret, steps_per_call=spc,
        radii_only=radii_only_ok(env.design_space) if radii_only is None
        else radii_only,
        # default: x-derivatives on the otherwise-idle MXU (+18%, parity
        # 2e-6/window via the 2-pass bf16 split — see PERF_NOTES.md)
        x_matmul=x_matmul,
    )
    d_omega = spacing * spacing
    assert all(seg % spc == 0 for seg in seg_lens), (seg_lens, spc)

    def window(u_pad, shape_pad, prof_x, prof_y, tspan, cyl):
        ti, tf = tspan[0], tspan[-1]

        def body(u, t):
            scalars = jnp.stack([t, ti, tf, jnp.float32(0.0)])
            u2, e = step(u_pad=u, shape_pad=shape_pad, prof_x=prof_x,
                         prof_y=prof_y, scalars=scalars, cyl=cyl)
            return u2, e * d_omega  # e: (spc, 3)

        e0_tot = jnp.sum(u_pad[0] ** 2) * d_omega
        e0_inc = jnp.sum(u_pad[6] ** 2) * d_omega
        e0_sc = jnp.sum((u_pad[0] - u_pad[6]) ** 2) * d_omega
        energies = [jnp.stack([e0_tot, e0_inc, e0_sc])[None]]
        frames = []
        u = u_pad
        offset = 0
        for seg in seg_lens:
            ts = jax.lax.dynamic_slice_in_dim(tspan, offset, seg)[::spc]
            u, es = jax.lax.scan(body, u, ts)
            frames.append(u)
            energies.append(es.reshape(seg, 3))
            offset += seg
        signal = jnp.concatenate(energies, axis=0)
        return u, frames, signal

    return window


def _design_space_n_cyl(env: WaveEnv) -> int:
    c = design_cylinders(env.design_space.low)
    return 0 if c is None else c.r.shape[0]


def make_rerank_rollout(env: WaveEnv, k: int, horizon: int,
                        tile_interior: int = 48, interpret: bool = False,
                        x_matmul: bool = True, radii_only: bool | None = None):
    """K-candidate exact re-rank rollout for the hybrid controller: all K
    surviving action sequences advance through the TRUE simulator in ONE
    candidate-batched kernel program (grid (K, n_tiles) — see
    `make_fused_acoustic_step(batch=...)`) instead of a sequential scan of
    K independent rollouts. Amortizes the per-invocation ramp that
    dominates at reduced re-rank resolutions (~8 tiles/call at 350^2).

    Returns rollout(state, elite_actions, t0) -> (K,) cumulative scattered
    energy over `horizon` action windows, matching the per-candidate sum
    `sum_h sum(signal_h[1:, 2])` of the sequential path (same kernel
    numerics; each integration step counted once).
    """
    n = env.dim.shape[0]
    spacing = float(2.0 * float(env.dim.x[-1]) / (n - 1))
    steps = env.integration_steps
    spc = 2 if steps % 2 == 0 else 1
    step = make_fused_acoustic_step(
        n=n, spacing=spacing, dt=env.dt, c0=float(env.c0),
        freq=float(env.source.freq), n_cyl=_design_space_n_cyl(env),
        x_min=float(env.dim.x[0]), tile_interior=tile_interior,
        interpret=interpret, steps_per_call=spc,
        radii_only=radii_only_ok(env.design_space) if radii_only is None
        else radii_only,
        x_matmul=x_matmul, batch=k,
    )
    d_omega = spacing * spacing
    dt = float(env.dt)

    def rollout(state: EnvState, elite, t0):
        shape_pad = pad_state(state.source.shape[None], tile_interior)[0]
        prof_x, prof_y = pad_profiles(
            env.integrator.dynamics.pml, n, tile_interior
        )
        # materialized (not broadcast-strided) copies: the kernel DMAs
        # per-candidate slices from HBM
        u0 = jnp.tile(
            pad_state(state.wave[-1], tile_interior)[None], (k, 1, 1, 1)
        )
        d0 = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (k, *x.shape)), state.design
        )
        elite_t = jax.tree_util.tree_map(
            lambda x: jnp.swapaxes(x, 0, 1), elite
        )  # (H, K, ...) horizon-major for the window scan

        def window(carry, a_h):
            u, designs, t_i = carry
            nd = jax.vmap(env.design_space)(designs, a_h)
            cyl = jax.vmap(cyl_params)(designs, nd)  # (K, 8, n_cyl)
            tf = t_i + steps * dt
            ts = t_i + jnp.arange(0, steps, spc, dtype=jnp.float32) * dt

            def body(u_, t):
                scalars = jnp.stack([t, t_i, tf, jnp.float32(0.0)])
                u2, e = step(u_pad=u_, shape_pad=shape_pad, prof_x=prof_x,
                             prof_y=prof_y, scalars=scalars, cyl=cyl)
                return u2, jnp.sum(e[:, :, 2], axis=1)  # (K,) sc partials

            u, es = jax.lax.scan(body, u, ts)
            return (u, nd, tf), jnp.sum(es, axis=0)

        t0 = jnp.asarray(t0, jnp.float32)
        (_, _, _), sc = jax.lax.scan(window, (u0, d0, t0), elite_t)
        return jnp.sum(sc, axis=0) * d_omega

    return rollout


def make_env_step_fused(env: WaveEnv, tile_interior: int = 48, interpret: bool = False,
                        steps_per_call: int | None = None, jit: bool = True,
                        x_matmul: bool = True, radii_only: bool | None = None):
    """Drop-in fused replacement for `env_step`: returns a jitted
    step(state, action) -> (state', info). With ``jit=False`` the raw
    traceable step is returned, for embedding inside a larger program
    (e.g. the whole-episode scan in `data.make_episode_fused`).
    ``x_matmul``/``radii_only`` select kernel variants (see
    `make_fused_window`)."""
    n = env.dim.shape[0]
    window = make_fused_window(env, tile_interior, interpret, steps_per_call,
                               x_matmul=x_matmul, radii_only=radii_only)
    from ..ops.pallas_fd import unpad_state

    def step(state: EnvState, action):
        tspan = env_tspan(env, state)
        next_design = env.design_space(state.design, action)
        cyl = cyl_params(state.design, next_design)
        shape_pad = pad_state(state.source.shape[None], tile_interior)[0]
        prof_x, prof_y = pad_profiles(env.integrator.dynamics.pml, n, tile_interior)
        u_pad = pad_state(state.wave[-1], tile_interior)
        u_final, frames, signal = window(u_pad, shape_pad, prof_x, prof_y, tspan, cyl)
        new_wave = jnp.stack([unpad_state(f, n) for f in frames], axis=0)
        new_state = EnvState(
            wave=new_wave,
            design=next_design,
            source=state.source,
            signal=signal,
            time_step=state.time_step + env.integration_steps,
        )
        return new_state, {"tspan": tspan}

    return jax.jit(step) if jit else step
