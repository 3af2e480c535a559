"""Multi-chip fused kernel: y-sharded Pallas rollout under shard_map on the
8-device CPU mesh (interpret mode) vs the single-device fused path and the
XLA path."""
import jax
import jax.numpy as jnp
import numpy as np

import waves_jl_tpu as w
from waves_jl_tpu.env import RandomDesignPolicy, env_reset, env_step, make_wave_env
from waves_jl_tpu.parallel import make_mesh
from waves_jl_tpu.parallel.fused_domain import make_fused_sharded_rollout
from waves_jl_tpu.physics.fused import cyl_params

N = 128  # 8 shards x 16 columns
STEPS = 12


def test_fused_sharded_matches_xla():
    dim = w.two_dim(15.0, N)
    grid = w.build_grid(dim)
    source = w.GaussianSource.create(
        grid, jnp.array([[-10.0, -10.0]]), jnp.array([[-10.0, 10.0]]),
        jnp.array([0.3]), jnp.array([1.0]), 1000.0,
    )
    env = make_wave_env(
        dim, w.build_triple_ring_design_space(), source,
        resolution=(16, 16), integration_steps=STEPS, actions=1,
    )
    state = env_reset(env, jax.random.PRNGKey(0))
    action = RandomDesignPolicy(env.action_space)(jax.random.PRNGKey(1))

    # XLA reference
    s_ref, info = env_step(env, state, action)
    sig_ref = np.asarray(s_ref.signal)

    # y-sharded fused rollout
    mesh = make_mesh(8, axis_name="space")
    spacing = float(2.0 * 15.0 / (N - 1))
    rollout = make_fused_sharded_rollout(
        mesh, n=N, spacing=spacing, dt=env.dt, c0=float(env.c0),
        freq=1000.0, n_cyl=19, x_min=-15.0, axis_name="space", interpret=True,
    )
    next_design = env.design_space(state.design, action)
    cyl = cyl_params(state.design, next_design)
    tspan = info["tspan"]
    prof = env.integrator.dynamics.pml[:, 0]
    d_omega = spacing * spacing

    u_final, sig = rollout(state.wave[-1], tspan, cyl, state.source.shape, prof)
    sig = np.asarray(sig) * d_omega

    scale = max(np.abs(sig_ref).max(), 1e-30)
    assert np.abs(sig - sig_ref).max() < 1e-5 * scale, (
        np.abs(sig - sig_ref).max() / scale
    )

    # final state matches the XLA rollout's final frame
    u_ref = np.asarray(s_ref.wave[-1])
    u_ours = np.asarray(u_final)
    wscale = max(np.abs(u_ref).max(), 1e-30)
    assert np.abs(u_ours - u_ref).max() < 1e-5 * wscale


def test_fused_sharded_with_kernel_optimizations():
    """radii_only + x_matmul propagate into the sharded kernel: parity vs
    the XLA path holds on the 8-device mesh (x_matmul's 2-pass bf16 split
    loosens the bound to the documented 1e-5-grade window error)."""
    dim = w.two_dim(15.0, N)
    grid = w.build_grid(dim)
    source = w.GaussianSource.create(
        grid, jnp.array([[-10.0, -10.0]]), jnp.array([[-10.0, 10.0]]),
        jnp.array([0.3]), jnp.array([1.0]), 1000.0,
    )
    env = make_wave_env(
        dim, w.build_triple_ring_design_space(), source,
        resolution=(16, 16), integration_steps=STEPS, actions=1,
    )
    state = env_reset(env, jax.random.PRNGKey(2))
    action = RandomDesignPolicy(env.action_space)(jax.random.PRNGKey(3))
    s_ref, info = env_step(env, state, action)
    sig_ref = np.asarray(s_ref.signal)

    mesh = make_mesh(8, axis_name="space")
    spacing = float(2.0 * 15.0 / (N - 1))
    rollout = make_fused_sharded_rollout(
        mesh, n=N, spacing=spacing, dt=env.dt, c0=float(env.c0),
        freq=1000.0, n_cyl=19, x_min=-15.0, axis_name="space", interpret=True,
        radii_only=True, x_matmul=True,
    )
    next_design = env.design_space(state.design, action)
    cyl = cyl_params(state.design, next_design)
    d_omega = spacing * spacing
    prof = env.integrator.dynamics.pml[:, 0]
    u_final, sig = rollout(
        state.wave[-1], info["tspan"], cyl, state.source.shape, prof
    )
    sig = np.asarray(sig) * d_omega
    scale = max(np.abs(sig_ref).max(), 1e-30)
    assert np.abs(sig - sig_ref).max() < 5e-5 * scale
    u_ref = np.asarray(s_ref.wave[-1])
    wscale = max(np.abs(u_ref).max(), 1e-30)
    assert np.abs(np.asarray(u_final) - u_ref).max() < 5e-5 * wscale


def test_sharded_work_inflation_bounded():
    """Scaling shape guard (docs/scaling.md): on the single-core virtual
    mesh, wall time ~ TOTAL work, so t(8 dev)/t(1 dev) at a fixed global
    grid bounds what y-sharding adds (ppermute halos, edge masking, psum).
    Timed on the compiled XLA rollout — interpret-mode Pallas timing only
    measures Mosaic's Python interpreter, not the halo path (the fused
    kernel's halo volume is identical; its correctness is asserted by the
    parity tests above). Loose bound: sharding must not blow up total work.
    """
    import time

    from waves_jl_tpu.parallel import make_sharded_rollout

    n, steps = 96, 16
    dim = w.two_dim(15.0, n)
    grid = w.build_grid(dim)
    source = w.GaussianSource.create(
        grid, jnp.array([[-10.0, -10.0]]), jnp.array([[-10.0, 10.0]]),
        jnp.array([0.3]), jnp.array([1.0]), 1000.0,
    )
    env = make_wave_env(
        dim, w.build_triple_ring_design_space(), source,
        resolution=(16, 16), integration_steps=steps, actions=1,
    )
    state = env_reset(env, jax.random.PRNGKey(0))
    action = RandomDesignPolicy(env.action_space)(jax.random.PRNGKey(1))
    next_design = env.design_space(state.design, action)
    tspan = w.build_tspan(0.0, env.dt, steps)
    dyn = env.integrator.dynamics
    interp = w.DesignInterpolator(state.design, next_design, tspan[0], tspan[-1])
    sy = jnp.asarray(np.asarray(dyn.pml).T)
    d_omega = jnp.float32(float(w.get_dx(dim)) ** 2)
    args = (state.wave[-1], tspan, interp, grid, state.source.shape,
            jnp.float32(1000.0), dyn.pml, sy, dyn.bc, d_omega)

    times = {}
    for d in (1, 8):
        mesh = make_mesh(d, axis_name="space")
        rollout = make_sharded_rollout(
            mesh, float(env.c0), dyn.dx, dyn.dy, steps, env.dt,
            axis_name="space",
        )
        _, sig = rollout(*args)  # warmup/compile
        jax.block_until_ready(sig)
        assert bool(jnp.isfinite(sig).all())
        t0 = time.time()
        for _ in range(3):
            _, sig = rollout(*args)
            jax.block_until_ready(sig)
        times[d] = time.time() - t0

    inflation = times[8] / times[1]
    # measured ~0.8x at 256^2 (docs/scaling.json); 4x is a generous CI
    # ceiling that still catches a halo-path work explosion
    assert inflation < 4.0, f"8-dev total-work inflation {inflation:.2f}x"
