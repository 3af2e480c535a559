"""Pallas fused-RK4 kernel: interpret-mode parity vs the XLA env step,
and fused-path chaining across windows. (Real-TPU throughput is covered by
bench.py; parity on hardware measured at ~3e-7 relative.)"""
import jax
import jax.numpy as jnp
import numpy as np

import waves_jl_tpu as w
from waves_jl_tpu.env import RandomDesignPolicy, env_reset, env_step, make_wave_env
from waves_jl_tpu.ops.pallas_fd import pad_state, padded_dims, unpad_state
from waves_jl_tpu.physics.fused import cyl_params, design_cylinders, make_env_step_fused


def _env(n=144, steps=20, actions=2):
    dim = w.two_dim(15.0, n)
    grid = w.build_grid(dim)
    source = w.GaussianSource.create(
        grid, jnp.array([[-10.0, -10.0]]), jnp.array([[-10.0, 10.0]]),
        jnp.array([0.3]), jnp.array([1.0]), 1000.0,
    )
    return make_wave_env(
        dim, w.build_triple_ring_design_space(), source,
        resolution=(32, 32), integration_steps=steps, actions=actions,
    )


def test_pad_unpad_roundtrip():
    u = jnp.arange(12 * 20 * 20, dtype=jnp.float32).reshape(12, 20, 20)
    up = pad_state(u, tile_interior=16)
    px, py, n_tiles = padded_dims(20, 16)
    assert up.shape == (12, px, py)
    np.testing.assert_array_equal(np.asarray(unpad_state(up, 20)), np.asarray(u))


def test_cyl_params():
    space = w.build_triple_ring_design_space()
    d1 = space.sample(jax.random.PRNGKey(0))
    d2 = space.sample(jax.random.PRNGKey(1))
    cyl = cyl_params(d1, d2)
    assert cyl.shape == (8, 19)  # 18 ring + 1 core
    np.testing.assert_allclose(
        np.asarray(cyl[2]), np.asarray(design_cylinders(d1).r), rtol=1e-6
    )
    assert cyl_params(w.NoDesign(), w.NoDesign()).shape == (8, 0)


def test_fused_matches_xla_interpret():
    env = _env()
    state = env_reset(env, jax.random.PRNGKey(0))
    action = RandomDesignPolicy(env.action_space)(jax.random.PRNGKey(1))

    s_ref, _ = env_step(env, state, action)
    fused = make_env_step_fused(env, tile_interior=48, interpret=True)
    s_f, _ = fused(state, action)

    sig_ref = np.asarray(s_ref.signal)
    sig_f = np.asarray(s_f.signal)
    scale = np.abs(sig_ref).max()
    assert np.abs(sig_ref - sig_f).max() < 1e-5 * scale

    wr, wf = np.asarray(s_ref.wave), np.asarray(s_f.wave)
    assert np.abs(wr - wf).max() < 1e-5 * np.abs(wr).max()
    assert int(s_f.time_step) == int(s_ref.time_step)

    # chaining a second window stays finite and matches
    a2 = RandomDesignPolicy(env.action_space)(jax.random.PRNGKey(2))
    s_ref2, _ = env_step(env, s_ref, a2)
    s_f2, _ = fused(s_f, a2)
    sig2r, sig2f = np.asarray(s_ref2.signal), np.asarray(s_f2.signal)
    assert np.abs(sig2r - sig2f).max() < 1e-5 * max(np.abs(sig2r).max(), 1e-30)


def test_episode_chunk_fused_matches_xla():
    """Whole-episode chunked fused scan == per-window XLA episode scan."""
    from waves_jl_tpu.data import generate_episode, make_episode_chunk_fused
    from waves_jl_tpu.utils.trees import tree_index

    env = _env(n=96, steps=20, actions=3)
    policy = RandomDesignPolicy(env.action_space)
    key = jax.random.PRNGKey(7)
    k_reset, k_act = jax.random.split(key)
    state = env_reset(env, k_reset)
    akeys = jax.random.split(k_act, env.actions)
    actions = jax.vmap(policy)(akeys)

    # XLA reference path on exactly the same state/actions
    from waves_jl_tpu.data import _episode_scan

    _, ep_ref = _episode_scan(env, state, actions)

    run = make_episode_chunk_fused(env, interpret=True)
    states = jax.tree_util.tree_map(lambda x: x[None], state)
    acts = jax.tree_util.tree_map(lambda x: x[None], actions)
    eps = run(states, acts)
    ep = tree_index(eps, 0)

    np.testing.assert_allclose(
        np.asarray(ep.y), np.asarray(ep_ref.y), rtol=2e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ep.s_wave), np.asarray(ep_ref.s_wave), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(ep.s_tspan), np.asarray(ep_ref.s_tspan), rtol=1e-6
    )


def test_radii_only_fast_path_exact():
    """Owner-selection rasterization == general per-cylinder accumulation
    to ulp level (disjoint circles => unique owner; the per-pixel lerp may
    FMA-contract where the scalar lerp rounds, so ~1e-7 relative, far below
    the O(1) signature of a mask flip)."""
    from waves_jl_tpu.ops.pallas_fd import (
        make_fused_acoustic_step,
        pad_state,
        padded_dims,
    )
    from waves_jl_tpu.physics.fused import cyl_params, pad_profiles, radii_only_ok

    env = _env(n=96, steps=8, actions=1)
    assert radii_only_ok(env.design_space)
    n = 96
    spacing = 2.0 * 15.0 / (n - 1)
    kw = dict(
        n=n, spacing=spacing, dt=1e-5, c0=float(w.WATER), freq=1000.0,
        n_cyl=19, x_min=-15.0, interpret=True, steps_per_call=1,
    )
    step_gen = make_fused_acoustic_step(radii_only=False, **kw)
    step_fast = make_fused_acoustic_step(radii_only=True, **kw)

    key = jax.random.PRNGKey(3)
    d1 = env.design_space.sample(key)
    d2 = env.design_space.sample(jax.random.PRNGKey(4))
    cyl = cyl_params(d1, d2)
    state = env_reset(env, key)
    u = pad_state(
        jax.random.normal(key, (12, n, n), jnp.float32) * 1e-3, 48
    )
    shape_pad = pad_state(state.source.shape[None], 48)[0]
    prof_x, prof_y = pad_profiles(env.integrator.dynamics.pml, n, 48)
    scalars = jnp.array([2e-4, 0.0, 1e-3, 0.0], jnp.float32)  # mid-window w

    u1, e1 = step_gen(u_pad=u, shape_pad=shape_pad, prof_x=prof_x,
                      prof_y=prof_y, scalars=scalars, cyl=cyl)
    u2, e2 = step_fast(u_pad=u, shape_pad=shape_pad, prof_x=prof_x,
                       prof_y=prof_y, scalars=scalars, cyl=cyl)
    np.testing.assert_allclose(
        np.asarray(u1), np.asarray(u2), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(e1), np.asarray(e2), rtol=1e-5, atol=1e-9
    )


def test_batched_kernel_matches_unbatched():
    """Candidate-batched kernel (grid (K, n_tiles)) == K independent
    unbatched calls, per candidate, including per-candidate cylinder
    configs and energies."""
    from waves_jl_tpu.ops.pallas_fd import make_fused_acoustic_step
    from waves_jl_tpu.physics.fused import cyl_params, pad_profiles

    env = _env(n=64, steps=8, actions=1)
    n, k = 64, 2
    spacing = 2.0 * 15.0 / (n - 1)
    kw = dict(
        n=n, spacing=spacing, dt=1e-5, c0=float(w.WATER), freq=1000.0,
        n_cyl=19, x_min=-15.0, interpret=True, steps_per_call=2,
        radii_only=True, x_matmul=False,
    )
    step1 = make_fused_acoustic_step(**kw)
    stepk = make_fused_acoustic_step(batch=k, **kw)

    state = env_reset(env, jax.random.PRNGKey(5))
    shape_pad = pad_state(state.source.shape[None], 48)[0]
    prof_x, prof_y = pad_profiles(env.integrator.dynamics.pml, n, 48)
    scalars = jnp.array([2e-4, 0.0, 1e-3, 0.0], jnp.float32)

    us, cyls = [], []
    for j in range(k):
        d1 = env.design_space.sample(jax.random.PRNGKey(10 + j))
        d2 = env.design_space.sample(jax.random.PRNGKey(20 + j))
        cyls.append(cyl_params(d1, d2))
        us.append(pad_state(
            jax.random.normal(jax.random.PRNGKey(30 + j), (12, n, n),
                              jnp.float32) * 1e-3, 48
        ))
    u_b = jnp.stack(us)
    cyl_b = jnp.stack(cyls)

    u_out_b, e_b = stepk(u_pad=u_b, shape_pad=shape_pad, prof_x=prof_x,
                         prof_y=prof_y, scalars=scalars, cyl=cyl_b)
    assert u_out_b.shape == u_b.shape and e_b.shape == (k, 2, 3)
    for j in range(k):
        u1, e1 = step1(u_pad=us[j], shape_pad=shape_pad, prof_x=prof_x,
                       prof_y=prof_y, scalars=scalars, cyl=cyls[j])
        np.testing.assert_allclose(
            np.asarray(u_out_b[j]), np.asarray(u1), rtol=1e-6, atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(e_b[j]), np.asarray(e1), rtol=1e-6, atol=1e-12
        )


def test_ghost16_spc4_matches_spc1():
    """4 RK4 steps per kernel call with a 16-row ghost band == 4 sequential
    spc=1 calls (same stencils; wider halo consumed in-VMEM). Guards the
    `ghost` parametrization added for the steps_per_call=4 roofline probe."""
    from waves_jl_tpu.ops.pallas_fd import (
        make_fused_acoustic_step,
        pad_state,
        padded_dims,
        unpad_state,
    )
    from waves_jl_tpu.physics.fused import cyl_params

    env = _env(n=96, steps=8, actions=1)
    n = 96
    spacing = 2.0 * 15.0 / (n - 1)
    kw = dict(
        n=n, spacing=spacing, dt=1e-5, c0=float(w.WATER), freq=1000.0,
        n_cyl=19, x_min=-15.0, interpret=True, radii_only=True,
        x_matmul=False,
    )
    step1 = make_fused_acoustic_step(steps_per_call=1, ghost=8, **kw)
    step4 = make_fused_acoustic_step(steps_per_call=4, ghost=16, **kw)

    d1 = env.design_space.sample(jax.random.PRNGKey(0))
    d2 = env.design_space.sample(jax.random.PRNGKey(1))
    cyl = cyl_params(d1, d2)
    state = env_reset(env, jax.random.PRNGKey(2))
    u_raw = jax.random.normal(jax.random.PRNGKey(3), (12, n, n), jnp.float32) * 1e-3
    dyn = env.integrator.dynamics
    prof = dyn.pml[:, 0]

    def profiles(ghost):
        px, py, _ = padded_dims(n, 48, ghost)
        prof_x = jnp.pad(prof, (ghost, px - ghost - n), mode="edge")[:, None]
        prof_y = jnp.pad(prof, (0, py - n), mode="edge")[None, :]
        return prof_x, prof_y

    px1, py1 = profiles(8)
    px4, py4 = profiles(16)
    shape1 = pad_state(state.source.shape[None], 48, 8)[0]
    shape4 = pad_state(state.source.shape[None], 48, 16)[0]

    u1 = pad_state(u_raw, 48, 8)
    es1 = []
    for st in range(4):
        scalars = jnp.array([st * 1e-5, 0.0, 1e-3, 0.0], jnp.float32)
        u1, e = step1(u_pad=u1, shape_pad=shape1, prof_x=px1, prof_y=py1,
                      scalars=scalars, cyl=cyl)
        es1.append(e)
    e1 = jnp.concatenate(es1, axis=0)  # (4, 3)

    scalars = jnp.array([0.0, 0.0, 1e-3, 0.0], jnp.float32)
    u4, e4 = step4(u_pad=pad_state(u_raw, 48, 16), shape_pad=shape4,
                   prof_x=px4, prof_y=py4, scalars=scalars, cyl=cyl)

    np.testing.assert_allclose(
        np.asarray(unpad_state(u4, n, 16)), np.asarray(unpad_state(u1, n, 8)),
        rtol=1e-6, atol=1e-9,
    )
    np.testing.assert_allclose(np.asarray(e4), np.asarray(e1), rtol=1e-6, atol=1e-12)
