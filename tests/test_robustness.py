"""Robustness/edge-case tests: NoDesign fused path, determinism, empty
action spaces, non-square-friendly grid sizes."""
import jax
import jax.numpy as jnp
import numpy as np

import waves_jl_tpu as w
from waves_jl_tpu.data import generate_episode
from waves_jl_tpu.env import RandomDesignPolicy, env_reset, env_step, make_wave_env
from waves_jl_tpu.physics.fused import make_env_step_fused


def _no_design_env(n=64, steps=10):
    dim = w.two_dim(15.0, n)
    grid = w.build_grid(dim)
    source = w.GaussianSource.create(
        grid, jnp.array([[-10.0, -10.0]]), jnp.array([[-10.0, 10.0]]),
        jnp.array([0.3]), jnp.array([1.0]), 1000.0,
    )
    space = w.DesignSpace(w.NoDesign(), w.NoDesign())
    return make_wave_env(dim, space, source, resolution=(16, 16),
                         integration_steps=steps, actions=2)


def test_no_design_env():
    """Free-field env (NoDesign): scattered energy is identically zero."""
    env = _no_design_env()
    state = env_reset(env, jax.random.PRNGKey(0))
    action = env.action_space.sample(jax.random.PRNGKey(1))
    state2, _ = env_step(env, state, action)
    sig = np.asarray(state2.signal)
    assert np.isfinite(sig).all()
    np.testing.assert_allclose(sig[:, 0], sig[:, 1], rtol=1e-6)  # tot == inc
    assert sig[:, 2].max() < 1e-10  # u_sc == 0


def test_no_design_fused_matches_xla():
    """The Pallas kernel with n_cyl=0 (empty rasterization loop)."""
    env = _no_design_env(n=96, steps=10)
    state = env_reset(env, jax.random.PRNGKey(0))
    action = env.action_space.sample(jax.random.PRNGKey(1))
    s_ref, _ = env_step(env, state, action)
    fused = make_env_step_fused(env, interpret=True)
    s_f, _ = fused(state, action)
    scale = max(float(np.abs(np.asarray(s_ref.signal)).max()), 1e-30)
    assert np.abs(np.asarray(s_ref.signal) - np.asarray(s_f.signal)).max() < 1e-5 * scale


def test_episode_determinism():
    dim = w.two_dim(15.0, 48)
    grid = w.build_grid(dim)
    source = w.GaussianSource.create(
        grid, jnp.array([[-10.0, -10.0]]), jnp.array([[-10.0, 10.0]]),
        jnp.array([0.3]), jnp.array([1.0]), 1000.0,
    )
    env = make_wave_env(dim, w.build_triple_ring_design_space(), source,
                        resolution=(16, 16), integration_steps=10, actions=2)
    policy = RandomDesignPolicy(env.action_space)
    _, ep1 = generate_episode(env, policy, jax.random.PRNGKey(7))
    _, ep2 = generate_episode(env, policy, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(ep1.y), np.asarray(ep2.y))
    np.testing.assert_array_equal(
        np.asarray(ep1.a.config.cylinders.r), np.asarray(ep2.a.config.cylinders.r)
    )
    _, ep3 = generate_episode(env, policy, jax.random.PRNGKey(8))
    assert not np.allclose(np.asarray(ep1.y), np.asarray(ep3.y))


def test_odd_grid_sizes_fused():
    """Grid size not divisible by the tile interior or lanes (padding path)."""
    env_cls = make_wave_env(
        w.two_dim(15.0, 130),
        w.build_triple_ring_design_space(),
        w.GaussianSource.create(
            w.build_grid(w.two_dim(15.0, 130)),
            jnp.array([[-10.0, -10.0]]), jnp.array([[-10.0, 10.0]]),
            jnp.array([0.3]), jnp.array([1.0]), 1000.0,
        ),
        resolution=(16, 16), integration_steps=10, actions=1,
    )
    state = env_reset(env_cls, jax.random.PRNGKey(0))
    action = RandomDesignPolicy(env_cls.action_space)(jax.random.PRNGKey(1))
    s_ref, _ = env_step(env_cls, state, action)
    fused = make_env_step_fused(env_cls, tile_interior=48, interpret=True)
    s_f, _ = fused(state, action)
    scale = max(float(np.abs(np.asarray(s_ref.signal)).max()), 1e-30)
    assert np.abs(np.asarray(s_ref.signal) - np.asarray(s_f.signal)).max() < 1e-5 * scale
