"""Environment + episode data tests (small grid for CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

import waves_jl_tpu as w
from waves_jl_tpu.env import (
    RandomDesignPolicy,
    env_observe,
    env_reset,
    env_reward,
    env_step,
    env_step_full,
    env_terminated,
    make_wave_env,
)
from waves_jl_tpu.data import (
    dataloader,
    generate_episode,
    load_episode,
    num_samples,
    prepare_data,
    save_episode,
)


def _make_env(n=64, steps=50, actions=3, resolution=(32, 32)):
    dim = w.two_dim(15.0, n)
    grid = w.build_grid(dim)
    source = w.GaussianSource.create(
        grid,
        jnp.array([[-10.0, -10.0]]),
        jnp.array([[-10.0, 10.0]]),
        jnp.array([0.3]),
        jnp.array([1.0]),
        1000.0,
    )
    return make_wave_env(
        dim,
        w.build_triple_ring_design_space(),
        source,
        resolution=resolution,
        integration_steps=steps,
        actions=actions,
    )


def test_reset_and_step():
    env = _make_env()
    key = jax.random.PRNGKey(0)
    state = env_reset(env, key)
    assert state.wave.shape == (3, 12, 64, 64)
    assert int(state.time_step) == 0

    policy = RandomDesignPolicy(env.action_space)
    action = policy(jax.random.PRNGKey(1))
    state2, info = env_step(env, state, action)
    assert state2.signal.shape == (51, 3)
    assert int(state2.time_step) == 50
    assert info["tspan"].shape == (51,)
    assert np.isfinite(np.asarray(state2.signal)).all()
    # energies grow from zero (source injects)
    assert float(state2.signal[0].sum()) == 0.0
    assert float(state2.signal[-1, 0]) > 0.0
    # reward
    assert float(env_reward(state2)) > 0.0
    # design changed but stayed in box
    r = np.asarray(state2.design.config.cylinders.r)
    assert (r >= 0.2 - 1e-6).all() and (r <= 1.0 + 1e-6).all()

    assert not bool(env_terminated(env, state2))
    state3 = state2
    for i in range(2):
        state3, _ = env_step(env, state3, policy(jax.random.PRNGKey(2 + i)))
    assert bool(env_terminated(env, state3))


def test_step_frames_match_full():
    """Segmented energy rollout == full-trajectory rollout."""
    env = _make_env()
    state = env_reset(env, jax.random.PRNGKey(0))
    action = RandomDesignPolicy(env.action_space)(jax.random.PRNGKey(1))
    s_fast, _ = env_step(env, state, action)
    s_full, info = env_step_full(env, state, action)
    np.testing.assert_allclose(
        np.asarray(s_fast.signal), np.asarray(s_full.signal), rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(s_fast.wave), np.asarray(s_full.wave), rtol=1e-6, atol=1e-9
    )
    assert info["u_tot"].shape == (51, 64, 64)


def test_observe():
    env = _make_env()
    state = env_reset(env, jax.random.PRNGKey(0))
    obs = env_observe(env, state)
    assert obs.wave.shape == (32, 32, 4)
    # source channel is nonzero even at t=0
    assert float(jnp.abs(obs.wave[..., 3]).max()) > 0
    assert obs.tspan.shape == (51,)


def test_generate_episode_and_prepare():
    env = _make_env()
    policy = RandomDesignPolicy(env.action_space)
    final, ep = generate_episode(env, policy, jax.random.PRNGKey(0))
    assert len(ep) == 3
    assert ep.s_wave.shape == (3, 32, 32, 4)
    assert ep.y.shape == (3, 51, 3)
    assert ep.s_tspan.shape == (3, 51)
    assert bool(env_terminated(env, final))
    # consecutive windows are contiguous in time
    np.testing.assert_allclose(
        float(ep.s_tspan[0, -1]), float(ep.s_tspan[1, 0]), rtol=1e-5
    )

    data = prepare_data(ep, horizon=2)
    assert num_samples(data) == 2
    assert data["t"].shape == (2, 101)
    assert data["y"].shape == (2, 101, 3)
    assert data["a"].config.cylinders.r.shape == (2, 2, 18)
    # joined tspan monotone
    t0 = np.asarray(data["t"][0])
    assert (np.diff(t0) > 0).all()
    # joined signal endpoints equal the raw windows
    np.testing.assert_allclose(np.asarray(data["y"][0, :51]), np.asarray(ep.y[0]))
    np.testing.assert_allclose(np.asarray(data["y"][0, 51:]), np.asarray(ep.y[1, 1:]))


def test_episode_save_load(tmp_path):
    env = _make_env()
    policy = RandomDesignPolicy(env.action_space)
    _, ep = generate_episode(env, policy, jax.random.PRNGKey(0))
    p = str(tmp_path / "ep.npz")
    save_episode(ep, p)
    ep2 = load_episode(p)
    np.testing.assert_allclose(np.asarray(ep.s_wave), np.asarray(ep2.s_wave))
    np.testing.assert_allclose(np.asarray(ep.y), np.asarray(ep2.y))
    np.testing.assert_allclose(
        np.asarray(ep.a.config.cylinders.r), np.asarray(ep2.a.config.cylinders.r)
    )
    ep3 = load_episode(p, like=ep)
    np.testing.assert_allclose(np.asarray(ep.y), np.asarray(ep3.y))


def test_dataloader():
    env = _make_env()
    policy = RandomDesignPolicy(env.action_space)
    _, ep = generate_episode(env, policy, jax.random.PRNGKey(0))
    data = prepare_data(ep, horizon=1)
    batches = list(dataloader(data, 2, jax.random.PRNGKey(1)))
    assert len(batches) == 1
    assert batches[0]["s_wave"].shape[0] == 2


def _toy_episode(design):
    """Synthetic 2-action Episode around an arbitrary design pytree."""
    A = 2
    d_seq = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (A,) + x.shape), design
    )
    return w.data.Episode(
        s_wave=jnp.ones((A, 8, 8, 4), jnp.float32),
        s_design=d_seq,
        s_tspan=jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (A, 11)),
        a=d_seq,
        y=jnp.zeros((A, 11, 3), jnp.float32),
    )


def test_save_load_all_design_families(tmp_path):
    """Structure-descriptor round-trip: no `like=` template for ANY family."""
    from waves_jl_tpu.designs import (
        AdjustablePositionScatterers,
        AdjustableRadiiScatterers,
        Cloak,
        Cylinders,
    )

    cyl = Cylinders(
        pos=jnp.arange(6, dtype=jnp.float32).reshape(3, 2),
        r=jnp.array([0.5, 0.6, 0.7]),
        c=jnp.array([340.0, 341.0, 342.0]),
    )
    designs = {
        "cylinders": cyl,
        "radii": AdjustableRadiiScatterers(cyl),
        "position": AdjustablePositionScatterers(cyl),
        "cloak": Cloak(config=AdjustableRadiiScatterers(cyl), core=cyl),
    }
    for name, d in designs.items():
        ep = _toy_episode(d)
        p = str(tmp_path / f"{name}.npz")
        save_episode(ep, p)
        ep2 = load_episode(p)
        assert type(ep2.s_design) is type(ep.s_design)
        for a, b in zip(
            jax.tree_util.tree_leaves(ep), jax.tree_util.tree_leaves(ep2)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_env_step_flux():
    """Opt-in flux window signal (the reference defines flux but never wires
    it): finite, zero before the wavefront reaches the masked region."""
    from waves_jl_tpu.env import env_step_flux

    env = _make_env()
    state = env_reset(env, jax.random.PRNGKey(0))
    action = RandomDesignPolicy(env.action_space)(jax.random.PRNGKey(1))
    state2, info = jax.jit(
        lambda s, a: env_step_flux(env, s, a, mask_radius=2.0)
    )(state, action)
    fl = np.asarray(info["flux"])
    assert fl.shape == (env.integration_steps + 1,)
    assert np.isfinite(fl).all()
    assert fl[0] == 0.0  # zero initial state -> zero flux
    # the energy-signal contract must be unchanged vs plain env_step
    ref_state, _ = jax.jit(lambda s, a: env_step(env, s, a))(state, action)
    np.testing.assert_allclose(
        np.asarray(state2.signal), np.asarray(ref_state.signal),
        rtol=1e-6, atol=1e-9,
    )
