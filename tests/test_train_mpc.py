"""Training loop, checkpointing, and MPC tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import waves_jl_tpu as w
from waves_jl_tpu.control import GradientShooting, RandomShooting, compute_action_cost
from waves_jl_tpu.data import generate_episode, prepare_data
from waves_jl_tpu.env import RandomDesignPolicy, env_reset, env_step, make_wave_env
from waves_jl_tpu.models import AcousticEnergyModel, energy_loss
from waves_jl_tpu.train import (
    TrainConfig,
    load_checkpoint,
    make_optimizer,
    save_checkpoint,
    train,
)

E = 64
STEPS = 10
RES = (16, 16)


@pytest.fixture(scope="module")
def setup():
    dim = w.two_dim(15.0, 48)
    grid = w.build_grid(dim)
    source = w.GaussianSource.create(
        grid, jnp.array([[-10.0, -10.0]]), jnp.array([[-10.0, 10.0]]),
        jnp.array([0.3]), jnp.array([1.0]), 1000.0,
    )
    env = make_wave_env(
        dim, w.build_triple_ring_design_space(), source,
        resolution=RES, integration_steps=STEPS, actions=4,
    )
    policy = RandomDesignPolicy(env.action_space)
    _, ep = generate_episode(env, policy, jax.random.PRNGKey(0))
    data = prepare_data(ep, horizon=2)
    model = AcousticEnergyModel.create(
        design_space=w.build_triple_ring_design_space(),
        source_freq=1000.0, elements=E, h_size=8, nfreq=8,
        integration_steps=STEPS,
    )
    params = model.init(jax.random.PRNGKey(0), data)
    return env, data, model, params


def test_train_loop(setup, tmp_path):
    env, data, model, params = setup
    config = TrainConfig(
        lr=1e-3, batch_size=2, accumulate=2, epochs=16, val_every=4,
        val_batches=1, checkpoint_dir=str(tmp_path),
    )
    loss_fn = lambda p, b: energy_loss(model, p, b)
    params2, opt_state, logger = train(loss_fn, params, data, data, config)
    assert len(logger.history) >= 1
    first, last = logger.history[0], logger.history[-1]
    assert np.isfinite(last["train_loss"])
    # checkpoints written
    import os

    ckpts = [d for d in os.listdir(tmp_path) if d.startswith("checkpoint_step=")]
    assert ckpts

    # roundtrip a checkpoint
    opt = make_optimizer(config)
    opt_like = opt.init(params)
    p3, o3, step = load_checkpoint(os.path.join(tmp_path, ckpts[-1]), params, opt_like)
    l0 = jax.tree_util.tree_leaves(params2)
    l1 = jax.tree_util.tree_leaves(p3)
    # loaded params match some saved state (same structure, finite)
    assert len(l0) == len(l1)
    assert all(np.isfinite(np.asarray(x)).all() for x in l1)


def test_checkpoint_exact_roundtrip(setup, tmp_path):
    env, data, model, params = setup
    save_checkpoint(str(tmp_path / "c"), params, step=7)
    p2, _, step = load_checkpoint(str(tmp_path / "c"), params)
    assert step == 7
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_random_shooting(setup):
    env, data, model, params = setup
    state = env_reset(env, jax.random.PRNGKey(1))
    mpc = RandomShooting(model=model, horizon=2, shots=8, alpha=1.0)
    mpc_jit = jax.jit(lambda p, e, s, k: mpc(p, e, s, k))
    action, info = mpc_jit(params, env, state, jax.random.PRNGKey(2))
    assert info["cost"].shape == (8,)
    # chosen cost is the min
    assert float(info["cost"][info["idx"]]) == float(info["cost"].min())
    # action is a valid single action
    r = np.asarray(action.config.cylinders.r)
    assert r.shape == (18,)
    # env accepts it
    state2, _ = env_step(env, state, action)
    assert int(state2.time_step) == STEPS


def test_gradient_shooting_improves(setup):
    env, data, model, params = setup
    state = env_reset(env, jax.random.PRNGKey(1))
    mpc = GradientShooting(model=model, horizon=2, shots=4, lr=0.02, steps=5)
    action, info = mpc(params, env, state, jax.random.PRNGKey(2))
    hist = np.asarray(info["cost_history"])  # (steps, shots)
    # optimization does not increase the best-shot cost
    assert hist[-1].min() <= hist[0].min() + 1e-5
    r = np.asarray(action.config.cylinders.r)
    scale = float(env.action_space.high.config.cylinders.r[0])
    assert (np.abs(r) <= scale + 1e-5).all()


def test_action_cost():
    space = w.build_triple_ring_design_space()
    a_space = w.build_action_space(space.low, 0.25)
    keys = jax.random.split(jax.random.PRNGKey(0), 6).reshape(3, 2, 2)
    actions = jax.vmap(jax.vmap(a_space.sample))(keys)
    cost = compute_action_cost(actions)
    assert cost.shape == (3,)
    assert (np.asarray(cost) > 0).all()


def test_mpc_episode_fused(setup):
    """Whole-episode fused MPC program: runs, finite, costs are argmins."""
    from waves_jl_tpu.control import make_mpc_episode_fused

    env, data, model, params = setup
    mpc = RandomShooting(model=model, horizon=2, shots=4, alpha=1.0)
    run = make_mpc_episode_fused(env, mpc, interpret=True)
    state = env_reset(env, jax.random.PRNGKey(3))
    final, signals, costs = run(params, state, jax.random.PRNGKey(4))
    assert signals.shape == (env.actions, STEPS + 1, 3)
    assert costs.shape == (env.actions,)
    assert np.isfinite(np.asarray(signals)).all()
    assert int(final.time_step) == env.actions * STEPS


def test_orbax_checkpoint_roundtrip(setup, tmp_path):
    """Opt-in orbax backend: exact round-trip of params + opt_state + step."""
    pytest.importorskip("orbax.checkpoint")
    from waves_jl_tpu.train.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    env, data, model, params = setup
    opt = make_optimizer(TrainConfig(accumulate=1))
    opt_state = opt.init(params)
    p = str(tmp_path / "ck")
    save_checkpoint_orbax(p, params, opt_state, step=7)
    p2, o2, step = load_checkpoint_orbax(p, params, opt_state)
    assert step == 7
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(opt_state), jax.tree_util.tree_leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
