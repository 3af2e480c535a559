"""vmap-batched episode generation + DP-meshed train() loop."""
import jax
import jax.numpy as jnp
import numpy as np

import waves_jl_tpu as w
from waves_jl_tpu.data import (
    generate_episode,
    generate_episodes_batch,
    prepare_data,
    split_episode_batch,
)
from waves_jl_tpu.env import RandomDesignPolicy, make_wave_env
from waves_jl_tpu.models import AcousticEnergyModel, energy_loss
from waves_jl_tpu.parallel import make_mesh
from waves_jl_tpu.train import TrainConfig, train


def _env():
    dim = w.two_dim(15.0, 48)
    grid = w.build_grid(dim)
    source = w.GaussianSource.create(
        grid, jnp.array([[-10.0, -10.0]]), jnp.array([[-10.0, 10.0]]),
        jnp.array([0.3]), jnp.array([1.0]), 1000.0,
    )
    return make_wave_env(
        dim, w.build_triple_ring_design_space(), source,
        resolution=(16, 16), integration_steps=10, actions=2,
    )


def test_batched_episode_generation():
    env = _env()
    policy = RandomDesignPolicy(env.action_space)
    batched = generate_episodes_batch(env, policy, jax.random.PRNGKey(0), batch=3)
    eps = split_episode_batch(batched)
    assert len(eps) == 3
    assert eps[0].s_wave.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(eps[0].y)).all()
    # different keys -> different episodes
    assert not np.allclose(np.asarray(eps[0].y), np.asarray(eps[1].y))
    # windowing works on a split episode
    data = prepare_data(eps[0], horizon=2)
    assert data["t"].shape == (1, 21)


def test_train_with_mesh():
    env = _env()
    policy = RandomDesignPolicy(env.action_space)
    _, ep = generate_episode(env, policy, jax.random.PRNGKey(0))
    data = prepare_data(ep, horizon=1)
    model = AcousticEnergyModel.create(
        design_space=w.build_triple_ring_design_space(),
        source_freq=1000.0, elements=64, h_size=8, nfreq=8, integration_steps=10,
    )
    params = model.init(jax.random.PRNGKey(0), data)
    mesh = make_mesh(2, axis_name="data")
    config = TrainConfig(lr=1e-3, batch_size=2, accumulate=1, epochs=4,
                         val_every=2, val_batches=1)
    loss_fn = lambda p, b: energy_loss(model, p, b)
    params2, _, logger = train(loss_fn, params, data, data, config, mesh=mesh)
    assert logger.history
    assert np.isfinite(logger.history[-1]["train_loss"])
