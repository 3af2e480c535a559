"""Streaming trainer: host window gather parity + scan-trainer equivalence."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import waves_jl_tpu as w
from waves_jl_tpu.data import generate_episode, prepare_data
from waves_jl_tpu.env import RandomDesignPolicy, make_wave_env
from waves_jl_tpu.models import AcousticEnergyModel, energy_loss
from waves_jl_tpu.train import (
    TrainConfig,
    gather_window_batch,
    gather_window_batch_host,
    make_scan_train_steps_batched,
    sample_window_indices,
    stack_episodes,
    train_streaming,
)
from waves_jl_tpu.train.loop import make_scan_train_steps

E = 64
STEPS = 8
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
    eps = [
        generate_episode(env, policy, jax.random.PRNGKey(i))[1] for i in range(4)
    ]
    model = AcousticEnergyModel.create(
        design_space=w.build_triple_ring_design_space(),
        source_freq=1000.0, elements=E, h_size=8, nfreq=8,
        integration_steps=STEPS,
    )
    data = prepare_data(eps[0], horizon=2)
    params = model.init(jax.random.PRNGKey(0), data)
    return env, eps, model, params


@pytest.mark.parametrize("stride", [1, 2])
def test_host_gather_matches_device(setup, stride):
    env, eps, model, params = setup
    store_d = stack_episodes(eps)
    store_h = stack_episodes(eps, device=False)
    horizon = 2
    rng = np.random.default_rng(3)
    idx = sample_window_indices(rng, len(eps), env.actions, horizon, 10)
    got = gather_window_batch_host(store_h, idx, horizon, stride)
    ref = jax.jit(
        lambda st, ix: gather_window_batch(st, ix, horizon, stride)
    )(store_d, jnp.asarray(idx))
    for a, b in zip(
        jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(got)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batched_scan_matches_dense(setup):
    """Scan over uploaded (K, B) chunks == scan with in-program gather from
    the dense dataset, fed the same minibatches."""
    env, eps, model, params = setup
    loss_fn = lambda p, b: energy_loss(model, p, b)
    opt = optax.adam(1e-3)
    horizon = 2
    S = env.actions - horizon + 1

    datasets = [prepare_data(ep, horizon) for ep in eps]
    dense = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *datasets
    )
    store_h = stack_episodes(eps, device=False)

    K, B = 3, 2
    rng = np.random.default_rng(0)
    widx = sample_window_indices(rng, len(eps), env.actions, horizon, K * B)
    batches = gather_window_batch_host(store_h, widx, horizon)
    batches = jax.tree_util.tree_map(
        lambda x: x.reshape((K, B) + x.shape[1:]), batches
    )
    dense_idx = jnp.asarray(
        (widx[:, 0] * S + widx[:, 1]).reshape(K, B), jnp.int32
    )

    run_b = make_scan_train_steps_batched(loss_fn, opt)
    run_d = make_scan_train_steps(loss_fn, opt)
    pb, _, lb = run_b(params, opt.init(params), jax.device_put(batches))
    pd, _, ld = run_d(params, opt.init(params), dense, dense_idx)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(ld), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(pb), jax.tree_util.tree_leaves(pd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


def test_train_streaming_smoke(setup, tmp_path):
    env, eps, model, params = setup
    loss_fn = lambda p, b: energy_loss(model, p, b)
    val_data = prepare_data(eps[-1], horizon=2)
    config = TrainConfig(
        lr=1e-3, batch_size=2, accumulate=1, epochs=2, val_every=3,
        val_batches=1, checkpoint_dir=str(tmp_path),
    )
    p2, _, logger = train_streaming(
        loss_fn, params, eps, val_data, config, horizon=2
    )
    assert logger.history
    last = logger.history[-1]
    assert np.isfinite(last["train_loss"]) and np.isfinite(last["val_loss"])
    import glob
    assert glob.glob(str(tmp_path / "checkpoint_step=*"))
