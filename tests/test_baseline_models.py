"""NODE + PINN baseline model tests: shapes, gradients, short fits."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import waves_jl_tpu as w
from waves_jl_tpu.data import generate_episode, prepare_data
from waves_jl_tpu.env import RandomDesignPolicy, make_wave_env
from waves_jl_tpu.models import (
    NODEEnergyModel,
    WaveControlPINN,
    WaveControlPINNLoss,
    node_loss,
)

E = 64
NFREQ = 8
H_SIZE = 8
STEPS = 10
RES = (16, 16)


@pytest.fixture(scope="module")
def data():
    dim = w.two_dim(15.0, 48)
    grid = w.build_grid(dim)
    source = w.GaussianSource.create(
        grid, jnp.array([[-10.0, -10.0]]), jnp.array([[-10.0, 10.0]]),
        jnp.array([0.3]), jnp.array([1.0]), 1000.0,
    )
    env = make_wave_env(
        dim, w.build_triple_ring_design_space(), source,
        resolution=RES, integration_steps=STEPS, actions=3,
    )
    policy = RandomDesignPolicy(env.action_space)
    _, ep = generate_episode(env, policy, jax.random.PRNGKey(0))
    return prepare_data(ep, horizon=1), prepare_data(ep, horizon=2)


def test_node_model(data):
    data1, data2 = data
    model = NODEEnergyModel.create(
        design_space=w.build_triple_ring_design_space(),
        elements=E, h_size=H_SIZE, nfreq=NFREQ, integration_steps=STEPS,
    )
    params = model.init(jax.random.PRNGKey(0), data2)
    pred = model(params, data2)
    B, L = data2["t"].shape
    assert pred.shape == (B, L)
    assert np.isfinite(np.asarray(pred)).all()

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(lambda p: node_loss(model, p, data2))(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_pinn_model(data):
    data1, data2 = data
    model = WaveControlPINN.create(
        design_space=w.build_triple_ring_design_space(),
        source_freq=1000.0,
        elements=E, h_size=H_SIZE, nfreq=NFREQ, l_size=8, integration_steps=STEPS,
    )
    params = model.init(jax.random.PRNGKey(0), data1)
    # forward over 2-action horizon: autoregressive windows join correctly
    pred = model(params, data2)
    B, L = data2["t"].shape
    assert pred.shape == (B, L, 3)
    assert np.isfinite(np.asarray(pred)).all()
    sol = model.generate_latent_solution(params, data2)
    assert sol.shape == (B, L, 4, E)

    # physics loss on horizon-1 data trains
    loss_fn = WaveControlPINNLoss(model=model, c0=float(w.WATER))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(lambda p: loss_fn(p, data1))(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_pinn_predict_energy_matches_call(data):
    """predict_energy (energy-only scan, optional chunked field-net rows)
    must agree with the full-field __call__ path to float32 tolerance —
    it is the memory-bounded route for the reference's long-horizon sweep
    (`scripts/prediction.jl:60-91`)."""
    data1, data2 = data
    model = WaveControlPINN.create(
        design_space=w.build_triple_ring_design_space(),
        source_freq=1000.0,
        elements=E, h_size=H_SIZE, nfreq=NFREQ, l_size=8, integration_steps=STEPS,
    )
    params = model.init(jax.random.PRNGKey(0), data1)
    ref = np.asarray(model(params, data2))
    for chunk in (None, 4, 7):
        got = np.asarray(model.predict_energy(params, data2, time_chunk=chunk))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_pinn_acceptance_smoke(tmp_path, monkeypatch):
    """Tiny run of the SimpleWave standalone-PINN acceptance recipe
    (reference `test/pinn.jl`): losses finite and decreasing."""
    import sys

    import scripts_tpu.pinn_acceptance as pa

    monkeypatch.setattr(
        sys, "argv",
        ["pinn_acceptance", "--out", str(tmp_path), "--elements", "64",
         "--steps", "20", "--h-size", "16", "--depth", "3", "--iters", "40",
         "--chunk", "20"],
    )
    rel_err = pa.main()
    assert np.isfinite(rel_err)
