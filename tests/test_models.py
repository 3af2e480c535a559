"""Surrogate model tests: shapes, differentiability, and a tiny end-to-end
fit on real episode data (loss decreases)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import waves_jl_tpu as w
from waves_jl_tpu.data import generate_episode, prepare_data
from waves_jl_tpu.env import RandomDesignPolicy, make_wave_env
from waves_jl_tpu.models import (
    AcousticEnergyModel,
    energy_loss,
    sin_basis,
    embed_sin,
    unroll_design_sequence,
)

# tiny config for CPU tests
E = 128
NFREQ = 16
H_SIZE = 16
STEPS = 20
RES = (16, 16)


@pytest.fixture(scope="module")
def env_and_data():
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
    return env, data


@pytest.fixture(scope="module")
def model(env_and_data):
    env, data = env_and_data
    return AcousticEnergyModel.create(
        design_space=w.build_triple_ring_design_space(),
        source_freq=1000.0,
        elements=E,
        latent_grid_size=100.0,
        h_size=H_SIZE,
        nfreq=NFREQ,
        integration_steps=STEPS,
    )


def test_sin_basis():
    basis = sin_basis(256, 100.0, 8)
    assert basis.shape == (256, 8)
    # basis functions vanish at the right boundary (x = grid_size)
    np.testing.assert_allclose(np.asarray(basis[-1]), 0.0, atol=1e-4)
    coefs = jnp.ones((2, 8))
    y = embed_sin(basis, coefs)
    assert y.shape == (2, 256)


def test_unroll_design_sequence():
    space = w.build_triple_ring_design_space()
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    d0 = jax.vmap(space.sample)(keys)
    a_space = w.build_action_space(space.low, 0.25)
    akeys = jax.random.split(jax.random.PRNGKey(1), 6).reshape(3, 2, 2)
    actions = jax.vmap(jax.vmap(a_space.sample))(akeys)
    vecs = unroll_design_sequence(space, d0, actions)
    assert vecs.shape == (3, 3, 18)
    assert (np.abs(np.asarray(vecs)) <= 1.0 + 1e-5).all()
    # first knot is the normalized initial design
    expect0 = jax.vmap(lambda d: w.normalize_design(d, space))(d0)
    np.testing.assert_allclose(np.asarray(vecs[:, 0]), np.asarray(expect0), rtol=1e-5)


def test_model_forward_shapes(env_and_data, model):
    env, data = env_and_data
    params = model.init(jax.random.PRNGKey(0), data)
    pred = model(params, data)
    B, L = data["t"].shape
    assert pred.shape == (B, L, 3)
    assert np.isfinite(np.asarray(pred)).all()
    z = model.generate_latent_solution(params, data)
    assert z.shape == (L, B, 4, E)


def test_model_gradients_flow(env_and_data, model):
    env, data = env_and_data
    params = model.init(jax.random.PRNGKey(0), data)
    loss, grads = jax.value_and_grad(lambda p: energy_loss(model, p, data))(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # both encoders receive gradient
    gmax = jax.tree_util.tree_map(lambda g: float(jnp.abs(g).max()), grads)
    we_max = max(jax.tree_util.tree_leaves(gmax["wave_encoder"]))
    de_max = max(jax.tree_util.tree_leaves(gmax["design_encoder"]))
    assert we_max > 0 and de_max > 0


def test_model_overfits_small_batch(env_and_data, model):
    """A few Adam steps reduce the loss — end-to-end trainability through
    the latent rollout."""
    import optax

    env, data = env_and_data
    params = model.init(jax.random.PRNGKey(0), data)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(lambda p: energy_loss(model, p, data))(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_bf16_conv_encoder_option():
    """conv_dtype=bfloat16: params stay f32, outputs close to the f32 path."""
    import waves_jl_tpu as w
    from waves_jl_tpu.models import AcousticEnergyModel

    space = w.build_triple_ring_design_space()
    kw = dict(design_space=space, source_freq=1000.0, elements=64,
              h_size=8, nfreq=8, integration_steps=10)
    m32 = AcousticEnergyModel.create(**kw)
    mbf = AcousticEnergyModel.create(conv_dtype=jnp.bfloat16, **kw)
    from __graft_entry__ import _tiny_batch

    batch = _tiny_batch(m32, B=2, horizon=1, steps=10, res=16)
    params = m32.init(jax.random.PRNGKey(0), batch)
    # same params usable by both (param dtype unchanged)
    y32 = m32(params, batch)
    ybf = mbf(params, batch)
    assert all(
        leaf.dtype == jnp.float32 for leaf in jax.tree_util.tree_leaves(params)
    )
    np.testing.assert_allclose(
        np.asarray(y32), np.asarray(ybf), rtol=0.1, atol=0.05
    )


def test_fast_ranking_mode_preserves_ordering():
    """bf16 latent-matmul fast mode: same params, cost ordering of candidate
    actions matches the f32 model (what MPC needs)."""
    import waves_jl_tpu as w
    from waves_jl_tpu.models import AcousticEnergyModel

    space = w.build_triple_ring_design_space()
    model = AcousticEnergyModel.create(
        design_space=space, source_freq=1000.0, elements=64,
        h_size=8, nfreq=8, integration_steps=10,
    )
    fast = model.fast_ranking()
    from __graft_entry__ import _tiny_batch

    batch = _tiny_batch(model, B=8, horizon=2, steps=10, res=16)
    params = model.init(jax.random.PRNGKey(0), batch)
    y32 = np.asarray(model(params, batch))
    ybf = np.asarray(fast(params, batch))
    cost32 = y32[:, :, 2].sum(axis=1)
    costbf = ybf[:, :, 2].sum(axis=1)
    np.testing.assert_allclose(costbf, cost32, rtol=0.05, atol=1e-4)
    assert int(np.argmin(costbf)) == int(np.argmin(cost32))


def test_energy_loss_sc_weight(env_and_data, model):
    """sc_weight=1 is exactly the reference equal-weight loss; weighted
    form equals the hand-computed normalized channel-weighted MSE."""
    env, data = env_and_data
    params = model.init(jax.random.PRNGKey(0), data)
    base = float(energy_loss(model, params, data))
    same = float(energy_loss(model, params, data, sc_weight=1.0))
    assert same == base

    wgt = float(energy_loss(model, params, data, sc_weight=4.0))
    pred = np.asarray(model(params, data))
    y = np.asarray(data["y"])
    se = (pred - y) ** 2
    expect = float(
        (se * np.array([1.0, 1.0, 4.0])).mean() * (3.0 / 6.0)
    )
    np.testing.assert_allclose(wgt, expect, rtol=1e-6)
