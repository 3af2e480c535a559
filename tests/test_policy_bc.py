"""Amortized one-shot policy (behavior cloning) tests: vec<->pytree
round-trips, box containment, loss gradients, and the fused policy-episode
program."""
import jax
import jax.numpy as jnp
import numpy as np

import waves_jl_tpu as w
from waves_jl_tpu.control import make_policy_episode_fused
from waves_jl_tpu.designs import design_with_vec
from waves_jl_tpu.env import RandomDesignPolicy, env_observe, env_reset, make_wave_env
from waves_jl_tpu.models import AmortizedPolicy, bc_loss

N = 48
RES = (16, 16)
STEPS = 10


def _make_env(actions=3):
    dim = w.two_dim(15.0, N)
    grid = w.build_grid(dim)
    source = w.GaussianSource.create(
        grid, jnp.array([[-10.0, -10.0]]), jnp.array([[-10.0, 10.0]]),
        jnp.array([0.3]), jnp.array([1.0]), 1000.0,
    )
    return make_wave_env(
        dim, w.build_triple_ring_design_space(), source,
        resolution=RES, integration_steps=STEPS, actions=actions,
    )


def test_design_with_vec_roundtrip():
    space = w.build_triple_ring_design_space()
    d = space.sample(jax.random.PRNGKey(0))
    v = d.to_vec()
    d2 = design_with_vec(d, v * 0.5)
    np.testing.assert_allclose(np.asarray(d2.to_vec()), np.asarray(v) * 0.5,
                               rtol=1e-6)
    # non-adjustable leaves untouched
    np.testing.assert_array_equal(
        np.asarray(d2.core.pos), np.asarray(d.core.pos)
    )
    np.testing.assert_array_equal(
        np.asarray(d2.config.cylinders.pos), np.asarray(d.config.cylinders.pos)
    )


def test_policy_action_in_box_and_roundtrip():
    env = _make_env()
    space = w.build_triple_ring_design_space()
    policy = AmortizedPolicy.create(space, env.action_space, h_size=8)
    state = env_reset(env, jax.random.PRNGKey(0))
    obs = env_observe(env, state)
    params = policy.init(jax.random.PRNGKey(1), obs.wave, state.design)

    a = policy.action(params, obs.wave, state.design)
    lo = np.asarray(env.action_space.low.to_vec())
    hi = np.asarray(env.action_space.high.to_vec())
    av = np.asarray(a.to_vec())
    assert (av >= lo - 1e-6).all() and (av <= hi + 1e-6).all()

    # normalize/action_from_unit invert each other on the adjustable dims
    u = policy.normalize_action(a)
    a2 = policy.action_from_unit(u)
    np.testing.assert_allclose(np.asarray(a2.to_vec()), av, atol=1e-6)


def test_bc_loss_grads_and_fit():
    """Gradients flow and a few Adam steps reduce the cloning loss."""
    import optax

    env = _make_env()
    space = w.build_triple_ring_design_space()
    policy = AmortizedPolicy.create(space, env.action_space, h_size=8)
    state = env_reset(env, jax.random.PRNGKey(0))
    obs = env_observe(env, state)
    params = policy.init(jax.random.PRNGKey(1), obs.wave, state.design)

    B = 4
    keys = jax.random.split(jax.random.PRNGKey(2), B)
    designs = jax.vmap(space.sample)(keys)
    actions = jax.vmap(env.action_space.sample)(
        jax.random.split(jax.random.PRNGKey(3), B)
    )
    batch = {
        "s_wave": jnp.broadcast_to(obs.wave, (B, *obs.wave.shape)),
        "s_design": designs,
        "a": actions,
    }
    loss_fn = jax.jit(lambda p: bc_loss(policy, p, batch))
    l0, g = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(l0))
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))

    opt = optax.adam(3e-3)
    ost = opt.init(params)

    @jax.jit
    def step(p, s):
        l, gr = jax.value_and_grad(lambda q: bc_loss(policy, q, batch))(p)
        up, s2 = opt.update(gr, s)
        return optax.apply_updates(p, up), s2, l

    p = params
    for _ in range(60):
        p, ost, l = step(p, ost)
    assert float(l) < float(l0) * 0.8, (float(l0), float(l))


def test_policy_episode_fused_runs():
    env = _make_env(actions=3)
    space = w.build_triple_ring_design_space()
    policy = AmortizedPolicy.create(space, env.action_space, h_size=8)
    state = env_reset(env, jax.random.PRNGKey(0))
    obs = env_observe(env, state)
    params = policy.init(jax.random.PRNGKey(1), obs.wave, state.design)

    run = make_policy_episode_fused(env, policy, interpret=True)
    final, signals, costs = run(params, state, jax.random.PRNGKey(2))
    assert signals.shape == (3, STEPS + 1, 3)
    assert np.isfinite(np.asarray(signals)).all()
    assert int(final.time_step) == 3 * STEPS
