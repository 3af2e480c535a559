"""Multi-device tests on the virtual 8-device CPU mesh: DP training parity
and domain-decomposed FDTD vs single-device golden."""
import jax
import jax.numpy as jnp
import numpy as np

import waves_jl_tpu as w
from waves_jl_tpu.parallel import (
    make_dp_train_step,
    make_mesh,
    make_sharded_rollout,
    shard_batch,
)

N = 64
C0 = float(w.WATER)
DT = 1e-5


def test_mesh():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)


def test_domain_decomposed_fdtd_matches_single_device():
    """y-sharded rollout over 8 devices == single-device rollout (halo
    exchange + one-sided edges correct at float32)."""
    dim = w.two_dim(5.0, N)
    grid = w.build_grid(dim)
    dyn = w.make_acoustic_dynamics_2d(dim, C0, 1.0, 20000.0)
    space = w.build_triple_ring_design_space()
    design = space.sample(jax.random.PRNGKey(0))
    # shrink positions into the small domain so the cloak is on-grid
    design = jax.tree_util.tree_map(lambda x: x, design)
    action = w.build_action_space(design, 0.25).sample(jax.random.PRNGKey(1))
    d2 = space(design, action)

    steps = 40
    tspan = w.build_tspan(0.0, DT, steps)
    interp = w.DesignInterpolator(design, d2, tspan[0], tspan[-1])

    shape = w.build_normal(grid, jnp.array([[0.0, 0.0]]), jnp.array([0.3]), jnp.array([1.0]))
    src = w.Source(shape=shape, freq=jnp.float32(1000.0))

    # single-device reference
    C = w.SpeedField(interp=interp, grid=grid, c0=jnp.float32(C0))
    it = w.Integrator(dynamics=dyn, dt=DT)
    u0 = w.build_wave(dim, 12)
    traj = it(u0, tspan, (C, src))
    d_omega = float(w.get_dx(dim)) ** 2
    u_tot, u_inc = traj[:, 0], traj[:, 6]
    sig_ref = np.stack(
        [
            np.sum(np.asarray(u_tot) ** 2, axis=(1, 2)) * d_omega,
            np.sum(np.asarray(u_inc) ** 2, axis=(1, 2)) * d_omega,
            np.sum(np.asarray(u_tot - u_inc) ** 2, axis=(1, 2)) * d_omega,
        ],
        axis=-1,
    )

    # sharded rollout
    mesh = make_mesh(8, axis_name="space")
    rollout = make_sharded_rollout(
        mesh, C0, dyn.dx, dyn.dy, steps, DT, axis_name="space"
    )
    sy = jnp.asarray(np.asarray(dyn.pml).T)
    u_final, sig = rollout(
        u0, tspan, interp, grid, shape, jnp.float32(1000.0), dyn.pml, sy,
        dyn.bc, jnp.float32(d_omega),
    )
    scale = np.abs(sig_ref).max()
    np.testing.assert_allclose(np.asarray(sig), sig_ref, rtol=0, atol=2e-5 * scale)
    np.testing.assert_allclose(
        np.asarray(u_final), np.asarray(traj[-1]), rtol=0,
        atol=1e-5 * float(np.abs(np.asarray(traj[-1])).max()),
    )


def test_dp_training_matches_single_device():
    """8-way DP train step == single-device step on the same global batch."""
    import optax

    from waves_jl_tpu.data import generate_episode, prepare_data
    from waves_jl_tpu.env import RandomDesignPolicy, make_wave_env
    from waves_jl_tpu.models import AcousticEnergyModel, energy_loss

    dim = w.two_dim(15.0, 48)
    grid = w.build_grid(dim)
    source = w.GaussianSource.create(
        grid, jnp.array([[-10.0, -10.0]]), jnp.array([[-10.0, 10.0]]),
        jnp.array([0.3]), jnp.array([1.0]), 1000.0,
    )
    env = make_wave_env(
        dim, w.build_triple_ring_design_space(), source,
        resolution=(16, 16), integration_steps=10, actions=8,
    )
    policy = RandomDesignPolicy(env.action_space)
    _, ep = generate_episode(env, policy, jax.random.PRNGKey(0))
    data = prepare_data(ep, horizon=1)  # 8 samples -> 1 per device

    model = AcousticEnergyModel.create(
        design_space=w.build_triple_ring_design_space(),
        source_freq=1000.0, elements=64, h_size=8, nfreq=8, integration_steps=10,
    )
    params = model.init(jax.random.PRNGKey(0), data)
    loss_fn = lambda p, b: energy_loss(model, p, b)
    opt = optax.adam(1e-3)

    # single-device
    @jax.jit
    def single_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    p1, _, loss1 = single_step(params, opt.init(params), data)

    # 8-way DP: per-shard mean-loss grads pmean'd == global mean grads
    mesh = make_mesh(8, axis_name="data")
    dp_step = make_dp_train_step(loss_fn, opt, mesh, axis_name="data")
    sharded = shard_batch(data, mesh, "data")
    p2, _, loss2 = dp_step(params, opt.init(params), sharded)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
