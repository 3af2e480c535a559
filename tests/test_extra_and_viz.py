"""Extra physics demos, visualization smoke tests, and the adjoint
latent-IC optimization (port of scripts/adjoint_sensitivity.jl as a test)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

import waves_jl_tpu as w
from waves_jl_tpu.models import embed_sin, sin_basis
from waves_jl_tpu.physics.extra import make_pandemic_dynamics, make_wildfire_dynamics


def test_pandemic_dynamics():
    """Undamped free wave: energy grows from the source, field stays finite,
    Dirichlet preserved (reference scripts/pandemic.jl)."""
    dim = w.two_dim(5.0, 64)
    grid = w.build_grid(dim)
    dyn = make_pandemic_dynamics(dim)
    it = w.Integrator(dynamics=dyn, dt=1e-5)
    shape = w.build_normal(grid, jnp.array([[0.0, 0.0]]), jnp.array([0.3]), jnp.array([1.0]))
    src = w.Source(shape=shape, freq=jnp.float32(1000.0))
    tspan = w.build_tspan(0.0, 1e-5, 100)
    traj = it(w.build_wave(dim, 3), tspan, (src,))
    assert traj.shape == (101, 3, 64, 64)
    assert np.isfinite(np.asarray(traj)).all()
    assert float(jnp.abs(traj[-1, 0]).max()) > 0
    assert float(jnp.abs(traj[:, 0, 0, :]).max()) == 0.0  # Dirichlet


def test_wildfire_dynamics():
    """Reaction-diffusion burn: temperature rises at the ignition site and
    fuel is consumed."""
    dim = w.two_dim(100.0, 64)
    grid = w.build_grid(dim)
    dyn = make_wildfire_dynamics(dim)
    it = w.Integrator(dynamics=dyn, dt=1e-3)
    T0 = 298.15 + 600.0 * w.build_normal(
        grid, jnp.array([[0.0, 0.0]]), jnp.array([5.0]), jnp.array([200.0])
    ) / float(
        w.build_normal(grid, jnp.array([[0.0, 0.0]]), jnp.array([5.0]), jnp.array([200.0])).max()
    )
    X0 = jnp.ones((64, 64))
    u0 = jnp.stack([T0, X0])
    tspan = w.build_tspan(0.0, 1e-3, 200)
    traj = it(u0, tspan, ())
    assert np.isfinite(np.asarray(traj)).all()
    X_final = np.asarray(traj[-1, 1])
    assert X_final.min() < 0.999  # some fuel burned
    assert X_final.max() <= 1.0 + 1e-5


def test_adjoint_latent_ic_optimization():
    """Optimize latent IC freq coefs toward a target waveform through the
    rollout — the reference's adjoint-sensitivity demo, via jax.grad."""
    E, nfreq, steps = 128, 16, 60
    dt = 1e-5
    gs = 15.0
    latent_dim = w.one_dim(gs, E)
    dyn = w.make_acoustic_dynamics_1d(latent_dim, float(w.WATER), 5.0, 10000.0)
    it = w.Integrator(dynamics=dyn, dt=dt, checkpoint="step")
    target = w.build_normal(latent_dim.x, jnp.array([0.0]), jnp.array([0.3]), jnp.array([1.0]))
    basis = sin_basis(E, gs, nfreq)
    coefs = jax.random.normal(jax.random.PRNGKey(0), (1, 4, nfreq)) * 0.01
    tspan = jnp.broadcast_to(w.build_tspan(0.0, dt, steps), (1, steps + 1))
    C = w.LinearInterpolation(tspan[:, jnp.array([0, -1])], jnp.ones((1, 2, E)))
    F = w.Source(shape=jnp.zeros((1, E)), freq=jnp.float32(1.0))
    PML = jnp.broadcast_to(dyn.pml / dyn.pml[0], (1, E))
    theta = (C, F, PML)

    def loss_fn(c):
        z = it(embed_sin(basis, c), tspan, theta)
        return jnp.mean((z[-1, 0, 0] - target) ** 2)

    opt = optax.adam(5e-2)
    opt_state = opt.init(coefs)

    @jax.jit
    def step(c, s):
        l, g = jax.value_and_grad(loss_fn)(c)
        u, s = opt.update(g, s)
        return optax.apply_updates(c, u), s, l

    losses = []
    for _ in range(8):
        coefs, opt_state, loss = step(coefs, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_viz_smoke(tmp_path):
    from waves_jl_tpu.viz import plot_energy, plot_field, render_video

    t = np.linspace(0, 1e-3, 51)
    sig = np.abs(np.random.default_rng(0).normal(size=(51, 3)))
    plot_energy(t, sig, str(tmp_path / "energy.png"))
    assert (tmp_path / "energy.png").exists()

    space = w.build_triple_ring_design_space()
    d = space.sample(jax.random.PRNGKey(0))
    f = np.random.default_rng(0).normal(size=(64, 64)).astype(np.float32)
    plot_field(f, (-15, 15, -15, 15), str(tmp_path / "field.png"), design=d)
    assert (tmp_path / "field.png").exists()

    frames = np.random.default_rng(0).normal(size=(3, 32, 32)).astype(np.float32)
    out = render_video(frames, (-15, 15, -15, 15), str(tmp_path / "vid.mp4"))
    # mp4, gif, or PNG-frame-directory fallback
    import os as _os

    assert _os.path.exists(out)


def test_render_episode(tmp_path):
    from waves_jl_tpu.env import RandomDesignPolicy, make_wave_env
    from waves_jl_tpu.viz.episode import render_episode

    dim = w.two_dim(15.0, 48)
    grid = w.build_grid(dim)
    source = w.GaussianSource.create(
        grid, jnp.array([[-10.0, -10.0]]), jnp.array([[-10.0, 10.0]]),
        jnp.array([0.3]), jnp.array([1.0]), 1000.0,
    )
    env = make_wave_env(
        dim, w.build_triple_ring_design_space(), source,
        resolution=(16, 16), integration_steps=10, actions=2,
    )
    policy = RandomDesignPolicy(env.action_space)
    out = str(tmp_path / "ep.mp4")
    signals = render_episode(env, policy, jax.random.PRNGKey(0), out, stride=5)
    assert signals.shape == (2, 11, 3)
    assert (
        (tmp_path / "ep.mp4").exists()
        or (tmp_path / "ep.gif").exists()
        or (tmp_path / "ep").exists()
    )

    # downsampled on-device render path: frames shrink, signals exact
    from waves_jl_tpu.env import env_reset, env_step_full
    from waves_jl_tpu.viz.episode import rollout_fields

    state = env_reset(env, jax.random.PRNGKey(3))
    action = env.action_space.sample(jax.random.PRNGKey(4))
    _, info_full = env_step_full(env, state, action)
    s2, info_ds = env_step_full(env, state, action, render_size=24, time_stride=5)
    assert info_ds["u_tot"].shape == (3, 24, 24)
    assert info_ds["tspan"].shape == (3,)
    np.testing.assert_allclose(
        np.asarray(info_full["tspan"][::5]), np.asarray(info_ds["tspan"])
    )
    # the state signal is computed from the full-resolution trajectory
    np.testing.assert_allclose(
        np.asarray(s2.signal), np.asarray(env_step_full(env, state, action)[0].signal)
    )
    times, frames, designs, sigs = rollout_fields(
        env, policy, jax.random.PRNGKey(5), stride=5, render_size=24
    )
    assert frames.shape[1:] == (24, 24)
    assert len(times) == len(frames) == len(designs)
    assert np.isfinite(frames).all()


def test_scripts_importable():
    """Workflow scripts import and expose their builders."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts_tpu"))
    import datagen

    env = datagen.build_env(n=200, integration_steps=10, actions=2)
    assert env.integration_steps == 10
    import mpc as mpc_script
    import prediction
    import render as render_script
    import train as train_script

    assert callable(train_script.build_model)
    assert callable(mpc_script.scattered_tail_mean)
    sig = np.zeros((2, 11, 3), np.float32)
    sig[:, :, 2] = 1.0
    assert mpc_script.scattered_tail_mean(sig) == 1.0


def test_loess_smoother():
    """The error-plot loess smoother (reference `scripts/error_plot.jl:13-19`)
    reproduces a linear trend exactly and damps single-point noise."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts_tpu"))
    from prediction import loess

    x = np.arange(10, dtype=np.float64)
    y = 2.0 * x + 1.0
    # degree-1 local fits are exact on a line
    np.testing.assert_allclose(loess(x, y), y, atol=1e-8)

    noisy = y.copy()
    noisy[5] += 10.0
    smooth = loess(x, noisy)
    # the spike is damped below its raw excursion and neighbors stay close
    assert abs(smooth[5] - y[5]) < 9.0
    assert np.all(np.isfinite(smooth))
    # short inputs pass through unchanged
    np.testing.assert_allclose(loess(x[:2], y[:2]), y[:2])
