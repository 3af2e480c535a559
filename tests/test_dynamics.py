"""Dynamics + integrator tests: golden parity with the NumPy re-execution of
the reference equations, physics invariants (PML decay, u_sc == 0 when the
design speed equals c0, Dirichlet preservation), and gradient checks of the
scan rollout vs finite differences (replacing the reference's trust in its
hand-written rrule, `src/dynamics.jl:97-128`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import waves_jl_tpu as w
from golden_numpy import (
    acoustic_rhs_12ch_np,
    build_pml_2d_np,
    dirichlet_2d_np,
    gradient_matrix_np,
    rk4_rollout_2d_np,
)

N = 64  # small grid for CPU golden runs
GS = 5.0
C0 = float(w.WATER)
DT = 1e-5


def _setup_2d():
    dim = w.two_dim(GS, N)
    dyn = w.make_acoustic_dynamics_2d(dim, C0, 1.0, 20000.0)
    grid = w.build_grid(dim)
    shape = w.build_normal(grid, jnp.array([[0.0, 0.0]]), jnp.array([0.3]), jnp.array([1.0]))
    src = w.Source(shape=shape, freq=jnp.float32(1000.0))
    return dim, dyn, grid, src


class ConstSpeed:
    pass


def test_rhs_golden_parity():
    """One RHS evaluation matches the NumPy golden at float32."""
    dim, dyn, grid, src = _setup_2d()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(12, N, N)).astype(np.float32) * 0.1

    c_field = jnp.full((N, N), C0 * 1.1, dtype=jnp.float32)

    class _C:
        def __call__(self, t):
            return c_field

    t = jnp.float32(3e-4)
    ours = np.asarray(dyn(jnp.asarray(x), t, (_C(), src)))

    G = gradient_matrix_np(np.asarray(dim.x))
    pml = build_pml_2d_np(np.asarray(dim.x), N, 1.0, 20000.0)
    bc = dirichlet_2d_np(N, N)
    f = np.asarray(src(t))
    golden = acoustic_rhs_12ch_np(
        np.moveaxis(x, 0, -1), np.asarray(c_field), C0, f, G, pml, bc
    )
    golden = np.moveaxis(golden, -1, 0)
    # per-channel error relative to the channel scale: pointwise comparison
    # is ill-posed where b*(Vxx+Vyy) nearly cancels (f32 reassociation of
    # the stencil vs the golden's matmul is amplified by b ~ c^2 ~ 3e6).
    for ch in range(12):
        scale = np.abs(golden[ch]).max() + 1e-30
        err = np.abs(ours[ch] - golden[ch]).max() / scale
        assert err < 1e-5, (ch, err)


def test_rollout_golden_parity():
    """60-step RK4 rollout matches the NumPy golden within 1e-5 relative."""
    dim, dyn, grid, src = _setup_2d()
    steps = 60
    tspan = w.build_tspan(0.0, DT, steps)
    u0 = w.build_wave(dim, 12)

    c_field = jnp.full((N, N), C0, dtype=jnp.float32)

    class _C:
        def __call__(self, t):
            return c_field

    iterator = w.Integrator(dynamics=dyn, dt=DT)
    traj = np.asarray(iterator(u0, tspan, (_C(), src)))

    G = gradient_matrix_np(np.asarray(dim.x))
    pml = build_pml_2d_np(np.asarray(dim.x), N, 1.0, 20000.0)
    bc = dirichlet_2d_np(N, N)
    fshape = np.asarray(src.shape)

    def rhs(u, t):
        f = fshape * np.float32(np.sin(2.0 * np.pi * t * 1000.0))
        return acoustic_rhs_12ch_np(u, np.asarray(c_field), C0, f, G, pml, bc)

    golden = rk4_rollout_2d_np(
        np.zeros((N, N, 12), np.float32), np.asarray(tspan), rhs, np.float32(DT)
    )
    golden = np.moveaxis(golden, -1, 1)  # (T+1, 12, nx, ny)

    scale = np.abs(golden).max()
    err = np.abs(traj - golden).max() / scale
    assert err < 1e-5, err


def test_scattered_zero_when_design_matches_ambient():
    """u_sc == 0 when the design wavespeed equals c0 (checked only visually
    in the reference)."""
    dim, dyn, grid, src = _setup_2d()
    tspan = w.build_tspan(0.0, DT, 50)
    u0 = w.build_wave(dim, 12)

    c_field = jnp.full((N, N), C0, dtype=jnp.float32)

    class _C:
        def __call__(self, t):
            return c_field

    iterator = w.Integrator(dynamics=dyn, dt=DT)
    traj = iterator(u0, tspan, (_C(), src))
    u_sc = traj[:, 0] - traj[:, 6]
    assert float(jnp.abs(u_sc).max()) < 1e-7


def test_dirichlet_preserved():
    dim, dyn, grid, src = _setup_2d()
    tspan = w.build_tspan(0.0, DT, 30)
    u0 = w.build_wave(dim, 12)
    c_field = jnp.full((N, N), C0, dtype=jnp.float32)

    class _C:
        def __call__(self, t):
            return c_field

    iterator = w.Integrator(dynamics=dyn, dt=DT)
    traj = iterator(u0, tspan, (_C(), src))
    U = traj[:, 0]
    assert float(jnp.abs(U[:, 0, :]).max()) == 0.0
    assert float(jnp.abs(U[:, -1, :]).max()) == 0.0
    assert float(jnp.abs(U[:, :, 0]).max()) == 0.0
    assert float(jnp.abs(U[:, :, -1]).max()) == 0.0


def test_pml_decay():
    """Energy injected by a pulse decays inside the PML (no reflection
    blow-up): total displacement energy at the end of a long free-field run
    is below its peak."""
    dim = w.two_dim(GS, N)
    dyn = w.make_acoustic_dynamics_2d(dim, C0, 2.0, 20000.0)
    grid = w.build_grid(dim)
    shape = w.build_normal(grid, jnp.array([[0.0, 0.0]]), jnp.array([0.3]), jnp.array([1.0]))
    u0 = w.build_wave(dim, 12)
    u0 = u0.at[0].set(shape)  # initial displacement bump, no source
    u0 = u0.at[6].set(shape)

    class _C:
        def __call__(self, t):
            return jnp.asarray(C0, dtype=jnp.float32)

    src = w.NoSource()
    iterator = w.Integrator(dynamics=dyn, dt=DT)
    tspan = w.build_tspan(0.0, DT, 400)
    traj = iterator(u0, tspan, (_C(), src))
    e = jnp.sum(traj[:, 0] ** 2, axis=(1, 2))
    assert float(e[-1]) < 0.5 * float(e.max())


def _latent_setup(B=2, E=128):
    dim = w.one_dim(10.0, E)
    dyn = w.make_acoustic_dynamics_1d(dim, C0, 1.0, 10000.0)
    rng = np.random.default_rng(3)
    z0 = jnp.asarray(rng.normal(size=(B, 4, E)).astype(np.float32) * 0.1)
    tspan = jnp.broadcast_to(w.build_tspan(0.0, DT, 20), (B, 21))
    C = w.LinearInterpolation(
        X=tspan[:, [0, -1]],
        Y=jnp.ones((B, 2, E), jnp.float32),
    )
    F = w.Source(shape=jnp.zeros((B, E), jnp.float32), freq=jnp.float32(1000.0))
    PML = jnp.broadcast_to(dyn.pml / dyn.pml[0], (B, E))
    return dyn, z0, tspan, (C, F, PML)


def test_latent_rollout_shapes_and_grad():
    dyn, z0, tspan, theta = _latent_setup()
    iterator = w.Integrator(dynamics=dyn, dt=DT, checkpoint="step")

    def loss(z0_):
        traj = iterator(z0_, tspan, theta)
        return jnp.sum(traj[-1] ** 2)

    traj = iterator(z0, tspan, theta)
    assert traj.shape == (21, 2, 4, 128)
    g = jax.grad(loss)(z0)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


@pytest.mark.parametrize("checkpoint", ["none", "step", "sqrt"])
def test_checkpoint_variants_agree(checkpoint):
    dyn, z0, tspan, theta = _latent_setup()
    base = w.Integrator(dynamics=dyn, dt=DT, checkpoint="none")
    var = w.Integrator(dynamics=dyn, dt=DT, checkpoint=checkpoint)
    t0 = base(z0, tspan, theta)
    t1 = var(z0, tspan, theta)
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), rtol=1e-6, atol=1e-7)

    g0 = jax.grad(lambda z: jnp.sum(base(z, tspan, theta) ** 2))(z0)
    g1 = jax.grad(lambda z: jnp.sum(var(z, tspan, theta) ** 2))(z0)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-4, atol=1e-6)


def test_rollout_grad_matches_finite_difference():
    """jax.grad through the scan vs central finite differences — replaces
    the reference's trust in its hand-written adjoint."""
    dyn, z0, tspan, theta = _latent_setup(B=1, E=64)
    iterator = w.Integrator(dynamics=dyn, dt=DT, checkpoint="step")

    def loss(z):
        traj = iterator(z, tspan, theta)
        return jnp.sum(traj[-1, :, 0] ** 2)

    g = np.asarray(jax.grad(loss)(z0))
    rng = np.random.default_rng(0)
    for _ in range(3):
        i = (0, rng.integers(0, 4), rng.integers(0, 64))
        eps = 1e-3
        zp = z0.at[i].add(eps)
        zm = z0.at[i].add(-eps)
        fd = (float(loss(zp)) - float(loss(zm))) / (2 * eps)
        assert abs(fd - g[i]) <= 2e-3 * max(1.0, abs(fd)), (fd, g[i])


def test_acoustic_3d_smoke():
    """3D extension (beyond the reference, which declares ThreeDim but never
    integrates it): free-field + point source stays finite, scattered field
    is exactly zero when both stacks share the ambient speed, Dirichlet
    edges hold, and PML absorbs (late energy < peak energy)."""
    n = 48
    dim = w.three_dim(5.0, n)
    dyn = w.make_acoustic_dynamics_3d(dim, float(w.WATER), 1.0, 20000.0)
    it = w.Integrator(dynamics=dyn, dt=1e-5)
    grid = w.build_grid(dim)
    d2 = ((grid - jnp.array([0.0, 0.0, 0.0])) ** 2).sum(-1)
    shape = jnp.exp(-d2 / (2.0 * 0.3**2))

    C = lambda t: jnp.float32(w.WATER)
    F = lambda t: shape * jnp.sin(2.0 * jnp.pi * 1000.0 * t)
    u0 = w.build_wave(dim, 16)
    tspan = w.build_tspan(0.0, 1e-5, 120)
    traj = jax.jit(lambda u: it(u, tspan, (C, F)))(u0)
    assert traj.shape == (121, 16, n, n, n)
    arr = np.asarray(traj)
    assert np.isfinite(arr).all()
    # scattered = total - incident == 0 when c == c0 everywhere
    np.testing.assert_allclose(arr[:, 0], arr[:, 8], atol=1e-6)
    # Dirichlet edges exactly zero on U
    assert (arr[:, 0, 0, :, :] == 0).all() and (arr[:, 0, :, :, 0] == 0).all()
    # energy rises then decays (PML absorbs once the wavefront reaches it)
    e = (arr[:, 0] ** 2).sum(axis=(1, 2, 3))
    assert e.max() > 0
    assert e[-1] < 0.8 * e.max()
