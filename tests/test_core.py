"""Core primitives: grids, PML, Gaussians, interpolation, metrics."""
import jax
import jax.numpy as jnp
import numpy as np

from waves_jl_tpu import (
    LinearInterpolation,
    build_dirichlet,
    build_grid,
    build_normal,
    build_pml,
    build_tspan,
    build_wave,
    circle_mask,
    flatten_repeated_last_dim,
    get_dx,
    one_dim,
    two_dim,
)
from golden_numpy import build_pml_1d_np, build_pml_2d_np, dirichlet_2d_np


def test_grids():
    dim = two_dim(15.0, 128)
    assert dim.shape == (128, 128)
    g = build_grid(dim)
    assert g.shape == (128, 128, 2)
    # x varies along axis 0, y along axis 1
    np.testing.assert_allclose(g[:, 0, 0], dim.x)
    np.testing.assert_allclose(g[0, :, 1], dim.y)
    assert float(get_dx(dim)) > 0
    w = build_wave(dim, 12)
    assert w.shape == (12, 128, 128)


def test_dirichlet():
    dim = two_dim(5.0, 32)
    bc = build_dirichlet(dim)
    np.testing.assert_allclose(np.asarray(bc), dirichlet_2d_np(32, 32))
    dim1 = one_dim(5.0, 32)
    bc1 = build_dirichlet(dim1)
    assert bc1[0] == 0 and bc1[-1] == 0 and bc1[1:-1].min() == 1


def test_pml_golden():
    dim1 = one_dim(15.0, 512)
    ours = np.asarray(build_pml(dim1, 5.0, 10000.0))
    golden = build_pml_1d_np(np.asarray(dim1.x), 5.0, 10000.0)
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-2)

    dim2 = two_dim(15.0, 256)
    ours2 = np.asarray(build_pml(dim2, 2.0, 20000.0))
    golden2 = build_pml_2d_np(np.asarray(dim2.x), 256, 2.0, 20000.0)
    np.testing.assert_allclose(ours2, golden2, rtol=1e-4, atol=1e-2)
    # zero outside the layer, max = scale at the boundary
    assert ours2[128, :].max() == 0.0
    np.testing.assert_allclose(ours2[0, 0], 20000.0, rtol=1e-5)


def test_build_normal_shapes():
    dim = two_dim(15.0, 64)
    g = build_grid(dim)
    shape = build_normal(g, jnp.array([[-10.0, 0.0]]), jnp.array([0.3]), jnp.array([1.0]))
    assert shape.shape == (64, 64)
    assert float(shape.max()) > 0
    # integral approximately 1 (normalized gaussian, amplitude 1)
    dx = float(get_dx(dim))
    integral = float(shape.sum()) * dx * dx
    assert abs(integral - 1.0) < 0.05

    x = one_dim(15.0, 512).x
    s1 = build_normal(x, jnp.array([0.0]), jnp.array([0.3]), jnp.array([1.0]))
    assert s1.shape == (512,)


def test_flatten_repeated_last_dim():
    # two windows sharing an endpoint: [0..5], [5..10]
    a = jnp.stack([jnp.arange(6.0), jnp.arange(5.0, 11.0)], axis=0)  # (2, 6)
    out = flatten_repeated_last_dim(a)
    np.testing.assert_allclose(np.asarray(out), np.arange(11.0))
    # batched leading axes
    b = jnp.broadcast_to(a, (3, 2, 6))
    out2 = flatten_repeated_last_dim(b)
    assert out2.shape == (3, 11)


def test_linear_interp():
    B, K, E = 2, 5, 7
    X = jnp.broadcast_to(jnp.linspace(0.0, 1.0, K), (B, K))
    rng = np.random.default_rng(0)
    Y = jnp.asarray(rng.normal(size=(B, K, E)).astype(np.float32))
    interp = LinearInterpolation(X, Y)
    # exact knots (interior + final)
    np.testing.assert_allclose(np.asarray(interp(X[:, 2])), np.asarray(Y[:, 2]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(interp(X[:, -1])), np.asarray(Y[:, -1]), rtol=1e-5, atol=1e-6)
    # midpoint
    t = (X[:, 1] + X[:, 2]) / 2.0
    expect = (Y[:, 1] + Y[:, 2]) / 2.0
    np.testing.assert_allclose(np.asarray(interp(t)), np.asarray(expect), rtol=1e-4, atol=1e-6)
    # differentiable
    g = jax.grad(lambda yy: LinearInterpolation(X, yy)(t).sum())(Y)
    assert np.isfinite(np.asarray(g)).all()


def test_linear_interp_clamps_float32_overshoot():
    """Regression: under RK4 the k4 stage queries C at t + dt, which can
    overshoot the final knot by one float32 ulp; the interpolation must
    return the endpoint value, not zero (the reference's behavior)."""
    # reproduce the reference operating point: window starting at step 100
    dt = jnp.float32(1e-5)
    ti = jnp.float32(100) * dt
    tspan = ti + build_tspan(0.0, 1e-5, 100)
    knots = jnp.stack([tspan[0], tspan[-1]])[None]  # (1, 2)
    Y = jnp.ones((1, 2, 4), jnp.float32)
    interp = LinearInterpolation(knots, Y)
    # the k4 query of the last step
    t_over = (tspan[-2] + dt)[None]
    assert float(t_over[0]) >= float(knots[0, -1])  # overshoot (or equal)
    out = interp(t_over)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)
    # below-range queries clamp to the first knot value as well
    out_lo = interp(jnp.array([float(knots[0, 0]) - 1.0], jnp.float32))
    np.testing.assert_allclose(np.asarray(out_lo), 1.0, rtol=1e-6)


def test_tspan():
    t = build_tspan(0.0, 1e-5, 100)
    assert t.shape == (101,)
    np.testing.assert_allclose(float(t[-1]), 1e-3, rtol=1e-6)


def test_circle_mask():
    dim = two_dim(10.0, 64)
    m = circle_mask(dim, 5.0)
    assert bool(m[32, 32])
    assert not bool(m[0, 0])
