"""Smaller parity items: PolynomialInterpolation, SinusoidalSource,
multi_design_interpolation, flux, wave-encoder field transforms,
evaluate_over_time."""
import jax
import jax.numpy as jnp
import numpy as np

import waves_jl_tpu as w
from waves_jl_tpu.ops.fd import laplacian_matrix
from waves_jl_tpu.ops.metrics import flux
from waves_jl_tpu.utils.interp import (
    LinearInterpolation,
    PolynomialInterpolation,
    evaluate_over_time,
)
from waves_jl_tpu.models import SinusoidalSource, sin_basis


def test_polynomial_interpolation_hits_knots():
    B, K, E = 2, 4, 5
    X = jnp.broadcast_to(jnp.linspace(-1.0, 1.0, K), (B, K))
    rng = np.random.default_rng(0)
    Y = jnp.asarray(rng.normal(size=(B, K, E)).astype(np.float32))
    interp = PolynomialInterpolation(X, Y)
    y = interp(X[:, 1])
    # Lagrange basis with the reference's 1e-5 regularizer: near-exact at knots
    np.testing.assert_allclose(np.asarray(y), np.asarray(Y[:, 1]), rtol=2e-3, atol=2e-3)


def test_sinusoidal_source():
    nfreq, E = 8, 64
    basis = sin_basis(E, 15.0, nfreq)
    src = SinusoidalSource(basis=basis, freq=1000.0)
    coefs = src.init_coefs(jax.random.PRNGKey(0), nfreq)
    assert coefs.shape == (nfreq,)
    shape = src.shape(coefs)
    assert shape.shape == (E,)
    assert np.isfinite(np.asarray(shape)).all()


def test_multi_design_interpolation():
    space = w.build_triple_ring_design_space()
    d1 = space.sample(jax.random.PRNGKey(0))
    d2 = space.sample(jax.random.PRNGKey(1))
    d3 = space.sample(jax.random.PRNGKey(2))
    i1 = w.DesignInterpolator(d1, d2, jnp.float32(0.0), jnp.float32(1.0))
    i2 = w.DesignInterpolator(d2, d3, jnp.float32(1.0), jnp.float32(2.0))
    from waves_jl_tpu.designs import multi_design_interpolation

    mid = multi_design_interpolation([i1, i2], 1.5)
    expect = (np.asarray(d2.config.cylinders.r) + np.asarray(d3.config.cylinders.r)) / 2
    np.testing.assert_allclose(np.asarray(mid.config.cylinders.r), expect, rtol=1e-5)


def test_flux():
    dim = w.two_dim(5.0, 64)
    lap = laplacian_matrix(dim.x)
    mask = w.circle_mask(dim, 2.0)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
    f = flux(u, lap, mask)
    assert np.isfinite(float(f))
    # golden: sum over mask of (L u + (L u^T)^T)
    L = np.asarray(lap)
    un = np.asarray(u)
    expect = ((L @ un) + (L @ un.T).T)[np.asarray(mask)].sum()
    np.testing.assert_allclose(float(f), expect, rtol=1e-4)


def test_wave_encoder_pml_field_nonnegative():
    from waves_jl_tpu.models import WaveEncoder

    enc = WaveEncoder(h_size=8, nfreq=8, elements=32, latent_grid_size=100.0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 4)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    assert out.shape == (2, 6, 32)
    # field 6 (learned pml) is squared -> nonnegative
    assert float(out[:, 5].min()) >= 0.0


def test_evaluate_over_time():
    B, K, E, T = 2, 3, 4, 7
    X = jnp.broadcast_to(jnp.linspace(0.0, 1.0, K), (B, K))
    Y = jnp.asarray(np.random.default_rng(0).normal(size=(B, K, E)).astype(np.float32))
    C = LinearInterpolation(X, Y)
    t = jnp.broadcast_to(jnp.linspace(0.0, 1.0, T), (B, T))
    out = evaluate_over_time(C, t)
    assert out.shape == (B, T, E)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(Y[:, 0]), rtol=1e-5)
