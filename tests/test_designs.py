"""Design system tests: algebra, clamping, sampling, rasterization,
interpolation, factories."""
import jax
import jax.numpy as jnp
import numpy as np

import waves_jl_tpu as w


def test_cylinder_algebra():
    c1 = w.Cylinders(
        pos=jnp.array([[0.0, 0.0], [1.0, 1.0]]),
        r=jnp.array([0.5, 0.7]),
        c=jnp.array([300.0, 400.0]),
    )
    c2 = c1 * 2.0
    np.testing.assert_allclose(np.asarray(c2.r), [1.0, 1.4])
    c3 = c1 + c2
    np.testing.assert_allclose(np.asarray(c3.r), [1.5, 2.1])
    c4 = c3 - c1
    np.testing.assert_allclose(np.asarray(c4.r), np.asarray(c2.r))
    z = c1.zero()
    assert float(jnp.abs(z.r).max()) == 0.0
    v = c1.to_vec()
    assert v.shape == (2 * 2 + 2 + 2,)


def test_design_space_clamp():
    space = w.build_triple_ring_design_space()
    d = space.sample(jax.random.PRNGKey(0))
    assert isinstance(d, w.Cloak)
    r = np.asarray(d.config.cylinders.r)
    assert (r >= 0.2).all() and (r <= 1.0).all()
    # core is fixed to its bounds
    np.testing.assert_allclose(np.asarray(d.core.r), [2.0])

    # big action gets clamped to the box
    a_space = w.build_action_space(d, 1.0)
    big = jax.tree_util.tree_map(lambda x: x * 0 + 100.0, a_space.high)
    d2 = space(d, big)
    r2 = np.asarray(d2.config.cylinders.r)
    np.testing.assert_allclose(r2, 1.0)
    # positions unchanged (adjustable radii only)
    np.testing.assert_allclose(
        np.asarray(d2.config.cylinders.pos), np.asarray(d.config.cylinders.pos), rtol=1e-6
    )


def test_action_space_sampling():
    space = w.build_triple_ring_design_space()
    d = space.sample(jax.random.PRNGKey(1))
    scale = 250.0 * 1e-5 * 100  # action_speed * dt * steps = 0.25
    a_space = w.build_action_space(d, scale)
    a = a_space.sample(jax.random.PRNGKey(2))
    r = np.asarray(a.config.cylinders.r)
    assert (np.abs(r) <= scale).all()
    assert np.abs(r).max() > 0
    # non-adjustable components sample to exactly zero
    assert float(jnp.abs(a.config.cylinders.pos).max()) == 0.0
    assert float(jnp.abs(a.core.r).max()) == 0.0


def test_speed_rasterization():
    dim = w.two_dim(15.0, 128)
    grid = w.build_grid(dim)
    cyls = w.Cylinders(
        pos=jnp.array([[0.0, 0.0]]), r=jnp.array([2.0]), c=jnp.array([3 * w.AIR])
    )
    c = w.speed(cyls, grid, w.WATER)
    assert c.shape == (128, 128)
    # center inside cylinder
    assert abs(float(c[64, 64]) - 3 * w.AIR) < 1e-3
    # corner is ambient
    assert abs(float(c[0, 0]) - w.WATER) < 1e-3

    # golden formula check
    d2 = np.sum((np.asarray(grid) - np.array([0.0, 0.0])) ** 2, axis=-1)
    mask = d2 < 4.0
    expect = np.where(mask, 3 * w.AIR, w.WATER)
    np.testing.assert_allclose(np.asarray(c), expect, rtol=1e-6)


def test_cloak_speed_includes_core():
    space = w.build_triple_ring_design_space()
    d = space.sample(jax.random.PRNGKey(3))
    dim = w.two_dim(15.0, 128)
    grid = w.build_grid(dim)
    c = w.speed(d, grid, w.WATER)
    # core at (5, 0) r=2: grid index for x=5 -> (5+15)/30*127 ~ 84
    assert abs(float(c[84, 64]) - 3 * w.AIR) < 1e-3


def test_design_interpolator():
    space = w.build_triple_ring_design_space()
    d1 = space.sample(jax.random.PRNGKey(4))
    a_space = w.build_action_space(d1, 0.25)
    a = a_space.sample(jax.random.PRNGKey(5))
    d2 = space(d1, a)
    interp = w.DesignInterpolator(d1, d2, jnp.float32(0.0), jnp.float32(1.0))
    mid = interp(jnp.float32(0.5))
    expect = (np.asarray(d1.config.cylinders.r) + np.asarray(d2.config.cylinders.r)) / 2
    np.testing.assert_allclose(np.asarray(mid.config.cylinders.r), expect, rtol=1e-5)
    # clamped outside the window
    before = interp(jnp.float32(-1.0))
    np.testing.assert_allclose(
        np.asarray(before.config.cylinders.r), np.asarray(d1.config.cylinders.r)
    )
    after = interp(jnp.float32(2.0))
    np.testing.assert_allclose(
        np.asarray(after.config.cylinders.r), np.asarray(d2.config.cylinders.r)
    )


def test_speed_field_jit_scan():
    """SpeedField (design lerp + rasterize) runs inside jit/scan."""
    space = w.build_triple_ring_design_space()
    d1 = space.sample(jax.random.PRNGKey(6))
    a = w.build_action_space(d1, 0.25).sample(jax.random.PRNGKey(7))
    d2 = space(d1, a)
    dim = w.two_dim(15.0, 64)
    grid = w.build_grid(dim)
    interp = w.DesignInterpolator(d1, d2, jnp.float32(0.0), jnp.float32(1e-3))
    C = w.SpeedField(interp=interp, grid=grid, c0=jnp.float32(w.WATER))

    @jax.jit
    def run(C):
        ts = jnp.linspace(0.0, 1e-3, 11)
        return jax.lax.scan(lambda _, t: (None, C(t).mean()), None, ts)[1]

    out = run(C)
    assert out.shape == (11,)
    assert np.isfinite(np.asarray(out)).all()


def test_normalize_design():
    space = w.build_triple_ring_design_space()
    d = space.sample(jax.random.PRNGKey(8))
    x = w.normalize_design(d, space)
    assert x.shape == (18,)
    assert (np.asarray(x) >= -1.0).all() and (np.asarray(x) <= 1.0).all()


def test_hexagon_and_factories():
    ring = w.hexagon_ring(3.5)
    assert ring.shape == (6, 2)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(ring, axis=1)), 3.5, rtol=1e-5)
    space = w.build_triple_ring_design_space()
    assert space.low.config.cylinders.pos.shape == (18, 2)
    rect = w.build_rectangular_grid_design_space()
    assert rect.low.cylinders.pos.shape == (25, 2)
    simple = w.build_simple_radii_design_space()
    assert simple.low.config.cylinders.pos.shape == (1, 2)


def test_vmap_designs():
    """Designs batch under vmap (required by the design encoder scan)."""
    space = w.build_triple_ring_design_space()
    keys = jax.random.split(jax.random.PRNGKey(9), 4)
    batch = jax.vmap(space.sample)(keys)
    assert batch.config.cylinders.r.shape == (4, 18)
    a_space = w.build_action_space(space.low, 0.25)
    actions = jax.vmap(a_space.sample)(keys)
    applied = jax.vmap(space)(batch, actions)
    assert applied.config.cylinders.r.shape == (4, 18)


def test_sources():
    dim = w.two_dim(15.0, 64)
    grid = w.build_grid(dim)
    src = w.GaussianSource.create(
        grid, jnp.array([[-10.0, -10.0]]), jnp.array([[-10.0, 10.0]]),
        jnp.array([0.3]), jnp.array([1.0]), 1000.0,
    )
    f = src(jnp.float32(2.5e-4))  # sin(2pi*1000*2.5e-4) = 1
    assert f.shape == (64, 64)
    assert float(jnp.abs(f).max()) > 0
    s2 = src.resample(jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(s2.shape), np.asarray(src.shape))
    # x position fixed at -10, y varies in [-10, 10]
    xs = np.asarray(grid)[np.unravel_index(np.asarray(s2.shape).argmax(), (64, 64))]
    assert abs(xs[0] + 10.0) < 0.5
