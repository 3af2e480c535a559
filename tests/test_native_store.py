"""Native C++ episode store: roundtrip parity with npz + speed sanity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import waves_jl_tpu as w
from waves_jl_tpu.data import generate_episode, load_episode, save_episode
from waves_jl_tpu.env import RandomDesignPolicy, make_wave_env
from waves_jl_tpu.native import load_bundle, save_bundle


def test_bundle_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        ".a": rng.normal(size=(3, 4, 5)).astype(np.float32),
        ".b.c": rng.normal(size=(7,)).astype(np.float32),
        ".d": np.float32(2.5).reshape(()),
    }
    p = str(tmp_path / "x.wbin")
    ok = save_bundle(p, tensors)
    if not ok:
        pytest.skip("no native toolchain")
    out = load_bundle(p)
    assert set(out) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(out[k], tensors[k])
        assert out[k].shape == tensors[k].shape


def test_episode_wbin_roundtrip(tmp_path):
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
    _, ep = generate_episode(env, RandomDesignPolicy(env.action_space), jax.random.PRNGKey(0))
    p = str(tmp_path / "ep.wbin")
    save_episode(ep, p)
    import os

    if not os.path.exists(p):
        pytest.skip("no native toolchain (fell back to npz)")
    ep2 = load_episode(p)
    np.testing.assert_array_equal(np.asarray(ep.s_wave), np.asarray(ep2.s_wave))
    np.testing.assert_array_equal(np.asarray(ep.y), np.asarray(ep2.y))
    np.testing.assert_array_equal(
        np.asarray(ep.a.config.cylinders.r), np.asarray(ep2.a.config.cylinders.r)
    )
    ep3 = load_episode(p, like=ep)
    np.testing.assert_array_equal(np.asarray(ep.y), np.asarray(ep3.y))


def test_episode_shard_roundtrip(tmp_path):
    """Streaming shard: N episodes in one file, exact round-trip."""
    from waves_jl_tpu.data import (
        generate_episode,
        load_episodes_shard,
        open_episodes_shard,
    )
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
    eps = [
        generate_episode(env, RandomDesignPolicy(env.action_space),
                         jax.random.PRNGKey(i))[1]
        for i in range(3)
    ]
    p = str(tmp_path / "data.wshard")
    try:
        shard = open_episodes_shard(p)
    except IOError:
        pytest.skip("no native toolchain")
    for ep in eps:
        shard.append(ep)
    shard.finish()

    back = load_episodes_shard(p)
    assert len(back) == 3
    for a, b in zip(eps, back):
        assert type(b.s_design) is type(a.s_design)
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
