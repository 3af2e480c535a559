"""Auxiliary subsystem tests: metrics logging, timers, debug utilities,
persistent-cache helper, tree helpers."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waves_jl_tpu.utils.debug import assert_finite, debug_nans
from waves_jl_tpu.utils.logging import MetricsLogger, Timer, profile_trace
from waves_jl_tpu.utils.trees import (
    tree_add,
    tree_clamp,
    tree_concat,
    tree_index,
    tree_lerp,
    tree_stack,
)


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = MetricsLogger(path)
    log.log(step=1, loss=0.5)
    log.log(step=2, loss=0.25)
    log.close()
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2
    assert lines[1]["loss"] == 0.25
    assert "time" in lines[0]
    assert len(log.history) == 2


def test_timer():
    t = Timer()
    with t("phase"):
        pass
    with t("phase"):
        pass
    assert t.counts["phase"] == 2
    assert t.mean("phase") >= 0
    assert "phase" in t.summary()


def test_debug_utils():
    x = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    assert_finite(x)  # no raise
    bad = {"a": jnp.array([1.0, jnp.nan])}
    with pytest.raises(FloatingPointError):
        assert_finite(bad, "bad")
    with debug_nans(False):
        _ = jnp.log(jnp.array(-1.0))  # nan allowed
    assert jax.config.jax_debug_nans is False


def test_profile_trace_noop():
    with profile_trace(None):
        pass


def test_cache_helper(tmp_path):
    from waves_jl_tpu.utils.cache import enable_persistent_cache

    assert enable_persistent_cache(str(tmp_path / "cache"))
    assert os.path.isdir(str(tmp_path / "cache"))


def test_tree_helpers():
    a = {"x": jnp.array([1.0, 2.0])}
    b = {"x": jnp.array([3.0, 4.0])}
    np.testing.assert_allclose(np.asarray(tree_add(a, b)["x"]), [4.0, 6.0])
    np.testing.assert_allclose(
        np.asarray(tree_lerp(a, b, 0.5)["x"]), [2.0, 3.0]
    )
    np.testing.assert_allclose(
        np.asarray(tree_clamp(b, a, {"x": jnp.array([3.5, 3.5])})["x"]), [3.0, 3.5]
    )
    s = tree_stack([a, b])
    assert s["x"].shape == (2, 2)
    c = tree_concat([a, b])
    assert c["x"].shape == (4,)
    np.testing.assert_allclose(np.asarray(tree_index(s, 1)["x"]), [3.0, 4.0])
