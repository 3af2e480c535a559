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


def test_avg_checkpoints(tmp_path):
    """scripts_tpu/avg_checkpoints.py: running mean over the checkpoint
    tail equals the arithmetic mean, dtype/meta round-trip intact."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts_tpu"))
    import avg_checkpoints as ac

    run = tmp_path / "run"
    vals = {18: 1.0, 36: 2.0, 54: 7.0}
    for step, v in vals.items():
        d = run / f"checkpoint_step={step}"
        d.mkdir(parents=True)
        np.savez(d / "params.npz",
                 w=np.full((3, 2), v, np.float32),
                 b=np.array([v], np.float32))
        (d / "meta.json").write_text(json.dumps({"step": step}))

    assert ac.checkpoint_steps(str(run)) == [18, 36, 54]
    out = tmp_path / "avg"
    ac.save_average(str(run), [36, 54], str(out))
    z = np.load(out / "params.npz")
    assert z["w"].dtype == np.float32
    np.testing.assert_allclose(z["w"], 4.5)
    np.testing.assert_allclose(z["b"], [4.5])
    meta = json.loads((out / "meta.json").read_text())
    assert meta["step"] == 54 and meta["averaged_steps"] == [36, 54]
