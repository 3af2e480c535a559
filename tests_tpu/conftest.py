"""Real-TPU test tier: runs on the axon TPU (no platform override).

Usage: make test-tpu   (or python -m pytest tests_tpu -q)

These tests catch Mosaic/kernel regressions that interpret-mode CPU tests
cannot (tests/ forces a virtual CPU mesh). They serialize on the single
chip and use the persistent compile cache; first run compiles ~1-2 min.
"""
import pytest


@pytest.fixture(scope="session", autouse=True)
def require_tpu():
    import jax

    from waves_jl_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    if jax.default_backend() != "tpu":
        pytest.skip("requires a real TPU backend", allow_module_level=True)
