"""Persistent compilation cache setup.

The axon platform compiles remotely (PALLAS_AXON_REMOTE_COMPILE=1), so every
process pays tunnel round-trips per jit compile. The persistent cache makes
repeat CLI invocations reuse compiled executables from disk.
"""
from __future__ import annotations

import os


def enable_persistent_cache(path: str = "/root/.cache/jax_comp_cache") -> bool:
    """Best-effort enable; returns True if configured."""
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:
        return False
