"""Checkpointing: (params, opt_state, step) to disk and back.

Strictly better than the reference's BSON-of-the-whole-model snapshots
(`scripts/main.jl:94-98`), which drop optimizer state: we save params AND
opt state, resumable. Storage is npz of named pytree leaves (no pickle), so
checkpoints are portable across refactors as long as leaf paths survive.
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def _named_leaves(tree) -> dict:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat}


def save_checkpoint(path: str, params, opt_state=None, step: int = 0, extra: dict | None = None):
    os.makedirs(path, exist_ok=True)
    np.savez(os.path.join(path, "params.npz"), **_named_leaves(params))
    if opt_state is not None:
        np.savez(os.path.join(path, "opt_state.npz"), **_named_leaves(opt_state))
    meta = {"step": int(step)}
    if extra:
        meta.update(extra)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def _restore_like(npz, like):
    leaves, treedef = jax.tree_util.tree_flatten(like)
    flat = jax.tree_util.tree_flatten_with_path(like)[0]
    keys = [jax.tree_util.keystr(p) for p, _ in flat]
    new = []
    for k, leaf in zip(keys, leaves):
        arr = npz[k]
        new.append(jnp.asarray(arr) if isinstance(leaf, (jnp.ndarray, jax.Array)) or hasattr(leaf, "dtype") else arr)
    return jax.tree_util.tree_unflatten(treedef, new)


def load_checkpoint(path: str, params_like, opt_state_like=None):
    """Returns (params, opt_state | None, step)."""
    params = _restore_like(np.load(os.path.join(path, "params.npz")), params_like)
    opt_state = None
    opt_path = os.path.join(path, "opt_state.npz")
    if opt_state_like is not None and os.path.exists(opt_path):
        opt_state = _restore_like(np.load(opt_path), opt_state_like)
    with open(os.path.join(path, "meta.json")) as f:
        step = json.load(f)["step"]
    return params, opt_state, step


# ---------------------------------------------------------------------------
# Orbax backend (opt-in): async saves + sharded-array support for multi-host
# meshes. The npz backend above stays the default — it is dependency-free,
# diff-able, and sufficient for single-host training.
# ---------------------------------------------------------------------------


def save_checkpoint_orbax(path: str, params, opt_state=None, step: int = 0):
    """Save via orbax StandardCheckpointer (handles jax.Array sharding)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree = {"params": params, "step": np.full((), step, np.int64)}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str, params_like, opt_state_like=None):
    """Returns (params, opt_state | None, step) from an orbax checkpoint."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = {"params": params_like, "step": np.zeros((), np.int64)}
    if opt_state_like is not None:
        target["opt_state"] = opt_state_like
    tree = ckptr.restore(os.path.abspath(path), target)
    return tree["params"], tree.get("opt_state"), int(tree["step"])
