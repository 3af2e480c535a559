"""Pytree helpers: registration and elementwise algebra over dataclasses.

The reference implements a vector-space algebra over design structs via Julia
operator overloads (`src/designs.jl:47-64`). Here any frozen dataclass
registered through `register_pytree_dataclass` gets the same algebra via
`jax.tree_util.tree_map`.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def register_pytree_dataclass(cls=None, *, meta_fields: tuple = ()):
    """Register a frozen dataclass as a JAX pytree; `meta_fields` are static."""

    def wrap(c):
        data_fields = [f.name for f in dataclasses.fields(c) if f.name not in meta_fields]
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=list(meta_fields)
        )
        return c

    return wrap(cls) if cls is not None else wrap


def tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def tree_sub(a, b):
    return jax.tree_util.tree_map(jnp.subtract, a, b)


def tree_scale(a, s):
    return jax.tree_util.tree_map(lambda x: x * s, a)


def tree_mul(a, b):
    return jax.tree_util.tree_map(jnp.multiply, a, b)


def tree_clamp(x, low, high):
    return jax.tree_util.tree_map(jnp.clip, x, low, high)


def tree_zeros_like(a):
    return jax.tree_util.tree_map(jnp.zeros_like, a)


def tree_lerp(a, b, w):
    """a + w * (b - a) elementwise over matching pytrees; w scalar."""
    return jax.tree_util.tree_map(lambda x, y: x + w * (y - x), a, b)


def tree_stack(trees, axis=0):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=axis), *trees)


def tree_concat(trees, axis=0):
    return jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, axis=axis), *trees)


def tree_index(tree, idx):
    """Index the leading axis of every leaf."""
    return jax.tree_util.tree_map(lambda x: x[idx], tree)
