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

# name -> (class, meta_fields); lets saved pytrees be reconstructed from a
# structure descriptor without a structural template (see encode_structure).
PYTREE_REGISTRY: dict = {}


def register_pytree_dataclass(cls=None, *, meta_fields: tuple = ()):
    """Register a frozen dataclass as a JAX pytree; `meta_fields` are static."""

    def wrap(c):
        data_fields = [f.name for f in dataclasses.fields(c) if f.name not in meta_fields]
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=list(meta_fields)
        )
        PYTREE_REGISTRY[c.__name__] = (c, tuple(meta_fields))
        return c

    return wrap(cls) if cls is not None else wrap


def encode_structure(obj) -> object:
    """JSON-able nesting descriptor of a pytree built from registered
    dataclasses, dicts, lists/tuples, and array leaves. Static (meta) fields
    are stored by value and must be JSON-serializable. Paired with
    `decode_structure`, this lets `load_episode` rebuild any registered
    design/action pytree from saved leaf arrays — the reference's BSON gets
    this for free via Julia type tags (`src/data.jl:60-71`)."""
    name = type(obj).__name__
    if dataclasses.is_dataclass(obj) and name in PYTREE_REGISTRY:
        _, meta = PYTREE_REGISTRY[name]
        return {
            "__dataclass__": name,
            "fields": {
                f.name: (
                    {"__static__": _encode_static(getattr(obj, f.name))}
                    if f.name in meta
                    else encode_structure(getattr(obj, f.name))
                )
                for f in dataclasses.fields(obj)
            },
        }
    if isinstance(obj, dict):
        return {"__dict__": {k: encode_structure(v) for k, v in obj.items()}}
    if isinstance(obj, (list, tuple)):
        return {
            "__seq__": [encode_structure(v) for v in obj],
            "tuple": isinstance(obj, tuple),
        }
    if obj is None:
        return {"__none__": True}
    return {"__leaf__": True}


def _encode_static(val):
    """JSON-encode a static (meta) field value, tagging tuples explicitly so
    decode does not have to guess list-vs-tuple (JSON collapses both to
    lists)."""
    if isinstance(val, tuple):
        return {"__tuple__": [_encode_static(v) for v in val]}
    if isinstance(val, list):
        return {"__list__": [_encode_static(v) for v in val]}
    return val


def _decode_static(val):
    if isinstance(val, dict) and "__tuple__" in val:
        return tuple(_decode_static(v) for v in val["__tuple__"])
    if isinstance(val, dict) and "__list__" in val:
        return [_decode_static(v) for v in val["__list__"]]
    if isinstance(val, list):
        # legacy (pre-tag) descriptor: tuples were stored as bare JSON
        # lists; registered meta fields of that era were tuple-typed
        return tuple(_decode_static(v) for v in val)
    return val


def decode_structure(desc, get_leaf, prefix: str = ""):
    """Rebuild a pytree from an `encode_structure` descriptor; `get_leaf` maps
    a keystr path (e.g. ``.s_design.config.cylinders.pos``) to an array. Path
    syntax matches `jax.tree_util.keystr` for dataclass/dict/sequence nodes."""
    if "__dataclass__" in desc:
        cls, _ = PYTREE_REGISTRY[desc["__dataclass__"]]
        kwargs = {}
        for fname, fdesc in desc["fields"].items():
            if isinstance(fdesc, dict) and "__static__" in fdesc:
                kwargs[fname] = _decode_static(fdesc["__static__"])
            else:
                kwargs[fname] = decode_structure(fdesc, get_leaf, f"{prefix}.{fname}")
        return cls(**kwargs)
    if "__dict__" in desc:
        return {
            k: decode_structure(v, get_leaf, f"{prefix}['{k}']")
            for k, v in desc["__dict__"].items()
        }
    if "__seq__" in desc:
        items = [
            decode_structure(v, get_leaf, f"{prefix}[{i}]")
            for i, v in enumerate(desc["__seq__"])
        ]
        return tuple(items) if desc["tuple"] else items
    if "__none__" in desc:
        return None
    return get_leaf(prefix)


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
