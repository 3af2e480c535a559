"""Design encoder: action sequences -> time-interpolated latent wavespeed.

Parity with reference `src/model/design_encoder.jl`: the design sequence is
unrolled through the DesignSpace clamp (a scan — the reference uses
Flux.Recur), each design normalized to [-1, 1], mapped by a 5-layer MLP to
nfreq coefficients, embedded on the latent grid, squashed to (0, 2) by
2*sigmoid, and wrapped in a differentiable LinearInterpolation over the
action-boundary time knots.

The clamp unroll has no parameters, so it lives outside the flax module as
a pure function (`unroll_design_sequence`).
"""
from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..designs import DesignSpace, normalize_design
from ..utils.interp import LinearInterpolation
from .layers import MLP, embed_sin, leaky_relu, sin_basis


def unroll_design_sequence(space: DesignSpace, d0, actions) -> jax.Array:
    """Unroll d_{i+1} = clamp(d_i + a_i) and normalize each design to a
    vector (reference `src/model/design_encoder.jl:20-27`).

    d0: design pytree (B, ...); actions: action pytree (B, H, ...).
    Returns (B, H+1, A) normalized design vectors.
    """
    a_seq = jax.tree_util.tree_map(lambda x: jnp.moveaxis(x, 0, 1), actions)  # (H, B, ...)

    def body(d, a):
        d2 = jax.vmap(space)(d, a)
        return d2, d2

    _, ds = jax.lax.scan(body, d0, a_seq)  # (H, B, ...)
    seq = jax.tree_util.tree_map(
        lambda first, rest: jnp.concatenate([first[None], rest], axis=0), d0, ds
    )  # (H+1, B, ...)

    norm = jax.vmap(jax.vmap(lambda d: normalize_design(d, space)))
    # map over (H+1, B) leading axes
    vecs = norm(seq)  # (H+1, B, A)
    return jnp.moveaxis(vecs, 0, 1)  # (B, H+1, A)


class DesignMLP(nn.Module):
    """The parametric part: normalized design vectors -> latent speed fields
    (reference MLP, `src/model/design_encoder.jl:36-46`)."""

    h_size: int
    nfreq: int
    elements: int
    latent_grid_size: float
    activation: Callable = leaky_relu

    @nn.compact
    def __call__(self, x):
        """x: (B, K, A) -> (B, K, E) in (0, 2)."""
        h = MLP(
            [self.h_size, self.h_size, self.h_size, self.h_size, self.nfreq],
            self.activation,
        )(x)
        basis = sin_basis(self.elements, self.latent_grid_size, self.nfreq)
        y = embed_sin(basis, h)
        return 2.0 * nn.sigmoid(y)


def design_encoder_apply(
    mlp: DesignMLP, params, space: DesignSpace, d0, actions, t: jax.Array,
    integration_steps: int,
) -> LinearInterpolation:
    """Full design-encoder forward (reference
    `src/model/design_encoder.jl:20-34`): returns the LinearInterpolation
    C(t) over action-boundary knots t[:, ::integration_steps]."""
    t_knots = t[:, ::integration_steps]  # (B, H+1)
    vecs = unroll_design_sequence(space, d0, actions)  # (B, H+1, A)
    y = mlp.apply(params, vecs)  # (B, H+1, E)
    return LinearInterpolation(X=t_knots, Y=y)
