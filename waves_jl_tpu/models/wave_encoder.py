"""Wave encoder: observation images -> 6 latent 1D fields.

Parity with reference `src/model/wave_encoder.jl`: CNN base (3 residual
blocks -> global max pool) followed by 6 parallel 3-layer MLP heads, each
emitting nfreq coefficients mapped through the fixed sine basis onto the
latent grid. Field 6 (pml) is squared to stay nonnegative
(`src/model/wave_encoder.jl:24-46`).
"""
from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

from .layers import CNNBase, MLP, embed_sin, leaky_relu, sin_basis

N_LATENT_FIELDS = 6  # u_tot, v_tot, u_inc, v_inc, f, pml


class WaveEncoder(nn.Module):
    h_size: int
    nfreq: int
    elements: int
    latent_grid_size: float
    activation: Callable = leaky_relu
    conv_dtype: Any = None  # e.g. jnp.bfloat16 for MXU-speed convs

    @nn.compact
    def __call__(self, x):
        """x: (B, res, res, C) -> (B, 6, E)."""
        h = CNNBase(self.h_size, self.activation, dtype=self.conv_dtype)(x)
        coefs = []
        for _ in range(N_LATENT_FIELDS):
            head = MLP([self.h_size, self.h_size, self.nfreq], self.activation)
            coefs.append(head(h))
        coefs = jnp.stack(coefs, axis=1)  # (B, 6, nfreq)
        basis = sin_basis(self.elements, self.latent_grid_size, self.nfreq)
        fields = embed_sin(basis, coefs)  # (B, 6, E)
        # pml field squared (reference src/model/wave_encoder.jl:42-44)
        return fields.at[:, 5].set(fields[:, 5] ** 2)


class WaveEncoderScalarHead(nn.Module):
    """CNN base + single Dense head to `out` features — the NODE baseline's
    encoder (reference `src/model/node.jl:31-33`)."""

    h_size: int
    out: int
    activation: Callable = leaky_relu

    @nn.compact
    def __call__(self, x):
        h = CNNBase(self.h_size, self.activation)(x)
        return nn.Dense(self.out)(h)
