"""Neural building blocks (flax.linen).

Parity with reference `src/model/layers.jl`:
  * `sin_basis` / `SinWaveEmbedder` — fixed sine basis mapping nfreq
    coefficients to 1D spatial fields (`src/model/layers.jl:29-56`).
  * `localization_coords` — CoordConv channels (`src/model/layers.jl:6-23`).
  * `ResidualBlock` — Conv-act-Conv + 1x1 skip, act, MaxPool(2)
    (`src/model/layers.jl:70-93`).
  * `MLP` — stacked Dense.

Images are channels-last (B, H, W, C) — the idiomatic XLA/TPU conv layout.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def leaky_relu(x):
    """Flux.leakyrelu default slope 0.01 (matches flax default)."""
    return nn.leaky_relu(x, negative_slope=0.01)


def sin_basis(elements: int, grid_size: float, nfreq: int) -> jax.Array:
    """(E, nfreq) basis Phi[e, n] = sin(pi (n+1) (x_e - C) / L) on the
    symmetric latent grid [-grid_size, grid_size]
    (reference `SinWaveEmbedder` ctor, `src/model/layers.jl:36-46`)."""
    x = jnp.linspace(-grid_size, grid_size, elements, dtype=jnp.float32)
    L = x[-1] - x[0]
    C = L / 2.0  # reference uses C = L/2 (== x_max for the symmetric grid)
    n = jnp.arange(1, nfreq + 1, dtype=jnp.float32)
    phase = jnp.pi * n[None, :] * (x[:, None] - C) / L
    return jnp.sin(phase)


def embed_sin(basis: jax.Array, coefs: jax.Array) -> jax.Array:
    """coefs (..., nfreq) -> fields (..., E); normalized by sqrt(nfreq)
    (reference `src/model/layers.jl:48-56`)."""
    nfreq = basis.shape[1]
    return jnp.einsum(
        "en,...n->...e", basis, coefs / jnp.sqrt(jnp.float32(nfreq)),
        preferred_element_type=jnp.float32,
    )


def localization_coords(resolution: tuple) -> jax.Array:
    """(H, W, 2) normalized coordinate channels (reference
    `LocalizationLayer`, `src/model/layers.jl:6-23`: grid / max(x),
    resized to `resolution`)."""
    h, w = resolution
    gx = jnp.broadcast_to(jnp.linspace(-1.0, 1.0, h, dtype=jnp.float32)[:, None], (h, w))
    gy = jnp.broadcast_to(jnp.linspace(-1.0, 1.0, w, dtype=jnp.float32)[None, :], (h, w))
    return jnp.stack([gx, gy], axis=-1)


class ResidualBlock(nn.Module):
    features: int
    kernel: tuple = (3, 3)
    activation: Callable = leaky_relu
    dtype: Any = None  # compute dtype; params stay float32

    @nn.compact
    def __call__(self, x):
        main = nn.Conv(self.features, self.kernel, padding="SAME", dtype=self.dtype)(x)
        main = self.activation(main)
        main = nn.Conv(self.features, self.kernel, padding="SAME", dtype=self.dtype)(main)
        skip = nn.Conv(self.features, (1, 1), padding="SAME", dtype=self.dtype)(x)
        out = self.activation(main + skip)
        return nn.max_pool(out, (2, 2), strides=(2, 2))


class MLP(nn.Module):
    features: Sequence[int]
    activation: Callable = leaky_relu
    activate_final: bool = False

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f)(x)
            if i < len(self.features) - 1 or self.activate_final:
                x = self.activation(x)
        return x


class CNNBase(nn.Module):
    """TotalWaveInput(+1e-5) -> coords concat -> 3 ResidualBlocks ->
    global max pool (reference `build_cnn_base`,
    `src/model/wave_encoder.jl:6-15`).

    `dtype=jnp.bfloat16` runs the convs in bf16 on the MXU (params stay
    float32; output cast back) — an opt-in speed mode for training/MPC
    batches where encoder precision is not the bottleneck."""

    h_size: int
    activation: Callable = leaky_relu
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # TotalWaveInput: + 1e-5 (reference src/model/layers.jl:66-68)
        x = x + 1e-5
        b, h, w, _ = x.shape
        coords = jnp.broadcast_to(localization_coords((h, w))[None], (b, h, w, 2))
        x = jnp.concatenate([x, coords], axis=-1)
        x = ResidualBlock(32, activation=self.activation, dtype=self.dtype)(x)
        x = ResidualBlock(64, activation=self.activation, dtype=self.dtype)(x)
        x = ResidualBlock(self.h_size, activation=self.activation, dtype=self.dtype)(x)
        x = jnp.max(x, axis=(1, 2))  # global max pool -> (B, h_size)
        return x.astype(jnp.float32)
