"""NODEEnergyModel — neural-ODE baseline.

Parity with reference `src/model/node.jl`: the latent dynamics is a
black-box MLP over (z, C(t)) integrated by the same RK4/scan harness; the
readout is a single scalar energy trained against the scattered channel
only. The reference re-parameterizes the MLP through `Flux.destructure`
(`src/model/node.jl:3-13`); here the MLP params simply ride in theta.
"""
from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..designs import DesignSpace
from ..dims import OneDim, one_dim
from ..physics.dynamics import Integrator
from ..utils.trees import register_pytree_dataclass
from .design_encoder import DesignMLP, design_encoder_apply
from .layers import MLP, leaky_relu
from .wave_encoder import WaveEncoderScalarHead


@register_pytree_dataclass(meta_fields=("module",))
@dataclass(frozen=True)
class NODEDynamics:
    """rhs(z, t, theta=(C, mlp_params)) = MLP([z; C(t)])
    (reference `src/model/node.jl:10-13`). z: (B, 1, E)."""

    module: nn.Module

    def __call__(self, z, t, theta):
        C, mlp_params = theta
        c = C(t)  # (B, E)
        x = jnp.concatenate([z[:, 0], c], axis=-1)  # (B, 2E)
        return self.module.apply(mlp_params, x)[:, None, :]  # (B, 1, E)


@dataclass(frozen=True)
class NODEEnergyModel:
    wave_encoder: WaveEncoderScalarHead
    design_mlp: DesignMLP
    dynamics_mlp: nn.Module
    design_space: DesignSpace
    integrator: Integrator
    latent_dim: OneDim
    n_elements: int
    latent_grid_size: float
    integration_steps: int

    @classmethod
    def create(
        cls,
        design_space: DesignSpace,
        elements: int = 1024,
        latent_grid_size: float = 100.0,
        h_size: int = 256,
        nfreq: int = 500,
        dt: float = 1e-5,
        integration_steps: int = 100,
        checkpoint: str = "sqrt",
    ) -> "NODEEnergyModel":
        latent_dim = one_dim(latent_grid_size, elements)
        dynamics_mlp = MLP([elements, elements, elements, elements], leaky_relu)
        integrator = Integrator(
            dynamics=NODEDynamics(module=dynamics_mlp), dt=dt, checkpoint=checkpoint
        )
        return cls(
            wave_encoder=WaveEncoderScalarHead(h_size=h_size, out=elements),
            design_mlp=DesignMLP(
                h_size=h_size, nfreq=nfreq, elements=elements,
                latent_grid_size=latent_grid_size,
            ),
            dynamics_mlp=dynamics_mlp,
            design_space=design_space,
            integrator=integrator,
            latent_dim=latent_dim,
            n_elements=int(elements),
            latent_grid_size=float(latent_grid_size),
            integration_steps=int(integration_steps),
        )

    @property
    def dx(self) -> float:
        return 2.0 * self.latent_grid_size / (self.n_elements - 1)

    def init(self, key: jax.Array, sample_batch) -> dict:
        from .design_encoder import unroll_design_sequence

        k1, k2, k3 = jax.random.split(key, 3)
        we = self.wave_encoder.init(k1, sample_batch["s_wave"])
        vecs = unroll_design_sequence(
            self.design_space, sample_batch["s_design"], sample_batch["a"]
        )
        de = self.design_mlp.init(k2, vecs)
        E = self.n_elements
        dyn = self.dynamics_mlp.init(k3, jnp.zeros((1, 2 * E), jnp.float32))
        return {"wave_encoder": we, "design_encoder": de, "dynamics": dyn}

    def generate_latent_solution(self, params, batch) -> jax.Array:
        z0 = self.wave_encoder.apply(params["wave_encoder"], batch["s_wave"])[:, None]
        C = design_encoder_apply(
            self.design_mlp, params["design_encoder"], self.design_space,
            batch["s_design"], batch["a"], batch["t"], self.integration_steps,
        )
        theta = (C, params["dynamics"])
        return self.integrator(z0, batch["t"], theta)  # (L, B, 1, E)

    def __call__(self, params, batch) -> jax.Array:
        """(B, L) scalar energy (reference `src/model/node.jl:59-62`)."""
        z = self.generate_latent_solution(params, batch)
        e = jnp.sum(z[:, :, 0] ** 2, axis=-1) * self.dx  # (L, B)
        return jnp.moveaxis(e, 0, 1)


def node_loss(model: NODEEnergyModel, params, batch) -> jax.Array:
    """MSE vs scattered energy only (reference `src/model/node.jl:64-69`)."""
    return jnp.mean((model(params, batch) - batch["y"][:, :, 2]) ** 2)
