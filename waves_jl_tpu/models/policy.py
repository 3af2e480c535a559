"""Amortized one-shot control policy (behavior cloning of a search-based
MPC controller).

No reference counterpart: the reference selects every action by a 256-shot
random-shooting search through the surrogate (`scripts/mpc.jl:43-53`).
Here the deployed search controller (CEM + gradient polish on the
distilled surrogate — the repo's control record) is distilled into a
direct policy pi(observation, design) -> action, so decision time drops to
ONE conv forward: no candidate rollouts at all. Trained by behavior
cloning on the controller's own episode traces
(`control.make_mpc_episode_recorded` with epsilon=0, via
`scripts_tpu/datagen_onpolicy.py --controller cem --polish ...`).

Action parameterization: the net emits a tanh-bounded vector in [-1, 1]^D
mapped affinely onto the action box (`env.action_space.low/high.to_vec()`)
and rebuilt into the action pytree with `designs.design_with_vec`; the
box clamp is therefore built into the policy output.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..designs import DesignSpace, design_with_vec, normalize_design
from ..utils.trees import tree_zeros_like
from .layers import CNNBase, MLP, leaky_relu


class PolicyNet(nn.Module):
    """CNN over the observation image + design-vector conditioning -> one
    tanh-bounded action vector."""

    h_size: int
    act_dim: int
    activation: Callable = leaky_relu

    @nn.compact
    def __call__(self, obs, design_vec):
        """obs (B, res, res, C), design_vec (B, D) -> (B, act_dim) in
        [-1, 1]."""
        h = CNNBase(self.h_size, self.activation)(obs)
        h = jnp.concatenate([h, design_vec], axis=-1)
        u = MLP([self.h_size, self.h_size, self.act_dim], self.activation)(h)
        return jnp.tanh(u)


@dataclass(frozen=True)
class AmortizedPolicy:
    """Static config wrapper; params live in an explicit pytree."""

    net: PolicyNet
    design_space: DesignSpace  # DESIGN box (for observation normalization)
    action_space: DesignSpace  # ACTION box (for output scaling)

    @classmethod
    def create(cls, design_space: DesignSpace, action_space: DesignSpace,
               h_size: int = 256) -> "AmortizedPolicy":
        act_dim = int(action_space.low.to_vec().shape[0])
        return cls(
            net=PolicyNet(h_size=h_size, act_dim=act_dim),
            design_space=design_space,
            action_space=action_space,
        )

    def init(self, key: jax.Array, obs, design) -> dict:
        vec = normalize_design(design, self.design_space)[None]
        return self.net.init(key, obs[None], vec)

    # -- action-vector <-> pytree mapping -----------------------------------

    def normalize_action(self, action) -> jax.Array:
        """Action pytree -> [-1, 1]^D (the BC regression target)."""
        lo = self.action_space.low.to_vec()
        hi = self.action_space.high.to_vec()
        return 2.0 * (action.to_vec() - lo) / (hi - lo + 1e-8) - 1.0

    def action_from_unit(self, u: jax.Array):
        """[-1, 1]^D vector -> action pytree inside the box."""
        lo = self.action_space.low.to_vec()
        hi = self.action_space.high.to_vec()
        vec = lo + (u * 0.5 + 0.5) * (hi - lo)
        return design_with_vec(tree_zeros_like(self.action_space.low), vec)

    # -- forward -------------------------------------------------------------

    def unit_batch(self, params, obs, designs) -> jax.Array:
        """(B, res, res, C) obs + (B,) design pytree -> (B, D) in [-1,1]."""
        vecs = jax.vmap(lambda d: normalize_design(d, self.design_space))(designs)
        return self.net.apply(params, obs, vecs)

    def action(self, params, obs, design):
        """ONE observation -> action pytree (the controller fast path)."""
        vec = normalize_design(design, self.design_space)[None]
        u = self.net.apply(params, obs[None], vec)[0]
        return self.action_from_unit(u)


def bc_loss(policy: AmortizedPolicy, params, batch) -> jax.Array:
    """Behavior-cloning MSE in normalized action units.

    batch keys match the Episode fields so the generic train loop and
    dataloader apply unchanged: {"s_wave": (B, res, res, C) observations,
    "s_design": (B,) design pytree, "a": (B,) action pytree}.
    """
    pred = policy.unit_batch(params, batch["s_wave"], batch["s_design"])
    target = jax.vmap(policy.normalize_action)(batch["a"])
    return jnp.mean((pred - target) ** 2)
