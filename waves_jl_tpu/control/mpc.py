"""Model-predictive control through the learned surrogate.

TPU-native re-design of reference `scripts/mpc.jl`:
  * `RandomShooting` — sample `shots` action sequences, batch-evaluate the
    surrogate's scattered energy on device (one vmapped forward, no
    chunking needed), add an L2 action penalty, take the argmin's first
    action (`scripts/mpc.jl:19-53`).
  * `GradientShooting` — the upgrade the reference's differentiable rollout
    never cashed in: descend on the action sequence itself through
    `jax.grad` of the surrogate, projecting onto the action box.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ..designs import DesignSpace
from ..env import WaveEnv, EnvState, env_observe, env_time
from ..physics.dynamics import build_tspan
from ..utils.trees import tree_clamp


def build_action_sequence(action_space: DesignSpace, key: jax.Array, horizon: int, shots: int):
    """(shots, horizon) action pytree (reference `scripts/mpc.jl:11-17`)."""
    keys = jax.random.split(key, horizon * shots).reshape(shots, horizon, 2)
    return jax.vmap(jax.vmap(action_space.sample))(keys)


def compute_action_cost(actions) -> jax.Array:
    """Sum over horizon of the L2 norms of action vectors
    (reference `compute_action_cost`, `scripts/mpc.jl:27-30`).
    actions: (S, H) action pytree -> (S,)."""
    vecs = jax.vmap(jax.vmap(lambda a: a.to_vec()))(actions)  # (S, H, A)
    return jnp.sum(jnp.sqrt(jnp.sum(vecs**2, axis=-1)), axis=-1)


def _mpc_batch(env: WaveEnv, state: EnvState, actions, horizon: int, shots: int):
    """Broadcast the current observation into an S-shot surrogate batch."""
    obs = env_observe(env, state)
    s_wave = jnp.broadcast_to(obs.wave[None], (shots, *obs.wave.shape))
    s_design = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (shots, *x.shape)), state.design
    )
    t = env_time(env, state) + build_tspan(
        0.0, env.dt, env.integration_steps * horizon
    )
    t = jnp.broadcast_to(t[None], (shots, t.shape[0]))
    return {"s_wave": s_wave, "s_design": s_design, "a": actions, "t": t}


@dataclass(frozen=True)
class RandomShooting:
    """(reference `RandomShooting`, `scripts/mpc.jl:19-25`)."""

    model: Any  # surrogate with __call__(params, batch) -> (B, L, 3)
    horizon: int = 5
    shots: int = 256
    alpha: float = 1.0

    def __call__(self, params, env: WaveEnv, state: EnvState, key: jax.Array):
        actions = build_action_sequence(env.action_space, key, self.horizon, self.shots)
        if hasattr(self.model, "predict_shots"):
            # single-observation fast path: encode the wave once instead of
            # S redundant copies
            obs = env_observe(env, state)
            t = env_time(env, state) + build_tspan(
                0.0, env.dt, env.integration_steps * self.horizon
            )
            t = jnp.broadcast_to(t[None], (self.shots, t.shape[0]))
            y_hat = self.model.predict_shots(
                params, obs.wave, state.design, actions, t
            )
        else:
            batch = _mpc_batch(env, state, actions, self.horizon, self.shots)
            y_hat = self.model(params, batch)  # (S, L, 3)
        energy = jnp.sum(y_hat[:, :, 2], axis=1)  # scattered energy cost
        penalty = compute_action_cost(actions)
        cost = energy + self.alpha * penalty
        idx = jnp.argmin(cost)
        first = jax.tree_util.tree_map(lambda x: x[idx, 0], actions)
        return first, {"cost": cost, "idx": idx}


def make_mpc_episode_fused(env: WaveEnv, mpc: "RandomShooting",
                           tile_interior: int = 48, interpret: bool = False):
    """Whole MPC episode in ONE device program (the BASELINE north-star
    quantity: full 20-action x 100-step episode through the surrogate
    controller): `lax.scan` over actions, each iteration running observe ->
    `shots`-sequence surrogate evaluation -> argmin -> the fused Pallas env
    window. Eliminates the 2(+) tunnel dispatches per action (~30 ms each)
    of the step-at-a-time loop (reference loop shape `scripts/mpc.jl:129-143`).

    The surrogate is reached through `mpc.model` (no separate model
    argument — a second reference invited silently evaluating the wrong
    instance). Returns run(params, state, key) -> (final_state,
    signals (A, T+1, 3), chosen_costs (A,)).
    """
    from ..physics.fused import make_env_step_fused

    step = make_env_step_fused(env, tile_interior, interpret, jit=False)

    @jax.jit
    def run(params, state: EnvState, key: jax.Array):
        def body(carry, k):
            st = carry
            a, info = mpc(params, env, st, k)
            st2, _ = step(st, a)
            return st2, (st2.signal, info["cost"][info["idx"]])

        keys = jax.random.split(key, env.actions)
        final, (signals, costs) = jax.lax.scan(body, state, keys)
        return final, signals, costs

    return run


@dataclass(frozen=True)
class OracleShooting:
    """Random shooting against the TRUE simulator instead of a surrogate —
    the upper bound on shooting-MPC performance and a correctness check on
    the control machinery (it must beat random control). Expensive:
    shots x horizon full-grid windows per action.

    step_fn: (state, action) -> (state', info) — e.g. the fused env step.
    """

    step_fn: Any
    horizon: int = 5
    shots: int = 16
    alpha: float = 1.0

    def __call__(self, env: WaveEnv, state: EnvState, key: jax.Array):
        actions = build_action_sequence(env.action_space, key, self.horizon, self.shots)
        penalty = compute_action_cost(actions)
        costs = []
        for s_idx in range(self.shots):
            st = state
            sc = 0.0
            for h in range(self.horizon):
                a = jax.tree_util.tree_map(lambda x: x[s_idx, h], actions)
                st, _ = self.step_fn(st, a)
                # signal[0] is the (action-independent) pre-step state and
                # equals the previous window's final row: count each step once
                sc = sc + jnp.sum(st.signal[1:, 2])
            costs.append(sc)
        cost = jnp.stack(costs) + self.alpha * penalty
        idx = int(jnp.argmin(cost))
        first = jax.tree_util.tree_map(lambda x: x[idx, 0], actions)
        return first, {"cost": cost, "idx": idx}


@dataclass(frozen=True)
class GradientShooting:
    """Gradient-based MPC: refine a population of action sequences by
    projected gradient descent through the differentiable surrogate."""

    model: Any
    horizon: int = 5
    shots: int = 32
    alpha: float = 1.0
    lr: float = 0.05
    steps: int = 10

    def __call__(self, params, env: WaveEnv, state: EnvState, key: jax.Array):
        actions = build_action_sequence(env.action_space, key, self.horizon, self.shots)
        low = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (self.shots, self.horizon, *x.shape)),
            env.action_space.low,
        )
        high = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (self.shots, self.horizon, *x.shape)),
            env.action_space.high,
        )

        def cost_fn(acts):
            batch = _mpc_batch(env, state, acts, self.horizon, self.shots)
            y_hat = self.model(params, batch)
            energy = jnp.sum(y_hat[:, :, 2], axis=1)
            penalty = compute_action_cost(acts)
            return jnp.sum(energy + self.alpha * penalty), energy + self.alpha * penalty

        def opt_step(acts, _):
            (_, cost), grads = jax.value_and_grad(cost_fn, has_aux=True)(acts)
            acts = jax.tree_util.tree_map(lambda a, g: a - self.lr * g, acts, grads)
            acts = tree_clamp(acts, low, high)
            return acts, cost

        actions, costs = jax.lax.scan(opt_step, actions, None, length=self.steps)
        _, final_cost = cost_fn(actions)
        idx = jnp.argmin(final_cost)
        first = jax.tree_util.tree_map(lambda x: x[idx, 0], actions)
        return first, {"cost": final_cost, "idx": idx, "cost_history": costs}
