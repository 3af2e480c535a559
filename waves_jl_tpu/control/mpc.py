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


def selection_tspan(model, env: WaveEnv, state: EnvState, horizon: int,
                    shots: int) -> jax.Array:
    """(shots, L) surrogate evaluation time grid for one selection.

    Uses the MODEL's latent dt / steps-per-action when it defines them
    (coarse-latent-dt surrogates take stride-times-fewer sequential steps
    per action window — the <1 s MPC lever), falling back to the env's
    grid. Either way the window spans the same physical horizon:
    steps * dt == env.integration_steps * env.dt per action.
    """
    if hasattr(model, "integrator") and hasattr(model, "integration_steps"):
        dt, steps = model.integrator.dt, model.integration_steps
    else:
        dt, steps = env.dt, env.integration_steps
    t = env_time(env, state) + build_tspan(0.0, dt, steps * horizon)
    return jnp.broadcast_to(t[None], (shots, t.shape[0]))


def _mpc_batch(env: WaveEnv, state: EnvState, actions, horizon: int, shots: int,
               model=None):
    """Broadcast the current observation into an S-shot surrogate batch."""
    obs = env_observe(env, state)
    s_wave = jnp.broadcast_to(obs.wave[None], (shots, *obs.wave.shape))
    s_design = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (shots, *x.shape)), state.design
    )
    t = selection_tspan(model, env, state, horizon, shots)
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
        if hasattr(self.model, "predict_shot_energy"):
            # single-observation fast path: encode the wave once, accumulate
            # the cumulative scattered energy in the rollout carry (no
            # (L, S, 4, E) trajectory materialization)
            obs = env_observe(env, state)
            t = selection_tspan(self.model, env, state, self.horizon, self.shots)
            energy = self.model.predict_shot_energy(
                params, obs.wave, state.design, actions, t
            )
        elif hasattr(self.model, "predict_shots"):
            obs = env_observe(env, state)
            t = selection_tspan(self.model, env, state, self.horizon, self.shots)
            y_hat = self.model.predict_shots(
                params, obs.wave, state.design, actions, t
            )
            energy = jnp.sum(y_hat[:, :, 2], axis=1)
        else:
            batch = _mpc_batch(env, state, actions, self.horizon, self.shots)
            y_hat = self.model(params, batch)  # (S, L, 3)
            energy = jnp.sum(y_hat[:, :, 2], axis=1)  # scattered energy cost
        penalty = compute_action_cost(actions)
        cost = energy + self.alpha * penalty
        idx = jnp.argmin(cost)
        first = jax.tree_util.tree_map(lambda x: x[idx, 0], actions)
        return first, {"cost": cost, "idx": idx}


@dataclass(frozen=True)
class EnsembleShooting:
    """Random shooting ranked by a surrogate ENSEMBLE: the cost of a
    candidate sequence is the ensemble-mean predicted scattered energy plus
    `beta` times the ensemble disagreement (stddev across members) — a
    pessimism-under-uncertainty term that steers the search away from
    regions where the surrogates extrapolate differently (and are therefore
    individually unreliable rankers). Members are independently trained
    checkpoints (different objectives / fine-tunes), passed as a tuple of
    param trees; the beyond-reference lever of VERDICT round-2 item 2
    (reference baseline: single-model shooting, `scripts/mpc.jl:19-53`).
    """

    models: Any  # tuple of surrogates, one per member (usually same arch)
    horizon: int = 5
    shots: int = 256
    alpha: float = 1.0
    beta: float = 1.0

    def __call__(self, params_tuple, env: WaveEnv, state: EnvState, key: jax.Array):
        actions = build_action_sequence(env.action_space, key, self.horizon, self.shots)
        obs = env_observe(env, state)
        energies = []
        for model, params in zip(self.models, params_tuple):
            t = selection_tspan(model, env, state, self.horizon, self.shots)
            energies.append(
                model.predict_shot_energy(params, obs.wave, state.design, actions, t)
            )
        e = jnp.stack(energies)  # (members, shots)
        cost = (
            jnp.mean(e, axis=0)
            + self.beta * jnp.std(e, axis=0)
            + self.alpha * compute_action_cost(actions)
        )
        idx = jnp.argmin(cost)
        first = jax.tree_util.tree_map(lambda x: x[idx, 0], actions)
        return first, {"cost": cost, "idx": idx}


def _tree_normal(key: jax.Array, like):
    """Standard-normal pytree with `like`'s leaf shapes/dtypes."""
    leaves, treedef = jax.tree_util.tree_flatten(like)
    keys = jax.random.split(key, max(1, len(leaves)))
    return jax.tree_util.tree_unflatten(
        treedef,
        [jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)],
    )


@dataclass(frozen=True)
class CEMShooting:
    """Cross-entropy-method MPC: iterated elite refit over action sequences.

    Round 0 samples uniformly from the action box (identical distribution
    to `RandomShooting`); each refinement round refits a diagonal Gaussian
    to the `elites` best sequences and resamples around it, carrying the
    elites into the next population so the incumbent best never regresses.
    A drop-in upgrade of the reference's pure random shooting
    (`scripts/mpc.jl:19-53`) at `iters` x the selection-rollout cost.
    """

    model: Any
    horizon: int = 5
    shots: int = 256
    alpha: float = 1.0
    iters: int = 3
    elites: int = 32
    noise_floor: float = 0.0  # optional stddev floor to keep exploring
    warm: bool = False  # receding-horizon warm start (episode-fused path)
    polish_steps: int = 0  # gradient-polish the top-k elites post-search
    polish_topk: int = 8
    polish_lr: float = 0.02

    def __call__(self, params, env: WaveEnv, state: EnvState, key: jax.Array,
                 incumbent=None):
        actions, cost = self.population(params, env, state, key,
                                        incumbent=incumbent)
        if self.polish_steps > 0:
            actions, cost = self.polish(params, env, state, actions, cost)
        idx = jnp.argmin(cost)
        first = jax.tree_util.tree_map(lambda v: v[idx, 0], actions)
        seq = jax.tree_util.tree_map(lambda v: v[idx], actions)
        return first, {"cost": cost, "idx": idx, "seq": seq}

    def population(self, params, env: WaveEnv, state: EnvState, key: jax.Array,
                   incumbent=None):
        """The final refined (shots, horizon) population and its surrogate
        costs — exposed so the hybrid prune/re-rank controller can prune a
        CEM-refined pool instead of raw uniform samples.

        `incumbent` (an (H,) action-sequence pytree, e.g. the previous
        selection's plan shifted one window left) replaces candidate 0 of
        the round-0 population: classic receding-horizon warm starting —
        the refit Gaussian then concentrates around a known-good plan
        instead of re-discovering it from uniform samples every action."""
        obs = env_observe(env, state)
        t = selection_tspan(self.model, env, state, self.horizon, self.shots)
        x = (
            self.model.encode_wave(params, obs.wave)
            if hasattr(self.model, "encode_wave") else None
        )

        def eval_cost(actions):
            if hasattr(self.model, "predict_shot_energy"):
                energy = self.model.predict_shot_energy(
                    params, obs.wave, state.design, actions, t, x=x
                )
            else:
                batch = _mpc_batch(env, state, actions, self.horizon,
                                   self.shots, model=self.model)
                energy = jnp.sum(self.model(params, batch)[:, :, 2], axis=1)
            return energy + self.alpha * compute_action_cost(actions)

        bcast = lambda v: jnp.broadcast_to(
            v, (self.shots - self.elites, self.horizon, *v.shape)
        )
        low = jax.tree_util.tree_map(bcast, env.action_space.low)
        high = jax.tree_util.tree_map(bcast, env.action_space.high)

        key, k0 = jax.random.split(key)
        actions = build_action_sequence(env.action_space, k0, self.horizon, self.shots)
        if incumbent is not None:
            actions = jax.tree_util.tree_map(
                lambda v, inc: v.at[0].set(inc), actions, incumbent
            )
        cost = eval_cost(actions)

        for _ in range(self.iters):
            _, elite_idx = jax.lax.top_k(-cost, self.elites)
            elite = jax.tree_util.tree_map(lambda v: v[elite_idx], actions)
            mu = jax.tree_util.tree_map(
                lambda v: jnp.mean(v, axis=0, keepdims=True), elite
            )
            sd = jax.tree_util.tree_map(
                lambda v: jnp.maximum(
                    jnp.std(v, axis=0, keepdims=True), self.noise_floor
                ),
                elite,
            )
            key, kn = jax.random.split(key)
            noise = _tree_normal(kn, low)
            fresh = jax.tree_util.tree_map(
                lambda m, s, n: m + s * n, mu, sd, noise
            )
            fresh = tree_clamp(fresh, low, high)
            actions = jax.tree_util.tree_map(
                lambda e, f: jnp.concatenate([e, f], axis=0), elite, fresh
            )
            cost = eval_cost(actions)

        return actions, cost

    def polish(self, params, env: WaveEnv, state: EnvState, actions, cost):
        """CEM-then-gradient polish: projected descent through the
        differentiable surrogate rollout on the top-`polish_topk` sequences —
        the lever the sampling-only reference cannot express
        (`scripts/mpc.jl:19-53`). The polished sequences EXTEND the candidate
        set (never replace it), so the selected surrogate cost is monotone in
        `polish_steps`. Exposed separately from `__call__` so the DAgger pool
        probe (`make_pool_probe_fused(searcher=...)`) can harvest under the
        exact deployed CEM+polish controller distribution."""
        obs = env_observe(env, state)
        t = selection_tspan(self.model, env, state, self.horizon,
                            self.polish_topk)
        x = (
            self.model.encode_wave(params, obs.wave)
            if hasattr(self.model, "encode_wave") else None
        )
        _, top_idx = jax.lax.top_k(-cost, self.polish_topk)
        elite = jax.tree_util.tree_map(lambda v: v[top_idx], actions)
        bcast = lambda v: jnp.broadcast_to(
            v, (self.polish_topk, self.horizon, *v.shape))
        low = jax.tree_util.tree_map(bcast, env.action_space.low)
        high = jax.tree_util.tree_map(bcast, env.action_space.high)

        def cost_fn(acts):
            if hasattr(self.model, "predict_shot_energy"):
                energy = self.model.predict_shot_energy(
                    params, obs.wave, state.design, acts, t, x=x,
                    remat=True,
                )
            else:
                batch = _mpc_batch(env, state, acts, self.horizon,
                                   self.polish_topk, model=self.model)
                energy = jnp.sum(self.model(params, batch)[:, :, 2], axis=1)
            c = energy + self.alpha * compute_action_cost(acts)
            return jnp.sum(c), c

        def opt_step(acts, _):
            (_, c), g = jax.value_and_grad(cost_fn, has_aux=True)(acts)
            acts = jax.tree_util.tree_map(
                lambda a, gg: a - self.polish_lr * gg, acts, g)
            return tree_clamp(acts, low, high), c

        polished, _ = jax.lax.scan(
            opt_step, elite, None, length=self.polish_steps)
        _, cost_p = cost_fn(polished)
        actions = jax.tree_util.tree_map(
            lambda a, p: jnp.concatenate([a, p], axis=0), actions, polished)
        return actions, jnp.concatenate([cost, cost_p], axis=0)


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
    warm = bool(getattr(mpc, "warm", False))

    @jax.jit
    def run(params, state: EnvState, key: jax.Array):
        if warm:
            # receding-horizon carry: the previous selection's plan, shifted
            # one window left (last window repeated), seeds the next round-0
            # population; the first action starts from the box midpoint
            mid = jax.tree_util.tree_map(
                lambda lo, hi: jnp.broadcast_to(
                    (lo + hi) / 2.0, (mpc.horizon, *lo.shape)
                ),
                env.action_space.low, env.action_space.high,
            )

            def body(carry, k):
                st, inc = carry
                a, info = mpc(params, env, st, k, incumbent=inc)
                st2, _ = step(st, a)
                nxt = jax.tree_util.tree_map(
                    lambda v: jnp.concatenate([v[1:], v[-1:]], axis=0),
                    info["seq"],
                )
                return (st2, nxt), (st2.signal, info["cost"][info["idx"]])

            keys = jax.random.split(key, env.actions)
            (final, _), (signals, costs) = jax.lax.scan(
                body, (state, mid), keys
            )
            return final, signals, costs

        def body(carry, k):
            st = carry
            a, info = mpc(params, env, st, k)
            st2, _ = step(st, a)
            return st2, (st2.signal, info["cost"][info["idx"]])

        keys = jax.random.split(key, env.actions)
        final, (signals, costs) = jax.lax.scan(body, state, keys)
        return final, signals, costs

    return run


def make_policy_episode_fused(env: WaveEnv, policy,
                              tile_interior: int = 48,
                              interpret: bool = False):
    """Whole episode under an amortized ONE-SHOT policy
    (`models.AmortizedPolicy`): observe -> one conv forward -> Pallas env
    window, scanned over actions in one device program. The zero-search
    endgame of the distillation ladder — no candidate rollouts at decision
    time at all (the reference's cheapest controller still rolls 256
    candidate sequences per action, `scripts/mpc.jl:43-53`).

    Signature matches `make_mpc_episode_fused`:
    run(params, state, key) -> (final_state, signals (A, T+1, 3),
    costs (A,) — zeros; a direct policy evaluates no candidate costs).
    """
    from ..physics.fused import make_env_step_fused

    step = make_env_step_fused(env, tile_interior, interpret, jit=False)

    @jax.jit
    def run(params, state: EnvState, key: jax.Array):
        def body(st, _):
            obs = env_observe(env, st)
            a = policy.action(params, obs.wave, st.design)
            st2, _ = step(st, a)
            return st2, (st2.signal, jnp.float32(0.0))

        final, (signals, costs) = jax.lax.scan(
            body, state, None, length=env.actions
        )
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


def make_oracle_episode_fused(env: WaveEnv, horizon: int = 5, shots: int = 16,
                              alpha: float = 1.0, tile_interior: int = 48,
                              interpret: bool = False):
    """Whole-episode OracleShooting in ONE device program: per action,
    `shots` candidate sequences are rolled through the TRUE fused-kernel
    simulator over `horizon` windows (sequential scan over shots keeps peak
    memory at one grid state), the cumulative scattered energy + L2 action
    penalty is minimized, and the winning first action is applied. Replaces
    the un-jitted shots x horizon dispatch loop of `OracleShooting`
    (~10x faster; round-2 VERDICT item). Upper bound on shooting-MPC
    performance (reference protocol `scripts/mpc.jl:19-53` with the
    simulator as its own model).

    Returns run(state, key) -> (final_state, signals (A, T+1, 3),
    chosen_costs (A,)).

    ``per_action=True`` (see below) splits the episode into one dispatch
    per action instead of one whole-episode program: the axon-tunneled TPU
    worker kills single dispatches running longer than ~1 minute, which a
    256-shot whole-episode oracle exceeds (measured crash); per-action
    dispatches are ~shots x horizon x window / 7,500 s each.
    """
    from ..physics.fused import make_env_step_fused

    step = make_env_step_fused(env, tile_interior, interpret, jit=False)
    act = _oracle_act(env, step, horizon, shots, alpha)

    @jax.jit
    def run(state: EnvState, key: jax.Array):
        def body(st, k):
            a, chosen = act(st, k)
            st2, _ = step(st, a)
            return st2, (st2.signal, chosen)

        keys = jax.random.split(key, env.actions)
        final, (signals, costs) = jax.lax.scan(body, state, keys)
        return final, signals, costs

    return run


def _oracle_act(env: WaveEnv, step, horizon: int, shots: int, alpha: float):
    """Traceable shots x horizon true-simulator selection: sequential scan
    over shots (peak memory = one grid state), inner scan over the horizon's
    fused env windows."""

    def act(st, k):
        actions = build_action_sequence(env.action_space, k, horizon, shots)
        penalty = compute_action_cost(actions)

        def one_shot(carry, acts_s):
            def roll(st_h, a):
                st2, _ = step(st_h, a)
                # signal[0] duplicates the previous window's final row:
                # count each integration step once
                return st2, jnp.sum(st2.signal[1:, 2])

            _, scs = jax.lax.scan(roll, st, acts_s)
            return carry, jnp.sum(scs)

        _, energies = jax.lax.scan(one_shot, None, actions)
        cost = energies + alpha * penalty
        idx = jnp.argmin(cost)
        first = jax.tree_util.tree_map(lambda v: v[idx, 0], actions)
        return first, cost[idx]

    return act


def make_oracle_action_fused(env: WaveEnv, horizon: int = 5, shots: int = 16,
                             alpha: float = 1.0, tile_interior: int = 48,
                             interpret: bool = False):
    """Per-action oracle programs for dispatch-length-limited backends:
    returns (act, step) where act(state, key) -> (action, chosen_cost) is one
    jitted shots x horizon true-simulator selection and step(state, action)
    applies it. An episode is 2*A dispatches of bounded length instead of
    `make_oracle_episode_fused`'s single long program (the axon-tunneled
    TPU worker kills dispatches running past ~1 minute — measured crash at
    64 shots x 20 actions in one program)."""
    from ..physics.fused import make_env_step_fused

    step = make_env_step_fused(env, tile_interior, interpret, jit=False)
    return jax.jit(_oracle_act(env, step, horizon, shots, alpha)), jax.jit(step)


def coarsen_env_state(env_lo: WaveEnv, state: EnvState) -> EnvState:
    """Project a full-resolution `EnvState` onto `env_lo`'s coarser grid:
    bilinear-resize the wave frame history and the source shape field; the
    design and time step are resolution-independent parameters. Used by the
    hybrid controller's reduced-resolution exact re-rank — the coarse
    simulator integrates the same equations on the same physical domain, so
    its candidate ordering tracks the full-resolution ordering at ~(n/m)^2
    of the cost (energies differ at the discretization level, which cancels
    in a ranking)."""
    import dataclasses

    m = env_lo.dim.shape[0]
    wave = jax.image.resize(
        state.wave, (*state.wave.shape[:-2], m, m), "linear"
    )
    shape = jax.image.resize(state.source.shape, (m, m), "linear")
    return dataclasses.replace(
        state, wave=wave, source=dataclasses.replace(state.source, shape=shape)
    )


def make_hybrid_action_fused(env: WaveEnv, model, horizon: int = 5,
                             shots: int = 256, topk: int = 8,
                             alpha: float = 1.0, tile_interior: int = 48,
                             interpret: bool = False, searcher=None,
                             rerank_env: WaveEnv | None = None,
                             batched: bool = False, exact_rounds: int = 1,
                             exact_elites: int = 8):
    """Surrogate-pruned true-simulator MPC: the surrogate ranks `shots`
    candidate sequences in one batched latent rollout (cheap), the TRUE
    fused-kernel simulator re-evaluates only the `topk` best, and the
    final choice minimizes the *simulated* cost. Sits between pure
    surrogate shooting (fast, ranking-fidelity-limited) and
    OracleShooting (exact, shots x horizon full-grid windows): per action
    it pays `topk * horizon` fused env windows instead of
    `shots * horizon` — a beyond-reference controller; the reference only
    ever ranks with one model (`scripts/mpc.jl:19-53`).

    Returns (act, step): act(params, state, key) -> (action, chosen true
    cost) as ONE jitted dispatch of bounded length (tunneled workers kill
    >1 min dispatches), step(state, action) applies it.

    ``searcher``: optional population searcher (e.g. `CEMShooting`) whose
    `.population(params, env, state, key) -> (actions, cost)` supplies a
    REFINED candidate pool instead of raw uniform samples — CEM search plus
    exact re-ranking compose. Must be built with the same horizon/alpha.

    ``rerank_env``: optional coarser-grid env (same physical domain, dt and
    steps per window) for the re-rank simulations. The state is projected
    onto the coarse grid (`coarsen_env_state`) and the top-k rollouts run
    there at ~(n/m)^2 of the full-grid cost; the WINNING action is still
    applied at full resolution by `step`. Cuts the hybrid's per-action cost
    ~4x at m = n/2 with near-identical candidate ordering (the coarse
    simulator is the same physics, just coarser — measured in RESULTS.md).

    ``batched=True`` runs the top-k re-rank through the candidate-batched
    kernel (`physics.fused.make_rerank_rollout`: one grid-(K, n_tiles)
    program instead of a sequential scan of K rollouts) — same numerics,
    amortized per-invocation ramp; the win grows as the re-rank grid
    shrinks.

    ``exact_rounds > 1``: exact-CEM refinement (see `_hybrid_act`) — each
    extra round exactly evaluates `topk` fresh candidates sampled around
    the exact-cost elites; the chosen true cost is monotone in rounds.
    """
    act, step = _hybrid_act(
        env, model, horizon, shots, topk, alpha, tile_interior, interpret,
        searcher, rerank_env, batched,
        exact_rounds=exact_rounds, exact_elites=exact_elites,
    )
    return jax.jit(act), jax.jit(step)


def _hybrid_act(env: WaveEnv, model, horizon: int, shots: int, topk: int,
                alpha: float, tile_interior: int, interpret: bool,
                searcher, rerank_env: WaveEnv | None, batched: bool,
                exact_rounds: int = 1, exact_elites: int = 8,
                noise_floor: float = 0.05):
    """Traceable hybrid selection closure shared by the per-action
    (`make_hybrid_action_fused`) and whole-episode
    (`make_hybrid_episode_fused`) programs. Returns (act, step), unjitted.

    ``exact_rounds > 1`` adds exact-CEM refinement: each extra round refits
    a diagonal Gaussian to the ``exact_elites`` best sequences BY EXACT
    COST among everything evaluated so far, samples ``topk`` fresh
    candidates around it, exactly re-evaluates them, and the final choice
    is the argmin over ALL exact evaluations — so per selection the chosen
    true cost is monotonically non-increasing in rounds (unlike the
    measured-negative surrogate-CEM pool, whose refinement collapsed the
    pool before the exact re-rank saw it; RESULTS.md). Total exact budget =
    exact_rounds * topk rollouts."""
    from ..physics.fused import make_env_step_fused, make_rerank_rollout

    if searcher is not None:
        assert searcher.horizon == horizon and searcher.alpha == alpha, \
            "searcher must share the hybrid's horizon/alpha"
    step = make_env_step_fused(env, tile_interior, interpret, jit=False)
    if rerank_env is not None:
        assert rerank_env.dt == env.dt and \
            rerank_env.integration_steps == env.integration_steps, \
            "rerank_env must share the env's dt and steps per action window"
        step_lo = make_env_step_fused(rerank_env, tile_interior, interpret,
                                      jit=False)
    else:
        step_lo = step
    rollout_k = (
        make_rerank_rollout(rerank_env if rerank_env is not None else env,
                            topk, horizon, tile_interior, interpret)
        if batched else None
    )

    def act(params, st, k):
        if exact_rounds > 1:  # refinement rounds need their own noise keys
            k, k_pool = jax.random.split(k)
        else:  # keep the 1-round key path bit-identical to the oracle's
            k_pool = k
        if searcher is not None:
            actions, cost_s = searcher.population(params, env, st, k_pool)
            penalty = compute_action_cost(actions)
        else:
            actions = build_action_sequence(env.action_space, k_pool, horizon, shots)
            penalty = compute_action_cost(actions)
            obs = env_observe(env, st)
            t = selection_tspan(model, env, st, horizon, shots)
            energy = model.predict_shot_energy(
                params, obs.wave, st.design, actions, t
            )
            cost_s = energy + alpha * penalty
        _, best = jax.lax.top_k(-cost_s, topk)
        elite = jax.tree_util.tree_map(lambda v: v[best], actions)
        st_rr = coarsen_env_state(rerank_env, st) if rerank_env is not None else st

        def exact_eval(acts_k):
            if rollout_k is not None:
                return rollout_k(st_rr, acts_k, env_time(env, st))

            def one_shot(carry, acts_s):
                def roll(st_h, a):
                    st2, _ = step_lo(st_h, a)
                    return st2, jnp.sum(st2.signal[1:, 2])

                _, scs = jax.lax.scan(roll, st_rr, acts_s)
                return carry, jnp.sum(scs)

            _, e = jax.lax.scan(one_shot, None, acts_k)
            return e

        ev_actions = elite
        ev_cost = exact_eval(elite) + alpha * penalty[best]

        low1 = jax.tree_util.tree_map(
            lambda v: jnp.broadcast_to(v, (topk, horizon, *v.shape)),
            env.action_space.low,
        )
        high1 = jax.tree_util.tree_map(
            lambda v: jnp.broadcast_to(v, (topk, horizon, *v.shape)),
            env.action_space.high,
        )
        for _ in range(exact_rounds - 1):
            n_e = min(exact_elites, ev_cost.shape[0])
            _, eidx = jax.lax.top_k(-ev_cost, n_e)
            e_actions = jax.tree_util.tree_map(lambda v: v[eidx], ev_actions)
            mu = jax.tree_util.tree_map(
                lambda v: jnp.mean(v, axis=0, keepdims=True), e_actions
            )
            sd = jax.tree_util.tree_map(
                lambda v: jnp.maximum(
                    jnp.std(v, axis=0, keepdims=True), noise_floor
                ),
                e_actions,
            )
            k, kn = jax.random.split(k)
            noise = _tree_normal(kn, low1)
            fresh = tree_clamp(
                jax.tree_util.tree_map(lambda m, s, n: m + s * n, mu, sd, noise),
                low1, high1,
            )
            f_cost = exact_eval(fresh) + alpha * compute_action_cost(fresh)
            ev_actions = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b], axis=0), ev_actions, fresh
            )
            ev_cost = jnp.concatenate([ev_cost, f_cost], axis=0)

        idx = jnp.argmin(ev_cost)
        first = jax.tree_util.tree_map(lambda v: v[idx, 0], ev_actions)
        return first, ev_cost[idx]

    return act, step


def make_hybrid_episode_fused(env: WaveEnv, model, horizon: int = 5,
                              shots: int = 256, topk: int = 8,
                              alpha: float = 1.0, tile_interior: int = 48,
                              interpret: bool = False, searcher=None,
                              rerank_env: WaveEnv | None = None,
                              exact_rounds: int = 1, exact_elites: int = 8):
    """Whole hybrid-MPC episode in ONE device program: `lax.scan` over
    actions, each iteration running the surrogate prune -> true-simulator
    top-k re-rank -> fused env window. Removes the ~2 tunnel dispatches per
    action (~60 ms) of the per-action loop — at small topk with a coarse
    `rerank_env` the dispatch overhead is a large fraction of the episode.

    Only valid where one episode's device time stays under the tunneled
    worker's ~1 min dispatch kill: actions * (topk * horizon * steps /
    rerank-throughput + surrogate ranking + env window). topk<=64 at a 350^2
    re-rank (~25 s) and anything at 175^2 qualify; use
    `make_hybrid_action_fused` beyond that.

    Returns run(params, state, key) -> (final_state, signals (A, T+1, 3),
    chosen true costs (A,)).
    """
    act, step = _hybrid_act(
        env, model, horizon, shots, topk, alpha, tile_interior, interpret,
        searcher, rerank_env, batched=False,
        exact_rounds=exact_rounds, exact_elites=exact_elites,
    )

    @jax.jit
    def run(params, state: EnvState, key: jax.Array):
        def body(st, k):
            a, c = act(params, st, k)
            st2, _ = step(st, a)
            return st2, (st2.signal, c)

        keys = jax.random.split(key, env.actions)
        final, (signals, costs) = jax.lax.scan(body, state, keys)
        return final, signals, costs

    return run


def make_pool_probe_fused(env: WaveEnv, K: int = 16, horizon: int = 5,
                          alpha: float = 1.0,
                          rerank_env: WaveEnv | None = None,
                          refine_samples: int = 0, refine_elites: int = 4,
                          searcher=None, searcher_samples: int = 0,
                          tile_interior: int = 48, interpret: bool = False):
    """Exact-ranked candidate-pool probe for ranking distillation: at one
    state, sample K uniform candidate action sequences and evaluate each
    with the TRUE fused-kernel simulator (optionally on a coarser
    `rerank_env` grid — ranking-equivalent at ~(n/m)^2 the cost,
    RESULTS.md). Returns (probe, step):

      probe(state, key) -> (pool, action) where pool is a dict
        {"s_wave": observation (res, res, C), "s_design": design pytree,
         "t0": scalar episode time, "a": (K, H) action pytree,
         "y_true": (K,) simulated cumulative scattered energy,
         "penalty": (K,) L2 action cost}
      and action is the exact-cost argmin (y_true + alpha * penalty) —
      rolling episodes under it visits controlled-trajectory states.

    The pools supervise a surrogate RANKING fine-tune
    (`models.pool_ranking_loss`): round-3 measured that every pure-surrogate
    search upgrade lands within ~2 points of plain shooting because the
    surrogate's candidate ordering — not the optimizer — binds control
    quality; these are direct (candidates, true ordering) labels on
    on-policy states. Beyond-reference (the reference trains on random
    episode windows only, `scripts/data.jl:53-76`). No surrogate is needed
    at collection time.

    With `refine_samples > 0` the pool additionally contains candidates
    concentrated near the optimum: a diagonal Gaussian is refit to the
    `refine_elites` exact-best uniform candidates and `refine_samples`
    clipped resamples are exact-scored too (pool size K + refine_samples).
    Uniform-only pools teach coarse ordering; a CEM controller on the
    distilled surrogate spends its later iterations discriminating among
    near-optimal sequences, which is exactly the regime the refined half
    supervises.

    With `searcher` (a `CEMShooting` over the CURRENT distilled surrogate)
    the probe becomes a true DAgger iteration: `searcher_samples` of the K
    candidates are the searcher's own surrogate-best proposals (its final
    refined population's top sequences — the exact distribution the
    deployed controller must discriminate among), the rest stay uniform
    for coverage, and the returned advance action is the SEARCHER'S choice
    (surrogate argmin), so episodes visit the deployed controller's state
    distribution rather than the exact-oracle's. If the searcher carries
    `polish_steps > 0`, its gradient-polished elites extend the proposal
    set before selection (`CEMShooting.polish`), so the harvest matches the
    deployed CEM+polish record controller exactly. The probe then takes
    (params, state, key).
    """
    from ..physics.fused import make_env_step_fused

    step = make_env_step_fused(env, tile_interior, interpret, jit=False)
    if rerank_env is not None:
        assert rerank_env.dt == env.dt and \
            rerank_env.integration_steps == env.integration_steps, \
            "rerank_env must share the env's dt and steps per action window"
        step_lo = make_env_step_fused(rerank_env, tile_interior, interpret,
                                      jit=False)
    else:
        step_lo = step
    if searcher is not None:
        assert 0 < searcher_samples <= K, (searcher_samples, K)
        assert searcher.horizon == horizon, (searcher.horizon, horizon)

    def probe(st, k, params=None):
        if searcher is None:
            k_unif, k_ref = jax.random.split(k)
            actions = build_action_sequence(env.action_space, k_unif, horizon, K)
            a_ctrl = None
        else:
            k_cem, k_unif, k_ref = jax.random.split(k, 3)
            pop, cost_s = searcher.population(params, env, st, k_cem)
            if searcher.polish_steps > 0:
                # harvest under the DEPLOYED CEM+polish controller: the
                # gradient-polished elites join the proposal pool and the
                # advance action is the polished argmin, so recorded states
                # and candidates match the record controller's distribution
                pop, cost_s = searcher.polish(params, env, st, pop, cost_s)
            idx_s = jnp.argmin(cost_s)
            a_ctrl = jax.tree_util.tree_map(lambda v: v[idx_s, 0], pop)
            _, top_idx = jax.lax.top_k(-cost_s, searcher_samples)
            cands = jax.tree_util.tree_map(lambda v: v[top_idx], pop)
            if searcher_samples < K:
                unif = build_action_sequence(
                    env.action_space, k_unif, horizon, K - searcher_samples)
                actions = jax.tree_util.tree_map(
                    lambda c, u: jnp.concatenate([c, u], axis=0), cands, unif)
            else:
                actions = cands
        st_rr = coarsen_env_state(rerank_env, st) if rerank_env is not None else st

        def score(acts):
            def one_shot(carry, acts_s):
                def roll(st_h, a):
                    st2, _ = step_lo(st_h, a)
                    return st2, jnp.sum(st2.signal[1:, 2])

                _, scs = jax.lax.scan(roll, st_rr, acts_s)
                return carry, jnp.sum(scs)

            _, y = jax.lax.scan(one_shot, None, acts)
            return y

        y_true = score(actions)
        if refine_samples > 0:
            # refit a diagonal Gaussian to the exact-best uniform elites and
            # exact-score clipped resamples — near-optimal contrast labels
            cost0 = y_true + alpha * compute_action_cost(actions)
            _, elite_idx = jax.lax.top_k(-cost0, refine_elites)
            elite = jax.tree_util.tree_map(lambda v: v[elite_idx], actions)
            mu = jax.tree_util.tree_map(
                lambda v: jnp.mean(v, axis=0, keepdims=True), elite)
            sd = jax.tree_util.tree_map(
                lambda v: jnp.std(v, axis=0, keepdims=True), elite)
            bcast = lambda v: jnp.broadcast_to(
                v, (refine_samples, horizon, *v.shape))
            low = jax.tree_util.tree_map(bcast, env.action_space.low)
            high = jax.tree_util.tree_map(bcast, env.action_space.high)
            noise = _tree_normal(k_ref, low)
            fresh = tree_clamp(
                jax.tree_util.tree_map(lambda m, s, n: m + s * n, mu, sd, noise),
                low, high)
            actions = jax.tree_util.tree_map(
                lambda u, f: jnp.concatenate([u, f], axis=0), actions, fresh)
            y_true = jnp.concatenate([y_true, score(fresh)], axis=0)
        penalty = compute_action_cost(actions)
        obs = env_observe(env, st)
        pool = {
            "s_wave": obs.wave,
            "s_design": st.design,
            "t0": env_time(env, st),
            "a": actions,
            "y_true": y_true,
            "penalty": penalty,
        }
        if a_ctrl is not None:
            return pool, a_ctrl  # advance under the deployed controller
        idx = jnp.argmin(y_true + alpha * penalty)
        first = jax.tree_util.tree_map(lambda v: v[idx, 0], actions)
        return pool, first

    if searcher is None:
        return jax.jit(probe), jax.jit(step)
    return jax.jit(lambda params, st, k: probe(st, k, params)), jax.jit(step)


def make_mpc_episode_recorded(env: WaveEnv, mpc, epsilon: float = 0.0,
                              tile_interior: int = 48, interpret: bool = False):
    """Whole MPC-controlled episode that records the full `Episode` pytree
    (observations, chosen actions, tspans, signals) — on-policy dataset
    generation for closing the surrogate's train/control distribution gap
    (the states MPC visits are systematically lower-energy than the random
    policy's, and ranking fidelity on those states is what selection
    quality depends on; beyond-reference — the reference trains on random
    episodes only, `scripts/data.jl:53-76`).

    With probability `epsilon` per action window the controller's choice is
    replaced by a uniform random action: pure-MPC episodes contain only
    near-optimal action windows, which starves a fine-tune of the contrast
    it needs to rank arbitrary candidates from on-policy states.

    Returns run(params, state, key) -> (final_state, Episode), jitted; one
    device dispatch per episode like `make_mpc_episode_fused`.
    """
    from ..data import Episode
    from ..physics.fused import make_env_step_fused

    step = make_env_step_fused(env, tile_interior, interpret, jit=False)

    @jax.jit
    def run(params, state: EnvState, key: jax.Array):
        def body(st, k):
            k_sel, k_rnd, k_mix = jax.random.split(k, 3)
            obs = env_observe(env, st)
            a_mpc, _ = mpc(params, env, st, k_sel)
            a_rnd = env.action_space.sample(k_rnd)
            use_rnd = jax.random.bernoulli(k_mix, epsilon)
            a = jax.tree_util.tree_map(
                lambda m, r: jnp.where(use_rnd, r, m), a_mpc, a_rnd
            )
            st2, info = step(st, a)
            return st2, (obs.wave, obs.design, info["tspan"], a, st2.signal)

        keys = jax.random.split(key, env.actions)
        final, (s_wave, s_design, s_tspan, a, y) = jax.lax.scan(body, state, keys)
        return final, Episode(
            s_wave=s_wave, s_design=s_design, s_tspan=s_tspan, a=a, y=y
        )

    return run


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
            batch = _mpc_batch(env, state, acts, self.horizon, self.shots,
                               model=self.model)
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
