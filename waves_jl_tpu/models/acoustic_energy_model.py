"""AcousticEnergyModel — the flagship surrogate ("ours" / cPILS-numerical).

Parity with reference `src/model/acoustic_energy_model.jl`:
  wave encoder -> z0 (4 latent fields) + latent source shape F + learned PML;
  design encoder -> C(t);
  latent 1D acoustic rollout through the scan-fused Integrator (gradients
  via jax.checkpoint rematerialization instead of the reference's
  hand-written adjoint rrule);
  energy readout sum(z^2) dx for total/incident/scattered.

The model is a plain orchestrator over flax modules with an explicit params
pytree — the design-space clamp unroll and the physics rollout carry no
parameters and stay pure.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..designs import DesignSpace
from ..dims import OneDim, one_dim
from ..physics.dynamics import AcousticDynamics1D, Integrator, make_acoustic_dynamics_1d
from ..sources import Source
from .design_encoder import DesignMLP, design_encoder_apply, unroll_design_sequence
from .layers import embed_sin
from .wave_encoder import WaveEncoder


def compute_latent_energy(z: jax.Array, dx) -> jax.Array:
    """z: (L, B, 4, E) time-leading latent trajectory -> (B, L, 3)
    [tot, inc, sc] energies (reference
    `src/model/acoustic_energy_model.jl:6-15`)."""
    z = z.astype(jnp.float32)  # accumulate energies in f32 (bf16 rollouts)
    tot = z[:, :, 0]  # (L, B, E)
    inc = z[:, :, 2]
    sc = tot - inc
    e = jnp.stack(
        [
            jnp.sum(tot**2, axis=-1) * dx,
            jnp.sum(inc**2, axis=-1) * dx,
            jnp.sum(sc**2, axis=-1) * dx,
        ],
        axis=-1,
    )  # (L, B, 3)
    return jnp.moveaxis(e, 0, 1)


@dataclass(frozen=True)
class SinusoidalSource:
    """Learnable latent source: shape = sine-basis(freq_coefs)
    (reference `src/model/acoustic_energy_model.jl:17-34`). Present for
    parity; in the flagship model the latent source shape comes from the
    wave encoder (as in the reference, whose trainable SinusoidalSource
    coefficients receive no gradient — `get_parameters_and_initial_condition`
    uses `Source(x[:, 5, :], F.freq)`)."""

    basis: jax.Array
    freq: float

    def init_coefs(self, key, nfreq: int):
        return jax.random.normal(key, (nfreq,), jnp.float32) / jnp.sqrt(
            jnp.float32(nfreq)
        )

    def shape(self, coefs):
        return embed_sin(self.basis, coefs)


@dataclass(frozen=True)
class AcousticEnergyModel:
    """Static configuration + non-trainable physics; params live in an
    explicit pytree {"wave_encoder", "design_encoder"}."""

    wave_encoder: WaveEncoder
    design_mlp: DesignMLP
    design_space: DesignSpace
    dynamics: AcousticDynamics1D
    integrator: Integrator
    latent_dim: OneDim
    n_elements: int
    latent_grid_size: float
    source_freq: float
    integration_steps: int

    def fast_ranking(self) -> "AcousticEnergyModel":
        """bf16-state inference variant for MPC action RANKING. Measured on
        TPU v5e: NO speedup — the 500-step selection rollout is bound by
        per-step fixed costs (scan carry/layout churn), identical at f32 /
        bf16-matmul / bf16-state (33-34 ms at B=256; PERF_NOTES.md). Kept
        as an option for hardware where bytes dominate; candidate-cost
        ordering matches f32 (tested). The real <1 s lever is FEWER
        sequential latent steps (coarser latent dt), a model change."""
        import dataclasses

        dyn = dataclasses.replace(self.dynamics, state_dtype="bfloat16")
        integ = dataclasses.replace(
            self.integrator, dynamics=dyn, checkpoint="none"
        )
        return dataclasses.replace(self, dynamics=dyn, integrator=integ)

    @classmethod
    def create(
        cls,
        design_space: DesignSpace,
        source_freq: float,
        elements: int = 1024,
        latent_grid_size: float = 100.0,
        h_size: int = 256,
        nfreq: int = 500,
        pml_width: float = 10.0,
        pml_scale: float = 10000.0,
        c0: float = 1531.0,
        dt: float = 1e-5,
        integration_steps: int = 100,
        checkpoint: str = "sqrt",
        conv_dtype=None,
    ) -> "AcousticEnergyModel":
        """Reference hyperparameters from `scripts/main.jl:121-141`.
        `conv_dtype=jnp.bfloat16` runs the encoder convs in bf16 (params
        stay float32) — opt-in speed mode."""
        latent_dim = one_dim(latent_grid_size, elements)
        dynamics = make_acoustic_dynamics_1d(latent_dim, c0, pml_width, pml_scale)
        integrator = Integrator(dynamics=dynamics, dt=dt, checkpoint=checkpoint)
        return cls(
            wave_encoder=WaveEncoder(
                h_size=h_size,
                nfreq=nfreq,
                elements=elements,
                latent_grid_size=latent_grid_size,
                conv_dtype=conv_dtype,
            ),
            design_mlp=DesignMLP(
                h_size=h_size,
                nfreq=nfreq,
                elements=elements,
                latent_grid_size=latent_grid_size,
            ),
            design_space=design_space,
            dynamics=dynamics,
            integrator=integrator,
            latent_dim=latent_dim,
            n_elements=int(elements),
            latent_grid_size=float(latent_grid_size),
            source_freq=float(source_freq),
            integration_steps=int(integration_steps),
        )

    @property
    def dx(self) -> float:
        return 2.0 * self.latent_grid_size / (self.n_elements - 1)

    def init(self, key: jax.Array, sample_batch) -> dict:
        k1, k2 = jax.random.split(key)
        s_wave, s_design, a, t = (
            sample_batch["s_wave"],
            sample_batch["s_design"],
            sample_batch["a"],
            sample_batch["t"],
        )
        we_params = self.wave_encoder.init(k1, s_wave)
        vecs = unroll_design_sequence(self.design_space, s_design, a)
        de_params = self.design_mlp.init(k2, vecs)
        return {"wave_encoder": we_params, "design_encoder": de_params}

    def get_parameters_and_initial_condition(self, params, batch):
        """(z0, theta=(C, F, PML)) — reference
        `src/model/acoustic_energy_model.jl:89-97`."""
        x = self.wave_encoder.apply(params["wave_encoder"], batch["s_wave"])  # (B,6,E)
        z0 = x[:, 0:4]
        F = Source(shape=x[:, 4], freq=jnp.float32(self.source_freq))
        PML = x[:, 5]
        C = design_encoder_apply(
            self.design_mlp,
            params["design_encoder"],
            self.design_space,
            batch["s_design"],
            batch["a"],
            batch["t"],
            self.integration_steps,
        )
        return z0, (C, F, PML)

    def generate_latent_solution(self, params, batch) -> jax.Array:
        """(L, B, 4, E) latent trajectory (reference
        `src/model/acoustic_energy_model.jl:99-102`)."""
        z0, theta = self.get_parameters_and_initial_condition(params, batch)
        return self.integrator(z0, batch["t"], theta)

    def __call__(self, params, batch) -> jax.Array:
        """(B, L, 3) predicted energies."""
        z = self.generate_latent_solution(params, batch)
        return compute_latent_energy(z, self.dx)

    def encode_wave(self, params, obs_wave) -> jax.Array:
        """(6, E) latent fields for ONE observation (res, res, C)."""
        return self.wave_encoder.apply(params["wave_encoder"], obs_wave[None])[0]

    def _shot_setup(self, params, obs_wave, s_design, actions, t, x=None):
        """Shared single-observation/S-shot preparation: broadcast the
        encoded wave, build the per-shot latent speed interpolant."""
        S = t.shape[0]
        if x is None:
            x = self.encode_wave(params, obs_wave)  # (6, E)
        xb = jnp.broadcast_to(x[None], (S, *x.shape))
        z0 = xb[:, 0:4]
        F = Source(shape=xb[:, 4], freq=jnp.float32(self.source_freq))
        PML = xb[:, 5]
        s_design_s = jax.tree_util.tree_map(
            lambda v: jnp.broadcast_to(v[None], (S, *v.shape)), s_design
        )
        C = design_encoder_apply(
            self.design_mlp, params["design_encoder"], self.design_space,
            s_design_s, actions, t, self.integration_steps,
        )
        return z0, (C, F, PML)

    def predict_shots(self, params, obs_wave, s_design, actions, t) -> jax.Array:
        """MPC selection fast path: ONE observation, S candidate action
        sequences -> (S, L, 3) energies. The generic batch path runs the
        conv encoder on S identical copies of the observation (the
        selection's largest redundant cost); here the wave is encoded once
        and the latents broadcast — only the design encoder and the latent
        rollout are per-shot.

        obs_wave (res, res, C); s_design: single design pytree;
        actions: (S, H) action pytree; t (S, L).
        """
        z0, theta = self._shot_setup(params, obs_wave, s_design, actions, t)
        z = self.integrator(z0, t, theta)
        return compute_latent_energy(z, self.dx)

    def predict_shot_energy(self, params, obs_wave, s_design, actions, t,
                            x=None, remat: bool = False) -> jax.Array:
        """Fastest MPC selection path: (S,) CUMULATIVE scattered energy
        (== `predict_shots(...)[:, :, 2].sum(axis=1)`, the RandomShooting
        cost) accumulated in the scan carry — the (L, S, 4, E) latent
        trajectory is never materialized, killing ~2x its HBM write+read
        traffic during action selection. `x` optionally passes a
        precomputed `encode_wave` result so iterated controllers (CEM)
        do not re-run the conv encoder per refinement round. `remat=True`
        checkpoints each step so the path is differentiable at O(steps x
        carry) instead of O(steps x residuals) memory — used when this
        quantity is a TRAINING loss (`pool_ranking_loss`), not just an
        inference ranking."""
        z0, theta = self._shot_setup(params, obs_wave, s_design, actions, t, x)
        dx = self.dx

        def sc_energy(z):
            sc = (z[:, 0] - z[:, 2]).astype(jnp.float32)
            return jnp.sum(sc * sc, axis=-1) * dx  # (S,)

        ts = jnp.swapaxes(t, 0, 1)[:-1]  # (L-1, S)

        def body(carry, tt):
            z, acc = carry
            z2 = self.integrator.step(z, tt, theta)
            return (z2, acc + sc_energy(z2)), None

        (_, acc), _ = jax.lax.scan(
            body if not remat else jax.checkpoint(body), (z0, sc_energy(z0)), ts
        )
        return acc


def energy_loss(model: AcousticEnergyModel, params, batch,
                sc_weight: float = 1.0) -> jax.Array:
    """MSE on all three energy channels (reference `scripts/main.jl:10-12`).

    `sc_weight` > 1 up-weights the scattered channel (mean-normalized so
    the loss scale is comparable across weights): the scattered energy is
    the control-relevant signal and the one the prediction benchmark
    scores, while the baseline NODE spends ALL its capacity on it
    (reference `src/model/node.jl:64-69`); the default 1.0 is the
    reference's equal-weight loss."""
    pred = model(params, batch)
    se = (pred - batch["y"]) ** 2
    if sc_weight == 1.0:
        return jnp.mean(se)
    w = jnp.array([1.0, 1.0, float(sc_weight)], se.dtype)
    return jnp.mean(se * w) * (3.0 / (2.0 + float(sc_weight)))


def pool_ranking_loss(model: AcousticEnergyModel, params, pools,
                      tau: float = 1.0, listwise_weight: float = 0.5):
    """Ranking distillation on exact-evaluated candidate pools
    (`control.make_pool_probe_fused`): per pool, the surrogate's predicted
    cumulative scattered energies over K candidate action sequences are
    matched to the TRUE simulated energies *in pool-normalized (z-scored)
    units* — only the candidate ORDERING carries gradient, not the energy
    scale (surrogate latent energies and coarse-grid simulated energies
    live in different units). A listwise softmax cross-entropy term
    (temperature `tau` in z-units) sharpens fidelity where MPC needs it:
    at the low-energy end the argmin is read from.

    pools: {"s_wave": (P, res, res, C), "s_design": (P,) design pytree,
            "t0": (P,), "a": (P, K, H) action pytree, "y_true": (P, K)}
    Returns scalar loss. Mix with `energy_loss` on ordinary windows to
    anchor calibration (`scripts_tpu/train_pools.py`).
    """
    K = pools["y_true"].shape[1]
    H = jax.tree_util.tree_leaves(pools["a"])[0].shape[2]
    from ..physics.dynamics import build_tspan

    tgrid = build_tspan(0.0, model.integrator.dt, model.integration_steps * H)

    def one_pool(s_wave, s_design, t0, a):
        t = jnp.broadcast_to((t0 + tgrid)[None], (K, tgrid.shape[0]))
        return model.predict_shot_energy(params, s_wave, s_design, a, t,
                                         remat=True)

    e_hat = jax.vmap(one_pool)(
        pools["s_wave"], pools["s_design"], pools["t0"], pools["a"]
    )  # (P, K)

    def z(v):
        return (v - jnp.mean(v, axis=1, keepdims=True)) / (
            jnp.std(v, axis=1, keepdims=True) + 1e-6
        )

    y = pools["y_true"].astype(jnp.float32)
    ze, zy = z(e_hat), z(y)
    # pools whose candidates all score ~the same (e.g. states before the
    # wavefront reaches the scatterers: every y_true is 0) carry no ranking
    # signal — weight each pool by its relative true spread so they
    # contribute nothing instead of noise
    sd = jnp.std(y, axis=1)
    w = sd / (sd + 0.01 * jnp.abs(jnp.mean(y, axis=1)) + 1e-6)  # (P,)
    wsum = jnp.sum(w) + 1e-6
    zmse = jnp.sum(w * jnp.mean((ze - zy) ** 2, axis=1)) / wsum
    p_true = jax.nn.softmax(-zy / tau, axis=1)
    logq = jax.nn.log_softmax(-ze / tau, axis=1)
    listwise = jnp.sum(w * (-jnp.sum(p_true * logq, axis=1))) / wsum
    return zmse + listwise_weight * listwise


def energy_loss_ranking(model: AcousticEnergyModel, params, batch,
                        beta: float = 1.0) -> jax.Array:
    """Curve MSE + a term on the TIME-CUMULATIVE scattered energy — the
    quantity MPC shooting actually ranks candidates by
    (`RandomShooting`: sum_t sc). Aligns training with selection quality:
    round-2 showed pointwise val MSE does not order MPC performance.
    The cumulative term is normalized per step so beta ~ 1 balances the
    two at typical curve scales."""
    pred = model(params, batch)
    curve = jnp.mean((pred - batch["y"]) ** 2)
    L = pred.shape[1]
    cum = jnp.mean(
        ((jnp.sum(pred[:, :, 2], axis=1) - jnp.sum(batch["y"][:, :, 2], axis=1))
         / L) ** 2
    )
    return curve + beta * cum
