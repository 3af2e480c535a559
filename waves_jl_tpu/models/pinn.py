"""WaveControlPINN — physics-informed baseline (PINC).

Parity with reference `src/model/pinn.jl`: wave/design encoders; a 1D-conv
compressor R squeezing (z fields, f, pml, speed knots) into a latent vector
l; a PINN field network U evaluated over the broadcast (l, x/L, t/T) grid;
autoregressive unroll over action windows; and the physics-residual loss
(FD time-derivative matrices vs the 1D acoustic RHS) + IC + BC + energy
supervision.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..designs import DesignSpace
from ..dims import OneDim, build_dirichlet, one_dim
from ..ops.fd import gradient_matrix
from ..sources import Source
from ..utils.interp import evaluate_over_time, flatten_repeated_last_dim
from .design_encoder import DesignMLP, design_encoder_apply
from .layers import MLP, leaky_relu
from .wave_encoder import WaveEncoder


class Compressor(nn.Module):
    """1D conv stack -> global max pool -> latent vector
    (reference `build_compressor`, `src/model/pinn.jl:120-133`).
    Input (B, E, C) channels-last."""

    h_size: int
    out_size: int
    activation: Callable = leaky_relu

    @nn.compact
    def __call__(self, x):
        act = self.activation
        x = act(nn.Conv(self.h_size, (2,), padding="SAME")(x))
        x = act(nn.Conv(self.h_size, (2,), padding="SAME")(x))
        x = nn.max_pool(x, (2,), strides=(2,))
        x = act(nn.Conv(self.h_size, (2,), padding="SAME")(x))
        x = act(nn.Conv(self.h_size, (2,), padding="SAME")(x))
        x = nn.max_pool(x, (2,), strides=(2,))
        x = act(nn.Conv(self.h_size, (2,), padding="SAME")(x))
        x = act(nn.Conv(self.h_size, (2,), padding="SAME")(x))
        x = nn.Conv(self.out_size, (2,), padding="SAME")(x)
        return jnp.max(x, axis=1)  # (B, out_size)


class PINNFieldNet(nn.Module):
    """8 Dense layers + 4 parallel heads over (l, x, t) points
    (reference `build_wave_pinn`, `src/model/pinn.jl:135-152`)."""

    h_size: int
    activation: Callable = leaky_relu

    @nn.compact
    def __call__(self, x):
        act = self.activation
        for _ in range(8):
            x = act(nn.Dense(self.h_size)(x))
        heads = []
        for _ in range(4):
            h = MLP([self.h_size, self.h_size, 1], act, activate_final=False)(x)
            heads.append(h)
        return jnp.concatenate(heads, axis=-1)  # (..., 4)


def build_pinn_grid(elements: int, grid_size: float, steps: int, dt: float) -> jax.Array:
    """(T+1, E, 2) normalized (x/L, t/T) coordinates (reference
    `build_pinn_grid`, `src/model/pinn.jl:3-13`)."""
    x = jnp.linspace(-grid_size, grid_size, elements, dtype=jnp.float32) / grid_size
    t = jnp.linspace(0.0, steps * dt, steps + 1, dtype=jnp.float32) / (dt * (steps + 1))
    gx = jnp.broadcast_to(x[None, :], (steps + 1, elements))
    gt = jnp.broadcast_to(t[:, None], (steps + 1, elements))
    return jnp.stack([gx, gt], axis=-1)


@dataclass(frozen=True)
class WaveControlPINN:
    wave_encoder: WaveEncoder
    design_mlp: DesignMLP
    compressor: Compressor
    field_net: PINNFieldNet
    design_space: DesignSpace
    latent_dim: OneDim
    n_elements: int
    latent_grid_size: float
    source_freq: float
    integration_steps: int
    dt: float
    l_size: int

    @classmethod
    def create(
        cls,
        design_space: DesignSpace,
        source_freq: float,
        elements: int = 1024,
        latent_grid_size: float = 100.0,
        h_size: int = 256,
        nfreq: int = 500,
        l_size: int = 64,
        dt: float = 1e-5,
        integration_steps: int = 100,
    ) -> "WaveControlPINN":
        return cls(
            wave_encoder=WaveEncoder(
                h_size=h_size, nfreq=nfreq, elements=elements,
                latent_grid_size=latent_grid_size,
            ),
            design_mlp=DesignMLP(
                h_size=h_size, nfreq=nfreq, elements=elements,
                latent_grid_size=latent_grid_size,
            ),
            compressor=Compressor(h_size=h_size, out_size=l_size),
            field_net=PINNFieldNet(h_size=h_size),
            design_space=design_space,
            latent_dim=one_dim(latent_grid_size, elements),
            n_elements=int(elements),
            latent_grid_size=float(latent_grid_size),
            source_freq=float(source_freq),
            integration_steps=int(integration_steps),
            dt=float(dt),
            l_size=int(l_size),
        )

    @property
    def elements(self) -> int:
        return self.n_elements

    @property
    def grid_size(self) -> float:
        return self.latent_grid_size

    @property
    def dx(self) -> float:
        # static: float() of pytree arrays is illegal inside scan bodies
        return 2.0 * self.latent_grid_size / (self.n_elements - 1)

    def init(self, key: jax.Array, sample_batch) -> dict:
        from .design_encoder import unroll_design_sequence

        k1, k2, k3, k4 = jax.random.split(key, 4)
        we = self.wave_encoder.init(k1, sample_batch["s_wave"])
        vecs = unroll_design_sequence(
            self.design_space, sample_batch["s_design"], sample_batch["a"]
        )
        de = self.design_mlp.init(k2, vecs)
        r = self.compressor.init(k3, jnp.zeros((1, self.elements, 8), jnp.float32))
        u = self.field_net.init(k4, jnp.zeros((1, self.l_size + 2), jnp.float32))
        return {"wave_encoder": we, "design_encoder": de, "compressor": r, "field_net": u}

    # -- pieces -----------------------------------------------------------

    def compress(self, params, x, f, pml, c_pair) -> jax.Array:
        """x (B, 4, E), f/pml (B, E), c_pair (B, 2, E) -> l (B, l_size)
        (reference `compress`, `src/model/pinn.jl:216-223`)."""
        chans = jnp.concatenate([x, f[:, None], pml[:, None], c_pair], axis=1)  # (B,8,E)
        return self.compressor.apply(params["compressor"], jnp.moveaxis(chans, 1, 2))

    def pinn_window(self, params, l: jax.Array, time_chunk: int | None = None) -> jax.Array:
        """Evaluate the field net over the full (T+1, E) grid for each latent
        vector l (B, l_size) -> (B, T+1, 4, E) (reference `build_pinn_input`
        + `compute_pinn_sol`, `src/model/pinn.jl:225-239`).

        ``time_chunk``: evaluate the field net ``time_chunk`` time-rows at a
        time (``lax.map`` over row chunks) so the peak live activation is
        (B, time_chunk*E, h) instead of (B, (T+1)*E, h) — the difference
        between OOM and fitting HBM for long-horizon evaluation sweeps."""
        T1 = self.integration_steps + 1
        E = self.elements
        grid = build_pinn_grid(E, self.grid_size, self.integration_steps, self.dt)
        B = l.shape[0]

        def eval_points(pts):  # pts (P, 2) -> (B, P, 4)
            P = pts.shape[0]
            inp = jnp.concatenate(
                [
                    jnp.broadcast_to(l[:, None, :], (B, P, l.shape[-1])),
                    jnp.broadcast_to(pts[None], (B, P, 2)),
                ],
                axis=-1,
            )
            return self.field_net.apply(params["field_net"], inp)

        if time_chunk is None or time_chunk >= T1:
            out = eval_points(grid.reshape(T1 * E, 2))  # (B, T1*E, 4)
            return jnp.moveaxis(out.reshape(B, T1, E, 4), 3, 2)  # (B, T1, 4, E)

        pad = (-T1) % time_chunk
        gpad = jnp.pad(grid, ((0, pad), (0, 0), (0, 0)))
        n_chunks = (T1 + pad) // time_chunk
        chunks = gpad.reshape(n_chunks, time_chunk * E, 2)
        out = jax.lax.map(eval_points, chunks)  # (n_chunks, B, chunk*E, 4)
        out = jnp.moveaxis(out, 0, 1).reshape(B, T1 + pad, E, 4)[:, :T1]
        return jnp.moveaxis(out, 3, 2)  # (B, T1, 4, E)

    def encode(self, params, batch):
        x = self.wave_encoder.apply(params["wave_encoder"], batch["s_wave"])  # (B,6,E)
        z0 = x[:, 0:4]
        f = x[:, 4]
        pml = x[:, 5]
        C = design_encoder_apply(
            self.design_mlp, params["design_encoder"], self.design_space,
            batch["s_design"], batch["a"], batch["t"], self.integration_steps,
        )
        return z0, f, pml, C

    def generate_latent_solution(self, params, batch) -> jax.Array:
        """Autoregressive per-action-window unroll (reference CustomRecur
        loop, `src/model/pinn.jl:259-273`). Returns (B, L, 4, E)."""
        z0, f, pml, C = self.encode(params, batch)
        t = batch["t"]
        knots = t[:, :: self.integration_steps]  # (B, H+1)
        c = evaluate_over_time(C, knots)  # (B, H+1, E)
        H = knots.shape[1] - 1

        def body(x, ci_pair):
            l = self.compress(params, x, f, pml, ci_pair)
            sol = self.pinn_window(params, l)  # (B, T+1, 4, E)
            return sol[:, -1], sol

        c_pairs = jnp.stack([c[:, :-1], c[:, 1:]], axis=2)  # (B, H, 2, E)
        _, sols = jax.lax.scan(body, z0, jnp.moveaxis(c_pairs, 1, 0))
        # sols: (H, B, T+1, 4, E) -> (B, 4, E, H, T+1) -> join endpoints
        s = jnp.transpose(sols, (1, 3, 4, 0, 2))  # (B, 4, E, H, T+1)
        joined = flatten_repeated_last_dim(s)  # (B, 4, E, L)
        return jnp.moveaxis(joined, -1, 1)  # (B, L, 4, E)

    def predict_energy(self, params, batch, time_chunk: int | None = None) -> jax.Array:
        """(B, L, 3) energies without materializing the full field solution.

        Identical numerics to ``__call__`` but the autoregressive scan
        reduces each action window to its (B, T+1, 3) energies immediately,
        so the stacked scan output is L*3 floats per sample instead of
        L*4*E — combined with ``time_chunk`` this is what lets the PINC
        baseline run the reference's horizon-200-class sweeps
        (`scripts/prediction.jl:60-91`) without OOM."""
        z0, f, pml, C = self.encode(params, batch)
        t = batch["t"]
        knots = t[:, :: self.integration_steps]  # (B, H+1)
        c = evaluate_over_time(C, knots)  # (B, H+1, E)

        def window_energy(sol):  # (B, T+1, 4, E) -> (B, T+1, 3)
            tot, inc = sol[:, :, 0], sol[:, :, 2]
            sc = tot - inc
            return jnp.stack(
                [
                    jnp.sum(tot**2, -1) * self.dx,
                    jnp.sum(inc**2, -1) * self.dx,
                    jnp.sum(sc**2, -1) * self.dx,
                ],
                axis=-1,
            )

        def body(x, ci_pair):
            l = self.compress(params, x, f, pml, ci_pair)
            sol = self.pinn_window(params, l, time_chunk)  # (B, T+1, 4, E)
            return sol[:, -1], window_energy(sol)

        c_pairs = jnp.stack([c[:, :-1], c[:, 1:]], axis=2)  # (B, H, 2, E)
        _, ys = jax.lax.scan(body, z0, jnp.moveaxis(c_pairs, 1, 0))
        # ys: (H, B, T+1, 3) -> (B, 3, H, T+1) -> join shared endpoints
        y = jnp.transpose(ys, (1, 3, 0, 2))
        joined = flatten_repeated_last_dim(y)  # (B, 3, L)
        return jnp.moveaxis(joined, 1, 2)  # (B, L, 3)

    def __call__(self, params, batch) -> jax.Array:
        """(B, L, 3) energies (reference `src/model/pinn.jl:275-277`)."""
        sol = self.generate_latent_solution(params, batch)
        tot = sol[:, :, 0]
        inc = sol[:, :, 2]
        sc = tot - inc
        return jnp.stack(
            [
                jnp.sum(tot**2, -1) * self.dx,
                jnp.sum(inc**2, -1) * self.dx,
                jnp.sum(sc**2, -1) * self.dx,
            ],
            axis=-1,
        )


@dataclass(frozen=True)
class WaveControlPINNLoss:
    """Physics-residual + IC + BC + energy-supervision loss
    (reference `WaveControlPINNLoss`, `src/model/pinn.jl:279-324`).
    Assumes horizon = 1 (one action window), as in the reference training
    script (`scripts/main.jl:127`)."""

    model: WaveControlPINN
    c0: float
    pml_scale: float = 10000.0

    def __call__(self, params, batch) -> jax.Array:
        model = self.model
        z0, f_shape, pml, C = model.encode(params, batch)
        t = batch["t"]  # (B, T+1)
        assert t.shape[1] == model.integration_steps + 1, (
            "WaveControlPINNLoss trains on horizon-1 windows (reference "
            "scripts/main.jl:127); prepare the dataset with horizon=1 "
            f"(got a length-{t.shape[1]} joined window)"
        )
        F = Source(shape=f_shape, freq=jnp.float32(model.source_freq))

        knots = t[:, :: model.integration_steps]
        c_knots = evaluate_over_time(C, knots)  # (B, 2, E)
        l = model.compress(params, z0, f_shape, pml, c_knots)
        sol = model.pinn_window(params, l)  # (B, T+1, 4, E)

        # physics residual
        gx = gradient_matrix(model.latent_dim.x)  # (E, E)
        tspan0 = jnp.linspace(
            0.0, model.integration_steps * model.dt, model.integration_steps + 1,
            dtype=jnp.float32,
        )
        gt = gradient_matrix(tspan0)  # (T+1, T+1)

        u_tot, v_tot = sol[:, :, 0], sol[:, :, 1]  # (B, T+1, E)
        u_inc, v_inc = sol[:, :, 2], sol[:, :, 3]

        def ddt(u):
            return jnp.einsum("ij,bje->bie", gt, u, preferred_element_type=jnp.float32)

        def ddx(u):
            return jnp.einsum("ke,bte->btk", gx, u, preferred_element_type=jnp.float32)

        c = evaluate_over_time(C, t)  # (B, T+1, E)
        f = evaluate_over_time(F, t)  # (B, T+1, E)
        sig = self.pml_scale * pml[:, None, :]  # (B, 1, E)
        bc = build_dirichlet(model.latent_dim)[None, None, :]

        c0 = self.c0
        n_u_tot = (c0 * c * ddx(v_tot) - sig * u_tot) * bc
        n_v_tot = c0 * c * ddx(u_tot + f) - sig * v_tot
        n_u_inc = (c0 * ddx(v_inc) - sig * u_inc) * bc
        n_v_inc = c0 * ddx(u_inc + f) - sig * v_inc

        mse = lambda a, b: jnp.mean((a - b) ** 2)
        f_loss = (
            mse(ddt(u_tot), n_u_tot)
            + mse(ddt(v_tot), n_v_tot)
            + mse(ddt(u_inc), n_u_inc)
            + mse(ddt(v_inc), n_v_inc)
        )
        ic_loss = mse(sol[:, 0], z0)
        bc_loss = jnp.mean(sol[:, :, jnp.array([0, 2])][:, :, :, jnp.array([0, -1])] ** 2)
        physics_loss = 100.0 * c0 * (ic_loss + bc_loss) + f_loss / c0

        # energy supervision
        tot, inc = sol[:, :, 0], sol[:, :, 2]
        sc = tot - inc
        y_hat = jnp.stack(
            [
                jnp.sum(tot**2, -1) * model.dx,
                jnp.sum(inc**2, -1) * model.dx,
                jnp.sum(sc**2, -1) * model.dx,
            ],
            axis=-1,
        )
        energy = mse(y_hat, batch["y"])
        return energy + 0.01 * physics_loss
