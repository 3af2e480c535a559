"""Dynamics and time integration: the heart of the simulator.

TPU-native re-design of reference `src/dynamics.jl`:

  * `runge_kutta` — classic RK4 step (reference `src/dynamics.jl:9-16`),
    identical operation order so float32 trajectories match the reference
    equations.
  * `Integrator` — one fused `lax.scan` over integration steps. The
    reference unrolls via `Flux.Recur` with a host closure forcing a
    GPU->CPU sync on every RHS evaluation (`src/env.jl:99-102`); here the
    entire rollout (design lerp -> speed rasterization -> source eval ->
    stencil RHS x4) is a single compiled program on device.
  * Gradients come from `jax.grad` through the scan. The reference's
    hand-written O(1)-graph-memory adjoint (`src/dynamics.jl:97-128`) is
    replaced by `jax.checkpoint` on the scan body ("step") or a chunked
    scan-of-scans ("sqrt", O(sqrt T) live memory).
  * `AcousticDynamics2D` — split-field PML first-order acoustic system, 6
    fields/stack, two stacks (total field with design speed c, incident
    field with ambient c0) = 12 channels (reference `src/dynamics.jl:151-188`).
  * `AcousticDynamics1D` — 4-field latent transmission system with learned
    PML (reference `src/dynamics.jl:190-222`), batched; the spatial
    derivative is a dense (E, E) matmul that rides the MXU.

Any object with signature `rhs(u, t, theta) -> du` works as a dynamics — the
runtime is physics-agnostic (see `waves_jl_tpu/physics/extra.py`).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..dims import OneDim, ThreeDim, TwoDim, build_dirichlet, get_dx, get_dy
from ..ops.fd import fd_d, fd_dx, fd_dy, gradient_matrix
from ..ops.pml import build_pml
from ..utils.trees import register_pytree_dataclass


def build_tspan(ti: float, dt: float, steps: int) -> jax.Array:
    """(steps+1,) time points from ti, spacing dt (reference
    `src/dynamics.jl:5-7`, a Julia `range` = linspace)."""
    return jnp.linspace(ti, ti + steps * dt, steps + 1, dtype=jnp.float32)


def runge_kutta(f, u, t, theta, dt):
    """One RK4 increment du (multiply-by-dt included), reference
    `src/dynamics.jl:9-16`."""
    k1 = f(u, t, theta)
    k2 = f(u + 0.5 * dt * k1, t + 0.5 * dt, theta)
    k3 = f(u + 0.5 * dt * k2, t + 0.5 * dt, theta)
    k4 = f(u + dt * k3, t + dt, theta)
    du = (1.0 / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
    return du * dt


@register_pytree_dataclass(meta_fields=("integration_function", "dt", "checkpoint", "unroll"))
@dataclass(frozen=True)
class Integrator:
    """Scan-fused rollout (reference `Integrator`, `src/dynamics.jl:18-53`).

    checkpoint: "none" | "step" | "sqrt"
      - "step": remat each RK4 step on the backward pass (O(T) recompute,
        O(T) state storage like the reference's adjoint).
      - "sqrt": chunked scan-of-scans; only chunk boundaries are saved live
        (O(sqrt T) memory), chunks rematerialize on backward.
    """

    dynamics: Any
    integration_function: Callable = runge_kutta
    dt: float = 1e-5
    checkpoint: str = "none"
    unroll: int = 1

    def step(self, u, t, theta):
        du = self.integration_function(self.dynamics, u, t, theta, self.dt)
        return u + du

    def __call__(self, u0: jax.Array, tspan: jax.Array, theta) -> jax.Array:
        """Rollout: u0 (...,), tspan (T+1,) or (B, T+1) batched.

        Returns trajectory with TIME LEADING: (T+1, ...) including u0 as
        frame 0 (the reference concatenates time last,
        `src/dynamics.jl:44-48`).
        """
        if tspan.ndim == 1:
            ts = tspan[:-1]
        else:
            ts = jnp.swapaxes(tspan, 0, 1)[:-1]  # (T, B)

        def body(u, t):
            u2 = self.step(u, t, theta)
            return u2, u2

        if self.checkpoint == "step":
            body = jax.checkpoint(body)
            _, traj = jax.lax.scan(body, u0, ts, unroll=self.unroll)
        elif self.checkpoint == "sqrt":
            T = ts.shape[0]
            chunk = max(1, int(T**0.5))
            n_chunks = T // chunk
            rem = T - n_chunks * chunk

            @jax.checkpoint
            def chunk_body(u, t_chunk):
                return jax.lax.scan(body, u, t_chunk, unroll=self.unroll)

            main = ts[: n_chunks * chunk].reshape(n_chunks, chunk, *ts.shape[1:])
            u_last, traj = jax.lax.scan(chunk_body, u0, main)
            traj = traj.reshape(n_chunks * chunk, *traj.shape[2:])
            if rem:
                _, tail = jax.lax.scan(body, u_last, ts[n_chunks * chunk :])
                traj = jnp.concatenate([traj, tail], axis=0)
        else:
            _, traj = jax.lax.scan(body, u0, ts, unroll=self.unroll)

        return jnp.concatenate([u0[None], traj], axis=0)

    def rollout_final(self, u0, tspan, theta):
        """Final state only (no trajectory materialization)."""
        ts = tspan[:-1] if tspan.ndim == 1 else jnp.swapaxes(tspan, 0, 1)[:-1]

        def body(u, t):
            return self.step(u, t, theta), None

        u_final, _ = jax.lax.scan(body, u0, ts, unroll=self.unroll)
        return u_final


def acoustic_rhs_2d(x, c, f, pml, bc, dx, dy):
    """Single-stack split-field PML acoustic RHS.

    x: (6, nx, ny) fields U, Vx, Vy, Psix, Psiy, Omega; c: speed field
    (nx, ny) or scalar; f: source field (nx, ny); pml: (nx, ny) varying
    along x (sigma_y is its transpose). Reference `acoustic_dynamics`
    (`src/dynamics.jl:151-177`).
    """
    U, Vx, Vy, Px, Py, Om = x[0], x[1], x[2], x[3], x[4], x[5]
    b = c**2
    sx = pml
    sy = pml.T

    Vxx = fd_dx(Vx, dx)
    Vyy = fd_dy(Vy, dy)
    Uf = U + f
    Ux = fd_dx(Uf, dx)
    Uy = fd_dy(Uf, dy)

    dU = b * (Vxx + Vyy) + Px + Py - (sx + sy) * U - Om
    dVx = Ux - sx * Vx
    dVy = Uy - sy * Vy
    dPx = b * sx * Vyy
    dPy = b * sy * Vxx
    dOm = sx * sy * U

    return jnp.stack([bc * dU, dVx, dVy, dPx, dPy, dOm], axis=0)


@register_pytree_dataclass(meta_fields=("c0",))
@dataclass(frozen=True)
class AcousticDynamics2D:
    """Two simultaneous stacks: total field (design speed) + incident field
    (ambient c0) over 12 channels (reference `src/dynamics.jl:179-188`).

    theta = (C, F): callables t -> speed field (nx, ny) and t -> source
    field (nx, ny), both pytrees so the closure lives on device.
    """

    c0: float
    pml: jax.Array  # (nx, ny)
    bc: jax.Array  # (nx, ny)
    dx: jax.Array
    dy: jax.Array

    def __call__(self, x, t, theta):
        C, F = theta
        c = C(t)
        f = F(t)
        dtot = acoustic_rhs_2d(x[0:6], c, f, self.pml, self.bc, self.dx, self.dy)
        dinc = acoustic_rhs_2d(x[6:12], self.c0, f, self.pml, self.bc, self.dx, self.dy)
        return jnp.concatenate([dtot, dinc], axis=0)


def make_acoustic_dynamics_2d(dim: TwoDim, c0: float, pml_width: float, pml_scale: float):
    """Factory mirroring reference `AcousticDynamics(dim, c0, w, s)`
    (`src/dynamics.jl:139-148`)."""
    return AcousticDynamics2D(
        c0=float(c0),
        pml=build_pml(dim, pml_width, pml_scale),
        bc=build_dirichlet(dim),
        dx=get_dx(dim),
        dy=get_dy(dim),
    )


def acoustic_rhs_3d(x, c, f, prof, bc, spacing):
    """Single-stack split-field PML acoustic RHS in 3D — an extension beyond
    the reference (which declares ThreeDim, `src/dims.jl:20-25`, but never
    integrates it). Symmetric generalization of `acoustic_rhs_2d`:
    8 fields U, Vx, Vy, Vz, Psix, Psiy, Psiz, Omega; each Psi_i damps the
    divergence of the OTHER axes' velocities (as Psix <- sx*Vyy in 2D), and
    Omega integrates the pairwise sigma products (the triple product
    sx*sy*sz term, third order in the corner overlap, is dropped).

    x: (8, nx, ny, nz); c scalar or field; f source field; prof: (n,) 1D
    sigma profile broadcast per axis; bc Dirichlet mask; spacing uniform.
    """
    U, Vx, Vy, Vz, Px, Py, Pz, Om = (x[i] for i in range(8))
    b = c**2
    sx = prof[:, None, None]
    sy = prof[None, :, None]
    sz = prof[None, None, :]

    Vxx = fd_d(Vx, spacing, -3)
    Vyy = fd_d(Vy, spacing, -2)
    Vzz = fd_d(Vz, spacing, -1)
    Uf = U + f
    Ux = fd_d(Uf, spacing, -3)
    Uy = fd_d(Uf, spacing, -2)
    Uz = fd_d(Uf, spacing, -1)

    dU = b * (Vxx + Vyy + Vzz) + Px + Py + Pz - (sx + sy + sz) * U - Om
    dVx = Ux - sx * Vx
    dVy = Uy - sy * Vy
    dVz = Uz - sz * Vz
    dPx = b * sx * (Vyy + Vzz)
    dPy = b * sy * (Vxx + Vzz)
    dPz = b * sz * (Vxx + Vyy)
    dOm = (sx * sy + sy * sz + sz * sx) * U

    return jnp.stack([bc * dU, dVx, dVy, dVz, dPx, dPy, dPz, dOm], axis=0)


@register_pytree_dataclass(meta_fields=("c0",))
@dataclass(frozen=True)
class AcousticDynamics3D:
    """Total + incident stacks over 16 channels (3D analog of
    `AcousticDynamics2D`). theta = (C, F): t -> speed field/scalar and
    t -> source field."""

    c0: float
    prof: jax.Array  # (n,) 1D sigma profile
    bc: jax.Array  # (nx, ny, nz)
    spacing: jax.Array

    def __call__(self, x, t, theta):
        C, F = theta
        c = C(t)
        f = F(t)
        dtot = acoustic_rhs_3d(x[0:8], c, f, self.prof, self.bc, self.spacing)
        dinc = acoustic_rhs_3d(x[8:16], self.c0, f, self.prof, self.bc, self.spacing)
        return jnp.concatenate([dtot, dinc], axis=0)


def make_acoustic_dynamics_3d(dim: ThreeDim, c0: float, pml_width: float, pml_scale: float):
    return AcousticDynamics3D(
        c0=float(c0),
        prof=build_pml(dim, pml_width, pml_scale),
        bc=build_dirichlet(dim),
        spacing=get_dx(dim),
    )


@register_pytree_dataclass(meta_fields=("c0", "matmul_dtype", "state_dtype"))
@dataclass(frozen=True)
class AcousticDynamics1D:
    """Batched 4-field latent transmission system with learned PML
    (reference `src/dynamics.jl:190-222`).

    x: (B, 4, E) fields U_tot, V_tot, U_inc, V_inc.
    theta = (C, F, PML): C(t) -> (B, E) latent speed, F(t) -> (B, E) latent
    source, PML (B, E) learned profile scaled by pml[0] (= pml_scale).

    `matmul_dtype="bfloat16"` runs the derivative contraction in 1-pass
    bf16; `state_dtype="bfloat16"` streams the whole per-step chain in
    bf16. Both measured flat on TPU v5e (33-34 ms per 500-step B=256
    rollout regardless — per-step fixed costs dominate; PERF_NOTES.md),
    so they are options for other hardware, not speed levers here.
    Energies drift ~1e-2 relative in bf16 state: MPC ranking only.
    Default float32.
    """

    c0: float
    grad: jax.Array  # (E, E) dense first-derivative operator (MXU path)
    pml: jax.Array  # (E,) only pml[0] (== scale at the boundary) is used
    bc: jax.Array  # (E,)
    matmul_dtype: str = "float32"
    state_dtype: str = "float32"

    def _ddx(self, u):
        # (B, E) @ (E, E)^T on the MXU
        return jnp.einsum("be,ke->bk", u, self.grad, preferred_element_type=jnp.float32)

    def __call__(self, x, t, theta):
        C, F, PML = theta
        bf16_state = self.state_dtype == "bfloat16"
        dt_ = jnp.bfloat16 if bf16_state else jnp.float32
        sigma = (self.pml[0] * PML).astype(dt_)  # (B, E)
        c = C(t).astype(dt_)
        f = F(t).astype(dt_)
        x = x.astype(dt_)

        # field-axis-broadcast formulation — no per-field slicing/stacking
        # (the stack/unstack pattern was measured as the rollout's dominant
        # per-step fixed cost; this form is arithmetically identical):
        #   y   = x[:, perm] + f * e_uf      (derivative inputs)
        #   d   = y @ grad^T                 (one fused MXU contraction)
        #   du  = coef * d - sigma * x       (coef = c0*c | c0 per field)
        #   du *= bc on the displacement fields
        e_uf = jnp.array([0.0, 1.0, 0.0, 1.0], dt_)[None, :, None]
        y = x[:, jnp.array([1, 0, 3, 2])] + f[:, None] * e_uf
        if bf16_state or self.matmul_dtype == "bfloat16":
            d = jnp.einsum(
                "bfe,ke->bfk", y.astype(jnp.bfloat16),
                self.grad.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).astype(dt_)
        else:
            d = jnp.einsum(
                "bfe,ke->bfk", y, self.grad,
                preferred_element_type=jnp.float32,
            )

        c0_ = jnp.asarray(self.c0, dt_)
        tot_mask = jnp.array([1.0, 1.0, 0.0, 0.0], dt_)[None, :, None]
        coef = c0_ * jnp.where(tot_mask == 1.0, c[:, None], jnp.asarray(1.0, dt_))
        du = coef * d - sigma[:, None] * x
        bc_mask = jnp.array([1.0, 0.0, 1.0, 0.0], dt_)[None, :, None] * (
            self.bc.astype(dt_)[None, None, :] - 1.0
        ) + 1.0  # 1 everywhere except bc on fields 0 and 2
        return du * bc_mask


def make_acoustic_dynamics_1d(dim: OneDim, c0: float, pml_width: float, pml_scale: float):
    return AcousticDynamics1D(
        c0=float(c0),
        grad=gradient_matrix(dim.x),
        pml=build_pml(dim, pml_width, pml_scale),
        bc=build_dirichlet(dim),
    )
