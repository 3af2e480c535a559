"""Extra physics: the Integrator/dynamics interface is physics-agnostic.

Parity with the reference's demonstration scripts: an undamped 3-field wave
("pandemic", `scripts/pandemic.jl:6-31`) and a wildfire combustion-style
reaction-diffusion system (`scripts/wildfire.jl` / `scripts/old_wildfire.jl`).
Any `rhs(u, t, theta) -> du` plugs into the same scan/RK4/grad machinery.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..constants import WATER
from ..dims import TwoDim, build_dirichlet
from ..ops.fd import fd_dx, fd_dy
from ..utils.trees import register_pytree_dataclass


@register_pytree_dataclass
@dataclass(frozen=True)
class PandemicDynamics:
    """Undamped 3-field wave system (reference `scripts/pandemic.jl:6-31`):
    dU = c0 (dVx/dx + dVy/dy); dVx = c0 d(U+f)/dx; dVy = c0 d(U+f)/dy."""

    bc: jax.Array
    dx: jax.Array
    dy: jax.Array

    def __call__(self, x, t, theta):
        (F,) = theta
        f = F(t)
        U, Vx, Vy = x[0], x[1], x[2]
        Vxx = fd_dx(Vx, self.dx)
        Vyy = fd_dy(Vy, self.dy)
        Uf = U + f
        Ux = fd_dx(Uf, self.dx)
        Uy = fd_dy(Uf, self.dy)
        dU = WATER * (Vxx + Vyy)
        dVx = WATER * Ux
        dVy = WATER * Uy
        return jnp.stack([dU * self.bc, dVx, dVy], axis=0)


def make_pandemic_dynamics(dim: TwoDim):
    from ..dims import get_dx, get_dy

    return PandemicDynamics(bc=build_dirichlet(dim), dx=get_dx(dim), dy=get_dy(dim))


@register_pytree_dataclass
@dataclass(frozen=True)
class WildfireDynamics:
    """Combustion reaction-diffusion on a 2D grid, after the reference's
    wildfire experiment (`scripts/old_wildfire.jl:14-120`): temperature T
    with diffusion + wind advection + Arrhenius reaction, and fuel fraction
    X consumed by the burn.

    state x: (2, nx, ny) = [T, X]. theta = () (autonomous).
    """

    dx: jax.Array
    dy: jax.Array
    kappa: jax.Array  # diffusivity
    wind: jax.Array  # (2,) wind velocity
    t_ambient: jax.Array
    t_ign: jax.Array
    rate: jax.Array  # reaction rate scale
    heat: jax.Array  # heat release per unit fuel
    cool: jax.Array  # Newton cooling coefficient

    def __call__(self, x, t, theta):
        T, X = x[0], x[1]
        # diffusion via divergence of gradients (2nd order)
        Tx = fd_dx(T, self.dx)
        Ty = fd_dy(T, self.dy)
        lap = fd_dx(Tx, self.dx) + fd_dy(Ty, self.dy)
        adv = self.wind[0] * Tx + self.wind[1] * Ty
        ignited = jax.nn.sigmoid((T - self.t_ign) * 0.05)
        burn = self.rate * ignited * jnp.maximum(X, 0.0) * jnp.exp(
            -self.t_ign / jnp.maximum(T, 1.0)
        )
        dT = (
            self.kappa * lap
            - adv
            + self.heat * burn
            - self.cool * (T - self.t_ambient)
        )
        dX = -burn
        return jnp.stack([dT, dX], axis=0)


def make_wildfire_dynamics(
    dim: TwoDim,
    kappa: float = 0.5,
    wind=(0.5, 0.0),
    t_ambient: float = 298.15,
    t_ign: float = 431.6,
    rate: float = 5.0,
    heat: float = 200.0,
    cool: float = 0.05,
):
    from ..dims import get_dx, get_dy

    return WildfireDynamics(
        dx=get_dx(dim),
        dy=get_dy(dim),
        kappa=jnp.float32(kappa),
        wind=jnp.asarray(wind, jnp.float32),
        t_ambient=jnp.float32(t_ambient),
        t_ign=jnp.float32(t_ign),
        rate=jnp.float32(rate),
        heat=jnp.float32(heat),
        cool=jnp.float32(cool),
    )
