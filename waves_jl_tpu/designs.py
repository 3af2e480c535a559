"""Design system: parameterized scatterer geometry = the action space.

TPU-native re-design of reference `src/designs.jl`. Designs are frozen
dataclass pytrees with a vector-space algebra implemented through
`jax.tree_util.tree_map` (the reference overloads Julia `+ - * /`,
`src/designs.jl:47-64`). Everything is fully dynamic (array leaves only), so
designs batch under `vmap`, unroll under `scan`, and interpolate inside the
rollout without host sync — the reference re-rasterizes via a host closure
on every RHS evaluation (`src/env.jl:99`), which this design eliminates.

Actions share the pytree structure of the design they act on (a Cloak action
carries a zero core delta), so stacked action sequences are plain pytrees.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .constants import AIR, DESIGN_SPEED
from .utils.trees import (
    register_pytree_dataclass,
    tree_add,
    tree_clamp,
    tree_scale,
    tree_zeros_like,
)


class DesignAlgebra:
    """Vector-space mixin (reference `src/designs.jl:47-53`)."""

    def __add__(self, other):
        if isinstance(other, (int, float)):
            return jax.tree_util.tree_map(lambda x: x + other, self)
        return tree_add(self, other)

    __radd__ = __add__

    def __mul__(self, s):
        if isinstance(s, DesignAlgebra):
            return jax.tree_util.tree_map(jnp.multiply, self, s)
        return tree_scale(self, s)

    __rmul__ = __mul__

    def __sub__(self, other):
        return self + (-1.0) * other

    def __truediv__(self, s):
        return self * (1.0 / s)

    def zero(self):
        return tree_zeros_like(self)


@register_pytree_dataclass
@dataclass(frozen=True)
class NoDesign(DesignAlgebra):
    """Empty design (reference `src/designs.jl:55-63`)."""

    def to_vec(self):
        return jnp.zeros((0,), dtype=jnp.float32)


@register_pytree_dataclass
@dataclass(frozen=True)
class Cylinders(DesignAlgebra):
    """M cylinders: pos (M, 2), radii r (M,), speed c (M,)
    (reference `src/designs.jl:69-94`)."""

    pos: jax.Array
    r: jax.Array
    c: jax.Array

    def __len__(self):
        return self.r.shape[0]

    def to_vec(self):
        return jnp.concatenate([self.pos.reshape(-1), self.r, self.c])


@register_pytree_dataclass
@dataclass(frozen=True)
class AdjustableRadiiScatterers(DesignAlgebra):
    """Fixed positions, adjustable radii (reference `src/designs.jl:179-192`)."""

    cylinders: Cylinders

    def to_vec(self):
        return self.cylinders.r


@register_pytree_dataclass
@dataclass(frozen=True)
class AdjustablePositionScatterers(DesignAlgebra):
    """Adjustable positions, fixed radii (reference `src/designs.jl:194-208`)."""

    cylinders: Cylinders

    def to_vec(self):
        return self.cylinders.pos.reshape(-1)


@register_pytree_dataclass
@dataclass(frozen=True)
class Cloak(DesignAlgebra):
    """Adjustable config ring + static core (reference `src/designs.jl:210-233`)."""

    config: AdjustableRadiiScatterers
    core: Cylinders

    def to_vec(self):
        return self.config.to_vec()


def stack_cylinders(c1: Cylinders, c2: Cylinders) -> Cylinders:
    """Concatenate two cylinder configs (reference `src/designs.jl:133-138`)."""
    return Cylinders(
        pos=jnp.concatenate([c1.pos, c2.pos], axis=0),
        r=jnp.concatenate([c1.r, c2.r], axis=0),
        c=jnp.concatenate([c1.c, c2.c], axis=0),
    )


def location_mask(cyls: Cylinders, grid: jax.Array) -> jax.Array:
    """(nx, ny, M) mask of grid points inside each cylinder
    (reference `src/designs.jl:99-104`)."""
    d2 = jnp.sum((grid[:, :, None, :] - cyls.pos[None, None, :, :]) ** 2, axis=-1)
    return d2 < (cyls.r**2)[None, None, :]


def cylinders_speed(cyls: Cylinders, grid: jax.Array, ambient_speed) -> jax.Array:
    """Rasterize the wavespeed field: ambient outside, per-cylinder speed
    inside (overlaps sum, like the reference — `src/designs.jl:110-116`)."""
    mask = location_mask(cyls, grid)
    ambient_mask = (jnp.sum(mask, axis=-1) == 0).astype(grid.dtype)
    c0 = ambient_mask * ambient_speed
    c_design = jnp.sum(mask.astype(grid.dtype) * cyls.c[None, None, :], axis=-1)
    return c0 + c_design


def speed(design, grid: jax.Array, ambient_speed):
    """Wavespeed field for any design (reference `speed` multiple dispatch)."""
    if isinstance(design, NoDesign):
        return jnp.asarray(ambient_speed, dtype=jnp.float32)
    if isinstance(design, Cylinders):
        return cylinders_speed(design, grid, ambient_speed)
    if isinstance(design, (AdjustableRadiiScatterers, AdjustablePositionScatterers)):
        return cylinders_speed(design.cylinders, grid, ambient_speed)
    if isinstance(design, Cloak):
        return cylinders_speed(
            stack_cylinders(design.config.cylinders, design.core), grid, ambient_speed
        )
    raise TypeError(f"unsupported design {type(design)}")


@register_pytree_dataclass
@dataclass(frozen=True)
class DesignSpace:
    """Box-constrained design space: apply = clamp(design + action, low, high)
    (reference `src/designs.jl:23-33`)."""

    low: DesignAlgebra
    high: DesignAlgebra

    def __call__(self, design, action):
        return tree_clamp(tree_add(design, action), self.low, self.high)

    def sample(self, key: jax.Array):
        """Uniform random design (reference `Base.rand(::DesignSpace)`,
        `src/designs.jl:243-269`), with explicit PRNG key threading."""
        leaves, treedef = jax.tree_util.tree_flatten(self.low)
        high_leaves = jax.tree_util.tree_leaves(self.high)
        keys = jax.random.split(key, max(1, len(leaves)))
        out = [
            jax.random.uniform(k, l.shape, l.dtype) * (h - l) + l
            for k, l, h in zip(keys, leaves, high_leaves)
        ]
        return jax.tree_util.tree_unflatten(treedef, out)


def build_action_space(design, scale: float) -> DesignSpace:
    """Action space scaled +-scale on the adjustable components
    (reference `build_action_space`, `src/designs.jl:90-94,185-192`).

    Actions share the design's pytree structure; non-adjustable components
    get zero bounds so sampling and clamping leave them fixed.
    """
    zero = tree_zeros_like(design)

    def fill(tree, value):
        return jax.tree_util.tree_map(lambda x: jnp.full_like(x, value), tree)

    if isinstance(design, NoDesign):
        return DesignSpace(NoDesign(), NoDesign())
    if isinstance(design, Cylinders):
        return DesignSpace(fill(design, -scale), fill(design, scale))
    if isinstance(design, AdjustableRadiiScatterers):
        lo = AdjustableRadiiScatterers(
            Cylinders(zero.cylinders.pos, jnp.full_like(design.cylinders.r, -scale), zero.cylinders.c)
        )
        hi = AdjustableRadiiScatterers(
            Cylinders(zero.cylinders.pos, jnp.full_like(design.cylinders.r, scale), zero.cylinders.c)
        )
        return DesignSpace(lo, hi)
    if isinstance(design, AdjustablePositionScatterers):
        lo = AdjustablePositionScatterers(
            Cylinders(jnp.full_like(design.cylinders.pos, -scale), zero.cylinders.r, zero.cylinders.c)
        )
        hi = AdjustablePositionScatterers(
            Cylinders(jnp.full_like(design.cylinders.pos, scale), zero.cylinders.r, zero.cylinders.c)
        )
        return DesignSpace(lo, hi)
    if isinstance(design, Cloak):
        config_space = build_action_space(design.config, scale)
        core_zero = tree_zeros_like(design.core)
        return DesignSpace(
            Cloak(config_space.low, core_zero), Cloak(config_space.high, core_zero)
        )
    raise TypeError(f"unsupported design {type(design)}")


@register_pytree_dataclass
@dataclass(frozen=True)
class DesignInterpolator:
    """Linear interpolation between two designs over [ti, tf]
    (reference `src/designs.jl:274-292`). Callable pytree: t -> design."""

    initial: DesignAlgebra
    final: DesignAlgebra
    ti: jax.Array
    tf: jax.Array

    def __call__(self, t):
        dt = self.tf - self.ti
        dt = jnp.where(dt > 0.0, dt, 1.0)
        w = (jnp.clip(t, self.ti, self.tf) - self.ti) / dt
        return jax.tree_util.tree_map(lambda a, b: a + w * (b - a), self.initial, self.final)


def multi_design_interpolation(interps: list, t):
    """Dispatch t to the matching interpolator among consecutive window
    interpolators and evaluate (reference `multi_design_interpolation`,
    `src/designs.jl:294-301`). Host-side helper for rendering."""
    import numpy as np

    tf = float(t)
    for interp in interps:
        if float(interp.ti) <= tf <= float(interp.tf):
            return interp(t)
    # out of range: clamp to nearest window like the reference's findmax
    best = min(
        interps,
        key=lambda it: min(abs(tf - float(it.ti)), abs(tf - float(it.tf))),
    )
    return best(t)


@register_pytree_dataclass
@dataclass(frozen=True)
class SpeedField:
    """Callable pytree t -> rasterized wavespeed field over `grid`.

    Fuses the reference's host closure `C = t -> speed(interp(cpu(t)[1]),
    grid, c0)` (`src/env.jl:99`) into the device program: the design lerp
    and mask rasterization happen inside the rollout scan.
    """

    interp: DesignInterpolator
    grid: jax.Array
    c0: jax.Array

    def __call__(self, t):
        return speed(self.interp(t), self.grid, self.c0)


def normalize_design(design, space: DesignSpace) -> jax.Array:
    """Scale the design parameter vector into [-1, 1]
    (reference `src/model/design_encoder.jl:6-9`)."""
    lo = space.low.to_vec()
    hi = space.high.to_vec()
    return 2.0 * (design.to_vec() - lo) / (hi - lo + 1e-3) - 1.0


def design_with_vec(template, v: jax.Array):
    """Inverse of `to_vec`: a copy of `template` with its adjustable
    parameter vector replaced by `v` (same layout `to_vec` emits). Used by
    the amortized one-shot policy to turn a network output vector back
    into an action pytree (no reference counterpart — the reference has no
    direct policy, `scripts/mpc.jl` only searches)."""
    import dataclasses

    if isinstance(template, NoDesign):
        return template
    if isinstance(template, Cylinders):
        m = len(template)
        return dataclasses.replace(
            template,
            pos=v[: 2 * m].reshape(m, 2),
            r=v[2 * m : 3 * m],
            c=v[3 * m :],
        )
    if isinstance(template, AdjustableRadiiScatterers):
        return dataclasses.replace(
            template,
            cylinders=dataclasses.replace(template.cylinders, r=v),
        )
    if isinstance(template, AdjustablePositionScatterers):
        return dataclasses.replace(
            template,
            cylinders=dataclasses.replace(
                template.cylinders, pos=v.reshape(-1, 2)
            ),
        )
    if isinstance(template, Cloak):
        return dataclasses.replace(
            template, config=design_with_vec(template.config, v)
        )
    raise TypeError(type(template))


# ---------------------------------------------------------------------------
# Design-space factory functions (reference `src/designs.jl:303-365`)
# ---------------------------------------------------------------------------


def design_to_circles(design) -> list:
    """Host-side list of (x, y, r) circles for plotting (reference's Makie
    `mesh!` overloads, `src/designs.jl:122-128`)."""
    import numpy as np

    if isinstance(design, NoDesign) or design is None:
        return []
    if isinstance(design, Cylinders):
        pos = np.asarray(design.pos)
        r = np.asarray(design.r)
        return [(float(pos[i, 0]), float(pos[i, 1]), float(r[i])) for i in range(len(r))]
    if isinstance(design, (AdjustableRadiiScatterers, AdjustablePositionScatterers)):
        return design_to_circles(design.cylinders)
    if isinstance(design, Cloak):
        return design_to_circles(design.config) + design_to_circles(design.core)
    raise TypeError(f"unsupported design {type(design)}")


def hexagon_ring(r: float) -> jnp.ndarray:
    """(6, 2) hexagon vertex positions (reference `src/designs.jl:303-311`)."""
    i = jnp.arange(6, dtype=jnp.float32)
    ang = i * 2.0 * jnp.pi / 6.0
    return jnp.stack([r * jnp.cos(ang), r * jnp.sin(ang)], axis=1)


def build_2d_rotation_matrix(theta_deg: float) -> jnp.ndarray:
    a = theta_deg * jnp.pi / 180.0
    return jnp.array(
        [[jnp.cos(a), -jnp.sin(a)], [jnp.sin(a), jnp.cos(a)]], dtype=jnp.float32
    )


def build_radii_design_space(pos: jnp.ndarray) -> DesignSpace:
    """Cloak with adjustable radii in [0.2, 1.0], speed 3xAIR, static core
    r=2 at (5, 0) (reference `src/designs.jl:337-351`)."""
    m = pos.shape[0]
    c = jnp.full((m,), DESIGN_SPEED, dtype=jnp.float32)
    core = Cylinders(
        pos=jnp.array([[5.0, 0.0]], dtype=jnp.float32),
        r=jnp.array([2.0], dtype=jnp.float32),
        c=jnp.array([DESIGN_SPEED], dtype=jnp.float32),
    )
    lo = Cloak(AdjustableRadiiScatterers(Cylinders(pos, jnp.full((m,), 0.2, jnp.float32), c)), core)
    hi = Cloak(AdjustableRadiiScatterers(Cylinders(pos, jnp.full((m,), 1.0, jnp.float32), c)), core)
    return DesignSpace(lo, hi)


def build_simple_radii_design_space() -> DesignSpace:
    """Single adjustable cylinder at origin, AIR core (reference
    `src/designs.jl:322-335`)."""
    pos = jnp.array([[0.0, 0.0]], dtype=jnp.float32)
    c = jnp.full((1,), AIR, dtype=jnp.float32)
    core = Cylinders(
        pos=jnp.array([[5.0, 0.0]], dtype=jnp.float32),
        r=jnp.array([2.0], dtype=jnp.float32),
        c=jnp.array([AIR], dtype=jnp.float32),
    )
    lo = Cloak(AdjustableRadiiScatterers(Cylinders(pos, jnp.full((1,), 0.2, jnp.float32), c)), core)
    hi = Cloak(AdjustableRadiiScatterers(Cylinders(pos, jnp.full((1,), 1.0, jnp.float32), c)), core)
    return DesignSpace(lo, hi)


def build_triple_ring_design_space() -> DesignSpace:
    """18 cylinders on 3 hex rings (3.5; 4.75 rotated 30 deg; 6.0) centered
    at (5, 0) (reference `src/designs.jl:353-365`)."""
    rot = build_2d_rotation_matrix(30.0)
    rings = jnp.concatenate(
        [hexagon_ring(3.5), hexagon_ring(4.75) @ rot, hexagon_ring(6.0)], axis=0
    )
    pos = rings + jnp.array([5.0, 0.0], dtype=jnp.float32)
    return build_radii_design_space(pos)


def build_rectangular_grid(nx: int, ny: int, r: float) -> jnp.ndarray:
    """Centered rectangular grid of positions (reference
    `scripts/data.jl:8-23`)."""
    xs = jnp.arange(nx, dtype=jnp.float32) * 2.0 * r
    ys = jnp.arange(ny, dtype=jnp.float32) * 2.0 * r
    gx, gy = jnp.meshgrid(xs, ys, indexing="ij")
    pos = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=1)
    return pos - jnp.mean(pos, axis=0, keepdims=True)


def build_rectangular_grid_design_space() -> DesignSpace:
    """5x5 adjustable-radius grid (reference `scripts/data.jl:25-31`)."""
    pos = build_rectangular_grid(5, 5, 1.0 + 0.1)
    m = pos.shape[0]
    c = jnp.full((m,), DESIGN_SPEED, dtype=jnp.float32)
    lo = AdjustableRadiiScatterers(Cylinders(pos, jnp.full((m,), 0.2, jnp.float32), c))
    hi = AdjustableRadiiScatterers(Cylinders(pos, jnp.full((m,), 1.0, jnp.float32), c))
    return DesignSpace(lo, hi)
