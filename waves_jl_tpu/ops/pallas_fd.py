"""Pallas TPU kernel: fully fused RK4 step of the 12-channel PML acoustic
system (the framework's "native layer" — SURVEY.md section 2.6).

Why: the XLA stencil path is HBM-bound at ~1.2 GB of traffic per RK4 step
(each of the 4 RHS evaluations re-reads/re-writes the 23.5 MB state plus
intermediates). This kernel performs the whole step — 4 RHS evaluations
including per-stage design-cylinder rasterization, source evaluation, PML
terms and boundary-aware stencils — inside VMEM, reading the state from HBM
once and writing it once (~60 MB/step at 700^2).

Layout: the state is kept PADDED as (12, PX, PY): 8 ghost rows on the left
of x, right-padding x to the tile grid, y right-padded to a lane multiple.
Ghost/padding cells are forced to zero on every write; interior edge pixels
use one-sided stencils (mask-selected), so ghosts are never consumed.
Tiles overlap by an 8-row halo in x only (4 rows of physical halo are
needed for 4 RK4 stages x 1-cell stencils; 8 keeps DMA sublane-aligned);
y stays whole-row so no lane-unaligned slicing occurs.

Equations match `acoustic_rhs_2d` / reference `src/dynamics.jl:151-188`.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
GHOST = 8  # left ghost rows in x (>= 4 needed; 8 keeps DMA aligned)
HALO = 4  # physical halo consumed by 4 RK4 stages


def padded_dims(n: int, tile_interior: int, ghost: int = GHOST):
    """(PX, n_tiles) for the x axis and PY for the y axis of an n x n grid."""
    n_tiles = math.ceil(n / tile_interior)
    px = 2 * ghost + n_tiles * tile_interior
    py = math.ceil(n / LANE) * LANE
    return px, py, n_tiles


def pad_state(u: jax.Array, tile_interior: int = 48, ghost: int = GHOST) -> jax.Array:
    """(12, n, n) -> (12, PX, PY) zero-padded."""
    n = u.shape[-2]
    px, py, _ = padded_dims(n, tile_interior, ghost)
    return jnp.pad(u, ((0, 0), (ghost, px - ghost - n), (0, py - n)))


def unpad_state(u_pad: jax.Array, n: int, ghost: int = GHOST) -> jax.Array:
    return u_pad[:, ghost : ghost + n, :n]


def _roll(u, shift, axis):
    """pltpu.roll with negative-shift support (it requires shift >= 0)."""
    return pltpu.roll(u, shift % u.shape[axis], axis)


def _dx_edge_aware(u, gx_row, n, inv2dx):
    """d/dx (axis 0 = sublanes) with one-sided stencils at global rows 0 and
    n-1. `gx_row` is the (R, 1) global row index; garbage appears only in
    the tile's invalid halo ring."""
    up1 = _roll(u, -1, 0)  # u[i+1]
    um1 = _roll(u, 1, 0)  # u[i-1]
    up2 = _roll(u, -2, 0)
    um2 = _roll(u, 2, 0)
    central = up1 - um1
    left = -3.0 * u + 4.0 * up1 - up2
    right = 3.0 * u - 4.0 * um1 + um2
    d = jnp.where(gx_row == 0, left, central)
    d = jnp.where(gx_row == n - 1, right, d)
    return d * inv2dx


def _dy_edge_aware(u, gy_col, n, inv2dy):
    up1 = _roll(u, -1, 1)
    um1 = _roll(u, 1, 1)
    up2 = _roll(u, -2, 1)
    um2 = _roll(u, 2, 1)
    central = up1 - um1
    left = -3.0 * u + 4.0 * up1 - up2
    right = 3.0 * u - 4.0 * um1 + um2
    d = jnp.where(gy_col == 0, left, central)
    d = jnp.where(gy_col == n - 1, right, d)
    return d * inv2dy


def make_fused_acoustic_step(
    n: int,
    spacing: float,
    dt: float,
    c0: float,
    freq: float,
    n_cyl: int,
    x_min: float,
    tile_interior: int = 48,
    interpret: bool = False,
    steps_per_call: int = 1,
    ny_local: int | None = None,
    y_ghost: int = 0,
    radii_only: bool = False,
    x_matmul: bool = False,
    batch: int = 0,
    ghost: int = GHOST,
):
    """Build the fused RK4 step.

    Returns step(u_pad, shape_pad, prof_x, prof_y, scalars, cyl) ->
    (u_pad_next, energies(3,)) where
      u_pad    (12, PX, PY) padded state
      shape_pad (PX, PY) padded source spatial shape
      prof_x   (PX, 1) PML sigma profile over padded x
      prof_y   (1, PY) PML sigma profile over padded y
      scalars  (4,) f32 [t, ti, tf, col_offset] — step time, design lerp
               window, and the global column index of local lane 0 (nonzero
               only in y-sharded multi-chip operation)
      cyl      (8, n_cyl) f32 rows [p1x, p1y, r1, c1, p2x, p2y, r2, c2]
    energies = [tot, inc, sc] sums of u^2 over the OWNED region (multiply by
    dOmega outside).

    ``batch=K > 0`` builds the CANDIDATE-BATCHED variant used by the hybrid
    controller's exact re-rank: K independent states advance through the
    same time step in ONE kernel invocation — grid (K, n_tiles), state
    (K, 12, PX, PY), per-candidate designs cyl (K, 8, n_cyl); source shape
    and PML profiles are shared. Amortizes the per-invocation ramp that
    dominates at small grids (at 350^2 a call covers only ~8 tiles) and
    returns energies (K, steps_per_call, 3).

    Multi-chip (y-sharded) mode: `ny_local` = owned columns of this shard,
    `y_ghost` = halo columns on each side carrying neighbor data (>= HALO x
    steps_per_call). The one-sided y stencils then apply only at the TRUE
    domain columns (global index 0 / n-1); interior seams use the halo data
    via central differences. n stays the GLOBAL grid size.

    `radii_only=True` enables the static-geometry rasterization fast path:
    valid ONLY when cylinder positions and speeds are constant across the
    window (p1==p2, c1==c2 — AdjustableRadiiScatterers / Cloak) AND circles
    at their maximum radii are pairwise disjoint (the triple-ring space is;
    the caller must check). Each pixel is then covered by at most one
    cylinder for every lerp weight w, so the per-stage 19-cylinder
    mask-accumulate (the kernel's largest VPU cost after the stencils)
    collapses to a single owner-cylinder test: per-pixel fields
    (d2, r1, dr, c1, dc) of the owning cylinder are selected once per call,
    and each stage evaluates m = d2 < (r1+w*dr)^2 — the same expressions as
    the general path's per-cylinder test. Agreement is ulp-level (~1e-7:
    the per-pixel lerp may FMA-contract where the scalar lerp rounds); a
    mask flip would need d2 within one ulp of the circle boundary.
    """
    if ny_local is None:
        ny_local = n
    px, _, n_tiles = padded_dims(n, tile_interior, ghost)
    py = math.ceil((ny_local + 2 * y_ghost) / LANE) * LANE
    rows = tile_interior + 2 * ghost  # DMA'd rows per tile
    inv2d = 1.0 / (2.0 * spacing)
    fdt = float(dt)  # python float: jnp constants captured by kernels are rejected
    assert 1 <= steps_per_call <= ghost // HALO, steps_per_call
    assert y_ghost == 0 or y_ghost >= HALO * steps_per_call, (y_ghost, steps_per_call)

    def kernel(scalars, cyl_all, u_hbm, shape_ref, profx_ref, profy_ref,
               out_hbm, e_ref, u_scr, o_scr, ras_scr,
               sem_in, sem_out):
        if batch:
            i = pl.program_id(0)
            b = pl.program_id(1)
            e_row = b * n_tiles + i

            def cylv(r, j):
                # scalar SMEM read; a ref view (.at[b]) would be a slice,
                # which Mosaic requires lane-aligned (n_cyl=19 is not)
                return cyl_all[b, r, j]
        else:
            i = pl.program_id(0)
            e_row = i

            def cylv(r, j):
                return cyl_all[r, j]
        row0 = i * tile_interior  # padded-row offset of this tile's DMA

        cp_in = pltpu.make_async_copy(
            u_hbm.at[b, :, pl.ds(row0, rows), :] if batch
            else u_hbm.at[:, pl.ds(row0, rows), :],
            u_scr, sem_in,
        )
        cp_in.start()

        t = scalars[0]
        ti = scalars[1]
        tf = scalars[2]
        denom = jnp.where(tf - ti > 0.0, tf - ti, 1.0)

        # global coordinates of this tile
        l_row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        gx_row = row0 + l_row - ghost  # true grid row index (may be <0 / >=n)
        l_col = jax.lax.broadcasted_iota(jnp.int32, (1, py), 1)
        if y_ghost == 0 and ny_local == n:
            gy_col = l_col  # single-device: static (Mosaic constant-folds)
        else:
            col_offset = scalars[3].astype(jnp.int32) - y_ghost
            gy_col = col_offset + l_col  # GLOBAL column index of each lane
        x_coord = x_min + gx_row.astype(jnp.float32) * spacing
        y_coord = x_min + gy_col.astype(jnp.float32) * spacing

        valid = (gx_row >= 0) & (gx_row < n) & (gy_col >= 0) & (gy_col < n)
        fvalid = valid.astype(jnp.float32)

        sx = profx_ref[pl.ds(row0, rows), :]  # (rows, 1)
        sy = profy_ref[:, :]  # (1, py)
        f_shape = shape_ref[pl.ds(row0, rows), :]  # (rows, py)

        # Dirichlet mask on dU (true domain edges)
        bc = (
            (gx_row > 0) & (gx_row < n - 1) & (gy_col > 0) & (gy_col < n - 1)
        ).astype(jnp.float32)

        # conservative per-cylinder tile-intersection tests (scalar): the
        # cloak occupies a few tiles of the domain, so most tiles skip the
        # full-tile rasterization arithmetic entirely (VPU-bound kernel).
        x_t0 = x_min + (row0 - ghost) * spacing
        x_t1 = x_t0 + (rows - 1) * spacing
        intersects = []
        for j in range(n_cyl):
            r_max = jnp.maximum(cylv(2, j), cylv(6, j))
            xj_lo = jnp.minimum(cylv(0, j), cylv(4, j)) - r_max
            xj_hi = jnp.maximum(cylv(0, j), cylv(4, j)) + r_max
            intersects.append((xj_hi >= x_t0) & (xj_lo <= x_t1))

        def rasterize(w, ras_ref):
            """Lerped-cylinder wavespeed field at lerp weight w; accumulates
            in VMEM scratch (csum = ras[0], inside = ras[1]) so
            non-intersecting cylinders are skipped via predicated
            execution."""
            ras_ref[0] = jnp.zeros((rows, py), jnp.float32)
            ras_ref[1] = jnp.zeros((rows, py), jnp.float32)
            for j in range(n_cyl):
                @pl.when(intersects[j])
                def _():
                    pxj = cylv(0, j) + w * (cylv(4, j) - cylv(0, j))
                    pyj = cylv(1, j) + w * (cylv(5, j) - cylv(1, j))
                    rj = cylv(2, j) + w * (cylv(6, j) - cylv(2, j))
                    cj = cylv(3, j) + w * (cylv(7, j) - cylv(3, j))
                    d2 = (x_coord - pxj) ** 2 + (y_coord - pyj) ** 2
                    m = (d2 < rj * rj).astype(jnp.float32)
                    ras_ref[0] = ras_ref[0] + m * cj
                    ras_ref[1] = ras_ref[1] + m
            return jnp.where(ras_ref[1] == 0.0, jnp.float32(c0), ras_ref[0])

        def select_owner(ras_ref):
            """radii_only precompute (once per call): per-pixel fields of the
            owning cylinder — the unique one that can cover the pixel at any
            lerp weight, which exists because max-radius circles are
            pairwise disjoint. ras rows: [best_gap, d2, r1, dr, c1, dc]."""
            big = jnp.full((rows, py), 1e30, jnp.float32)
            ras_ref[0] = big  # best gap
            ras_ref[1] = big  # d2 (mask never true by default)
            for k in range(2, 6):
                ras_ref[k] = jnp.zeros((rows, py), jnp.float32)
            for j in range(n_cyl):
                @pl.when(intersects[j])
                def _():
                    d2 = (x_coord - cylv(0, j)) ** 2 + (y_coord - cylv(1, j)) ** 2
                    rmax = jnp.maximum(cylv(2, j), cylv(6, j))
                    gap = d2 - rmax * rmax
                    upd = gap < ras_ref[0]
                    ras_ref[0] = jnp.where(upd, gap, ras_ref[0])
                    ras_ref[1] = jnp.where(upd, d2, ras_ref[1])
                    ras_ref[2] = jnp.where(upd, cylv(2, j), ras_ref[2])
                    ras_ref[3] = jnp.where(upd, cylv(6, j) - cylv(2, j), ras_ref[3])
                    ras_ref[4] = jnp.where(upd, cylv(3, j), ras_ref[4])
                    ras_ref[5] = jnp.where(upd, cylv(7, j) - cylv(3, j), ras_ref[5])

        def rasterize_fast(w, ras_ref):
            """Per-stage owner test: same lerp/compare expressions as the
            general path's per-cylinder mask (ulp-level agreement)."""
            r = ras_ref[2] + w * ras_ref[3]
            m = ras_ref[1] < r * r
            return jnp.where(m, ras_ref[4] + w * ras_ref[5], jnp.float32(c0))

        if x_matmul:
            # d/dx as a (rows, rows) stencil-matrix matmul on the MXU,
            # which otherwise idles in this kernel (VPU-bound). Central
            # rows are exact (two nonzero coefficients; adding exact zeros
            # is exact); the 2 one-sided boundary rows agree to 1 ulp.
            ii = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
            g = gx_row  # (rows, 1) global row of each LOCAL row
            D = jnp.where(jj == ii + 1, 1.0, 0.0) + jnp.where(jj == ii - 1, -1.0, 0.0)
            at0 = g == 0
            atn = g == n - 1
            D = jnp.where(at0, 0.0, D)
            D = jnp.where(at0 & (jj == ii), -3.0, D)
            D = jnp.where(at0 & (jj == ii + 1), 4.0, D)
            D = jnp.where(at0 & (jj == ii + 2), -1.0, D)
            D = jnp.where(atn, 0.0, D)
            D = jnp.where(atn & (jj == ii), 3.0, D)
            D = jnp.where(atn & (jj == ii - 1), -4.0, D)
            D = jnp.where(atn & (jj == ii - 2), 1.0, D)

            Db = D.astype(jnp.bfloat16)

            def ddx(u_):
                # D's entries are small integers — exactly bf16 — so only u
                # needs splitting. Two passes capture 16 mantissa bits of u
                # (residual ~2^-17 per derivative); Mosaic's only native
                # options are 1-pass bf16 (too lossy: 1e-3/window) and
                # 6-pass HIGHEST (blows the 16 MB scoped-VMEM budget).
                u_hi = u_.astype(jnp.bfloat16)
                u_lo = (u_ - u_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                d = jax.lax.dot(Db, u_hi, preferred_element_type=jnp.float32)
                d = d + jax.lax.dot(Db, u_lo, preferred_element_type=jnp.float32)
                return d * inv2d
        else:
            def ddx(u_):
                return _dx_edge_aware(u_, gx_row, n, inv2d)

        def stack_rhs(U, Vx, Vy, Px, Py, Om, b, f):
            Vxx = ddx(Vx)
            Vyy = _dy_edge_aware(Vy, gy_col, n, inv2d)
            Uf = U + f
            Ux = ddx(Uf)
            Uy = _dy_edge_aware(Uf, gy_col, n, inv2d)
            dU = b * (Vxx + Vyy) + Px + Py - (sx + sy) * U - Om
            dVx = Ux - sx * Vx
            dVy = Uy - sy * Vy
            dPx = b * sx * Vyy
            dPy = b * sy * Vxx
            dOm = sx * sy * U
            return [bc * dU, dVx, dVy, dPx, dPy, dOm]

        def rhs(u, ts, ras_ref):
            w = (jnp.clip(ts, ti, tf) - ti) / denom
            c = rasterize_fast(w, ras_ref) if radii_only else rasterize(w, ras_ref)
            f = f_shape * jnp.sin(2.0 * jnp.pi * ts * jnp.float32(freq))
            d_tot = stack_rhs(u[0], u[1], u[2], u[3], u[4], u[5], c * c, f)
            d_inc = stack_rhs(
                u[6], u[7], u[8], u[9], u[10], u[11],
                jnp.float32(c0) * jnp.float32(c0), f,
            )
            return d_tot + d_inc

        if radii_only:
            select_owner(ras_scr)

        cp_in.wait()
        # zero the x-ghost rows on load: they are never written to HBM, so
        # they hold uninitialized garbage between calls. The stencil forms
        # contain it (selects / discarded rows), but the x_matmul path's dot
        # products would propagate a ghost NaN via 0*NaN into interior rows.
        row_ok = (gx_row >= 0) & (gx_row < n)
        u = [jnp.where(row_ok, u_scr[ch], 0.0) for ch in range(12)]

        owned = (
            valid
            & (l_row >= ghost)
            & (l_row < ghost + tile_interior)
            & (l_col >= y_ghost)
            & (l_col < y_ghost + ny_local)
        )
        sixth = fdt / 6.0
        for st in range(steps_per_call):
            # closed-form RK4 combine: an incremental accumulation variant
            # (acc = k1+2k2; acc += 2k3; ...) was measured 24% slower on
            # Mosaic despite the smaller live set — keep this form
            ts0 = t + st * fdt
            k1 = rhs(u, ts0, ras_scr)
            k2 = rhs([a + (0.5 * fdt) * b_ for a, b_ in zip(u, k1)],
                     ts0 + 0.5 * fdt, ras_scr)
            k3 = rhs([a + (0.5 * fdt) * b_ for a, b_ in zip(u, k2)],
                     ts0 + 0.5 * fdt, ras_scr)
            k4 = rhs([a + fdt * b_ for a, b_ in zip(u, k3)],
                     ts0 + fdt, ras_scr)
            u = [
                a + sixth * (x1 + 2.0 * x2 + 2.0 * x3 + x4)
                for a, x1, x2, x3, x4 in zip(u, k1, k2, k3, k4)
            ]
            # per-sub-step energy partials over this tile's OWNED interior
            # rows; use select (where), not multiply: ghost rows of the
            # input buffer are never written and may hold NaN
            # (NaN * 0 == NaN would poison the sum)
            zero = jnp.zeros_like(u[0])
            u_tot = jnp.where(owned, u[0], zero)
            u_inc = jnp.where(owned, u[6], zero)
            e_ref[e_row, 4 * st + 0] = jnp.sum(u_tot * u_tot)
            e_ref[e_row, 4 * st + 1] = jnp.sum(u_inc * u_inc)
            sc = u_tot - u_inc
            e_ref[e_row, 4 * st + 2] = jnp.sum(sc * sc)
            e_ref[e_row, 4 * st + 3] = 0.0

        # separate output scratch: writing back into u_scr was measured 26%
        # slower — it forces the next tile's input DMA to serialize against
        # this tile's output DMA instead of overlapping
        u_new = [x * fvalid for x in u]
        for ch in range(12):
            o_scr[ch] = u_new[ch]
        cp_out = pltpu.make_async_copy(
            o_scr.at[:, pl.ds(ghost, tile_interior), :],
            out_hbm.at[b, :, pl.ds(row0 + ghost, tile_interior), :] if batch
            else out_hbm.at[:, pl.ds(row0 + ghost, tile_interior), :],
            sem_out,
        )
        cp_out.start()
        cp_out.wait()

    e_rows = (batch or 1) * n_tiles
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # scalars, cyl
        grid=(n_tiles, batch) if batch else (n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # u_hbm
            pl.BlockSpec(memory_space=pltpu.VMEM),  # shape (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # prof_x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # prof_y
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # u_out
            pl.BlockSpec(
                (e_rows, 4 * steps_per_call), lambda *_: (0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((12, rows, py), jnp.float32),  # state in
            pltpu.VMEM((12, rows, py), jnp.float32),  # state out
            # rasterization scratch: [csum, inside] general mode,
            # [best_gap, d2, r1, dr, c1, dc] radii_only mode
            pltpu.VMEM((6 if radii_only else 2, rows, py), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    state_shape = ((batch, 12, px, py) if batch else (12, px, py))
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(state_shape, jnp.float32),
            jax.ShapeDtypeStruct((e_rows, 4 * steps_per_call), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary") if batch
            else ("arbitrary",),
            # do NOT raise vmem_limit_bytes: lifting the 16 MB scoped cap to
            # 100 MB let tiles >=64 compile but cost ~24% at tile 48 too
            # (Mosaic allocates past physical VMEM and spills), and the
            # larger tiles measured slower than 48 anyway
        ),
    )

    def step(u_pad, shape_pad, prof_x, prof_y, scalars, cyl):
        """Advance steps_per_call steps; energies (steps_per_call, 3)
        — or ((batch, ...), (batch, steps_per_call, 3)) when batched."""
        u_next, partials = call(scalars, cyl, u_pad, shape_pad, prof_x, prof_y)
        if batch:
            e = partials.reshape(batch, n_tiles, steps_per_call, 4)[..., :3]
            return u_next, jnp.sum(e, axis=1)
        e = partials.reshape(n_tiles, steps_per_call, 4)[:, :, :3]
        return u_next, jnp.sum(e, axis=0)

    return step
