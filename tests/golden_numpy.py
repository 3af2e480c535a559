"""Independent NumPy re-execution of the reference equations.

A deliberately naive, dense-matrix, loop-based implementation of the exact
equations in the reference (gladisor/Waves.jl `src/operators.jl`,
`src/pml.jl`, `src/dynamics.jl`) used as the golden oracle for the JAX
framework's solver-parity tests (BASELINE.md: <= 1e-5 relative field error).
Written from the equations, not ported code paths: operator matrices are
built row-by-row, the RHS mirrors the math in the paper/README.
"""
import numpy as np


def gradient_matrix_np(x):
    n = len(x)
    dx = (x[-1] - x[0]) / (n - 1)
    g = np.zeros((n, n), dtype=np.float32)
    g[0, 0:3] = [-3.0, 4.0, -1.0]
    g[-1, -3:] = [1.0, -4.0, 3.0]
    for i in range(1, n - 1):
        g[i, i - 1] = -1.0
        g[i, i + 1] = 1.0
    return g / (2.0 * dx)


def laplacian_matrix_np(x):
    n = len(x)
    dx = (x[-1] - x[0]) / (n - 1)
    l = np.zeros((n, n), dtype=np.float32)
    l[0, 0:4] = np.array([2.0, -5.0, 4.0, -1.0]) / dx**3
    l[-1, -4:] = np.array([-1.0, 4.0, -5.0, 2.0]) / dx**3
    for i in range(1, n - 1):
        l[i, i - 1 : i + 2] = np.array([1.0, -2.0, 1.0]) / dx**2
    return l.astype(np.float32)


def build_pml_1d_np(x, width, scale):
    ax = np.abs(x)
    start = min(ax[0], ax[-1]) - width
    pml = np.clip(np.maximum(ax - start, 0.0) / width, 0.0, 1.0)
    return (pml**3 * scale).astype(np.float32)


def build_pml_2d_np(x, ny, width, scale):
    ax = np.abs(x).astype(np.float64)
    start = ax[0] - width
    region = ax > start
    out = np.zeros_like(ax)
    out[region] = (ax[region] - ax[region].min()) / width
    out = out**3 * scale
    return np.repeat(out[:, None], ny, axis=1).astype(np.float32)


def dirichlet_2d_np(nx, ny):
    bc = np.ones((nx, ny), dtype=np.float32)
    bc[0, :] = bc[-1, :] = bc[:, 0] = bc[:, -1] = 0.0
    return bc


def acoustic_rhs_2d_np(x, c, f, G, pml, bc):
    """x: (nx, ny, 6). Derivatives: d/dx = G @ u, d/dy = (G @ u.T).T."""
    U, Vx, Vy, Px, Py, Om = [x[:, :, i] for i in range(6)]
    b = c**2
    sx = pml
    sy = pml.T
    Vxx = G @ Vx
    Vyy = (G @ Vy.T).T
    Ux = G @ (U + f)
    Uy = (G @ (U + f).T).T
    dU = b * (Vxx + Vyy) + Px + Py - (sx + sy) * U - Om
    dVx = Ux - sx * Vx
    dVy = Uy - sy * Vy
    dPx = b * sx * Vyy
    dPy = b * sy * Vxx
    dOm = sx * sy * U
    return np.stack([bc * dU, dVx, dVy, dPx, dPy, dOm], axis=-1).astype(np.float32)


def acoustic_rhs_12ch_np(x, c, c0, f, G, pml, bc):
    dtot = acoustic_rhs_2d_np(x[:, :, 0:6], c, f, G, pml, bc)
    dinc = acoustic_rhs_2d_np(x[:, :, 6:12], np.float32(c0), f, G, pml, bc)
    return np.concatenate([dtot, dinc], axis=-1)


def rk4_rollout_2d_np(u0, tspan, rhs, dt):
    """u0: (nx, ny, 12); rhs(u, t) -> du. Returns (T+1, nx, ny, 12)."""
    traj = [u0.astype(np.float32)]
    u = u0.astype(np.float32)
    for i in range(len(tspan) - 1):
        t = np.float32(tspan[i])
        k1 = rhs(u, t)
        k2 = rhs(u + 0.5 * dt * k1, t + 0.5 * dt)
        k3 = rhs(u + 0.5 * dt * k2, t + 0.5 * dt)
        k4 = rhs(u + dt * k3, t + dt)
        u = u + dt * (k1 + 2 * k2 + 2 * k3 + k4) / 6.0
        u = u.astype(np.float32)
        traj.append(u)
    return np.stack(traj, axis=0)


def acoustic_rhs_1d_np(x, c, f, sigma, c0, G, bc):
    """x: (E, 4) fields u_tot, v_tot, u_inc, v_inc."""
    u_tot, v_tot, u_inc, v_inc = x[:, 0], x[:, 1], x[:, 2], x[:, 3]
    du_tot = (c0 * c) * (G @ v_tot) - sigma * u_tot
    dv_tot = (c0 * c) * (G @ (u_tot + f)) - sigma * v_tot
    du_inc = c0 * (G @ v_inc) - sigma * u_inc
    dv_inc = c0 * (G @ (u_inc + f)) - sigma * v_inc
    return np.stack([du_tot * bc, dv_tot, du_inc * bc, dv_inc], axis=-1).astype(np.float32)
