"""Visualization: episode videos, energy plots, latent dashboards.

TPU-native re-design of reference `src/plot.jl` + per-model `make_plots`:
fields are computed on device and pulled to host once; rendering is
matplotlib (+ffmpeg via matplotlib.animation when available, falling back
to a stack of PNG frames).
"""
from __future__ import annotations

import os

import numpy as np

from ..constants import FRAMES_PER_SECOND


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_energy(tspan, signal, path: str, title: str = "Energy Signals in Real Dynamics"):
    """Episode energy plot (reference `visualize`, `src/plot.jl:68-81`)."""
    plt = _plt()
    fig, ax = plt.subplots()
    ax.plot(tspan, signal[:, 0], color="blue", label="Total")
    ax.plot(tspan, signal[:, 1], color="orange", label="Incident")
    ax.plot(tspan, signal[:, 2], color="green", label="Scattered")
    ax.set_title(title)
    ax.set_xlabel("Time (s)")
    ax.set_ylabel("Energy")
    ax.legend(loc="lower right")
    fig.savefig(path, dpi=120)
    plt.close(fig)


def plot_predicted_energy(tspan, true_energy, pred_energy, title: str, path: str):
    """(reference `plot_predicted_energy`, `src/plot.jl:83-89`)."""
    plt = _plt()
    fig, ax = plt.subplots()
    ax.plot(tspan, true_energy, color="blue", label="True")
    ax.plot(tspan, pred_energy, color="orange", label="Predicted")
    ax.set_title(title)
    ax.set_xlabel("Time (s)")
    ax.set_ylabel("Energy")
    ax.legend()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def plot_field(field, extent, path: str, design=None, bound: float = 1.0, energy: bool = False):
    """One heatmap frame with optional design overlay."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 6))
    _draw_frame(ax, np.asarray(field), extent, design, bound, energy)
    fig.savefig(path, dpi=120)
    plt.close(fig)


def _draw_frame(ax, field, extent, design, bound, energy):
    if energy:
        ax.imshow(
            (field**2).T, origin="lower", extent=extent, cmap="cividis",
            vmin=0.0, vmax=bound, aspect="equal",
        )
    else:
        ax.imshow(
            field.T, origin="lower", extent=extent, cmap="RdBu",
            vmin=-bound, vmax=bound, aspect="equal",
        )
    if design is not None:
        _draw_design(ax, design)
    ax.set_xlabel("Space (m)")
    ax.set_ylabel("Space (m)")


def _draw_design(ax, design):
    from matplotlib.patches import Circle

    from ..designs import design_to_circles

    for (x, y, r) in design_to_circles(design):
        ax.add_patch(Circle((x, y), r, color="gray"))



def _save_animation(anim, fig, path, fps, draw, n_frames):
    """ffmpeg mp4 -> Pillow gif -> PNG-frame directory fallback chain."""
    try:
        anim.save(path, fps=fps, writer="ffmpeg")
        return path
    except Exception:
        pass
    try:
        gif = os.path.splitext(path)[0] + ".gif"
        anim.save(gif, fps=min(fps, 12), writer="pillow")
        return gif
    except Exception:
        pass
    base, _ = os.path.splitext(path)
    os.makedirs(base, exist_ok=True)
    step = max(1, n_frames // 60)
    for i in range(0, n_frames, step):
        draw(i)
        fig.savefig(f"{base}/frame_{i:04d}.png", dpi=100)
    return base


def render_video(
    frames,
    extent,
    path: str,
    designs=None,
    fps: int = FRAMES_PER_SECOND,
    bound: float = 1.0,
    energy: bool = False,
):
    """Render (T, nx, ny) frames to an mp4 (or PNG frames if no ffmpeg).

    Equivalent of reference `render!` (`src/plot.jl:5-66`).
    """
    plt = _plt()
    import matplotlib.animation as animation

    frames = np.asarray(frames)
    fig, ax = plt.subplots(figsize=(6, 6))

    def draw(i):
        ax.clear()
        d = None if designs is None else designs[i]
        _draw_frame(ax, frames[i], extent, d, bound, energy)
        return []

    anim = animation.FuncAnimation(fig, draw, frames=len(frames), blit=False)
    out = _save_animation(anim, fig, path, fps, draw, len(frames))
    plt.close(fig)
    return out


def render_latent_solution(latent_x, z, path_dir: str):
    """Latent scattered field video frames (reference
    `render_latent_solution!`, `src/model/acoustic_energy_model.jl:143-157`).
    z: (L, 4, E) single-sample latent trajectory."""
    z = np.asarray(z)
    sc = z[:, 0] - z[:, 2]
    render_line_video(latent_x, sc, os.path.join(path_dir, "sc.mp4"))


def render_line_video(x, ys, path: str, ylim=(-2.0, 2.0), fps: int = FRAMES_PER_SECOND):
    plt = _plt()
    import matplotlib.animation as animation

    x = np.asarray(x)
    ys = np.asarray(ys)
    fig, ax = plt.subplots()

    def draw(i):
        ax.clear()
        ax.set_xlim(x[0], x[-1])
        ax.set_ylim(*ylim)
        ax.plot(x, ys[i], color="blue")
        return []

    anim = animation.FuncAnimation(fig, draw, frames=len(ys), blit=False)
    out = _save_animation(anim, fig, path, fps, draw, len(ys))
    plt.close(fig)
    return out


def plot_latent_source(model, params, batch, path: str):
    """Heatmap of one period of the latent force function + its shape
    (reference `plot_latent_source`, `src/plot.jl:91-111`)."""
    import jax.numpy as jnp

    plt = _plt()
    _, (C, F, PML) = model.get_parameters_and_initial_condition(params, batch)
    dt = model.integrator.dt
    period = np.arange(0.0, 0.5 / model.source_freq + dt, dt, dtype=np.float32)
    f = np.stack([np.asarray(F(jnp.full((1,), t))[0]) for t in period], axis=0)
    latent_x = np.asarray(model.latent_dim.x)

    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(7, 7))
    hm = ax1.imshow(
        f.T, aspect="auto", origin="lower", cmap="cividis",
        extent=(period[0], period[-1], latent_x[0], latent_x[-1]),
    )
    ax1.set_title("One Period of Force Function")
    ax1.set_xlabel("Time (s)")
    ax1.set_ylabel("Space (m)")
    fig.colorbar(hm, ax=ax1)
    ax2.plot(latent_x, f[len(f) // 2])
    ax2.set_title("Shape of Force Function")
    ax2.set_xlabel("Space (m)")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def make_plots_node(model, params, batch, path: str, samples: int = 1):
    """Checkpoint dashboard for the NODE baseline (reference `make_plots`,
    `src/model/node.jl:71-82`): scattered-energy prediction plots."""
    os.makedirs(path, exist_ok=True)
    y_hat = np.asarray(model(params, batch))  # (B, L)
    y = np.asarray(batch["y"])
    t = np.asarray(batch["t"])
    for i in range(min(y.shape[0], samples)):
        plot_predicted_energy(
            t[i], y[i, :, 2], y_hat[i], title="Scattered Energy",
            path=os.path.join(path, f"sc{i + 1}.png"),
        )


def make_plots_pinn(model, params, batch, path: str, samples: int = 1,
                    video: bool = False):
    """Checkpoint dashboard for the PINN baseline (reference `make_plots`,
    `src/model/pinn.jl:326-370`): learned pml/force, predicted-vs-true
    energies; latent video opt-in (slow)."""
    os.makedirs(path, exist_ok=True)
    latent_x = np.asarray(model.latent_dim.x)
    if video:
        sol = np.asarray(model.generate_latent_solution(params, batch))  # (B,L,4,E)
        render_latent_solution(latent_x, sol[0], path)

    z0, f, pml, C = model.encode(params, batch)
    plt = _plt()
    for name, field in [("pml", pml), ("force", f)]:
        fig, ax = plt.subplots()
        ax.plot(latent_x, np.asarray(field[0]))
        fig.savefig(os.path.join(path, f"{name}.png"), dpi=120)
        plt.close(fig)

    y_hat = np.asarray(model(params, batch))
    y = np.asarray(batch["y"])
    t = np.asarray(batch["t"])
    for i in range(min(y.shape[0], samples)):
        for ch, name in [(0, "tot"), (1, "inc"), (2, "sc")]:
            plot_predicted_energy(
                t[i], y[i, :, ch], y_hat[i, :, ch],
                title={0: "Total", 1: "Incident", 2: "Scattered"}[ch] + " Energy",
                path=os.path.join(path, f"{name}{i + 1}.png"),
            )


def make_plots_acoustic(model, params, batch, path: str, samples: int = 1,
                        video: bool = False):
    """Checkpoint dashboard for the flagship model (reference `make_plots`,
    `src/model/acoustic_energy_model.jl:165-197`): learned PML, latent
    source shape, predicted-vs-true energies; latent video when
    video=True (matplotlib animation is slow — opt-in per checkpoint)."""
    import jax.numpy as jnp

    os.makedirs(path, exist_ok=True)
    latent_x = np.asarray(model.latent_dim.x)
    if video:
        z = np.asarray(model.generate_latent_solution(params, batch))  # (L,B,4,E)
        render_latent_solution(latent_x, z[:, 0], path)

    z0, (C, F, PML) = model.get_parameters_and_initial_condition(params, batch)
    plt = _plt()
    fig, ax = plt.subplots()
    ax.plot(latent_x, np.asarray(PML[0]))
    fig.savefig(os.path.join(path, "pml.png"), dpi=120)
    plt.close(fig)

    fig, ax = plt.subplots()
    ax.plot(latent_x, np.asarray(F.shape[0]))
    fig.savefig(os.path.join(path, "force.png"), dpi=120)
    plt.close(fig)

    y_hat = np.asarray(model(params, batch))
    y = np.asarray(batch["y"])
    t = np.asarray(batch["t"])
    for i in range(min(y.shape[0], samples)):
        for ch, name in [(0, "tot"), (1, "inc"), (2, "sc")]:
            plot_predicted_energy(
                t[i], y[i, :, ch], y_hat[i, :, ch],
                title={0: "Total", 1: "Incident", 2: "Scattered"}[ch] + " Energy",
                path=os.path.join(path, f"{name}{i + 1}.png"),
            )
