from .episode import render_episode, rollout_fields
from .plot import (
    make_plots_acoustic,
    make_plots_node,
    make_plots_pinn,
    plot_latent_source,
    plot_energy,
    plot_field,
    plot_predicted_energy,
    render_latent_solution,
    render_line_video,
    render_video,
)
