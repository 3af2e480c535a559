from .plot import (
    make_plots_acoustic,
    plot_energy,
    plot_field,
    plot_predicted_energy,
    render_latent_solution,
    render_line_video,
    render_video,
)
