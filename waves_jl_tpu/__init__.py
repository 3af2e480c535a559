"""waves_jl_tpu: a TPU-native (JAX/XLA/Pallas) framework with the
capabilities of gladisor/Waves.jl — differentiable 2D acoustic FDTD with PML,
a design/action system of cylindrical scatterers, an RL-style environment,
latent surrogate models (numerically-integrated latent PDE, neural ODE,
PINN), training, and model-predictive control.

Pure-functional core: state is threaded explicitly, PRNG via keys, hot loops
are single fused `lax.scan` programs, gradients via `jax.grad` +
`jax.checkpoint`, scale-out via `shard_map` over device meshes.
"""

from .constants import AIR, ALUMINIUM, BRASS, COPPER, DESIGN_SPEED, WATER
from .dims import (
    OneDim,
    ThreeDim,
    TwoDim,
    build_dirichlet,
    build_grid,
    build_wave,
    get_dx,
    get_dy,
    get_dz,
    one_dim,
    one_dim_spacing,
    three_dim,
    two_dim,
    two_dim_spacing,
)
from .ops.fd import fd_dx, fd_dy, fd_grad_1d, gradient_matrix, laplacian_matrix
from .ops.metrics import circle_mask, displacement, energy, flux
from .ops.pml import build_pml
from .utils.gaussians import build_normal
from .utils.interp import LinearInterpolation, flatten_repeated_last_dim, linear_interp
from .physics.dynamics import (
    AcousticDynamics1D,
    AcousticDynamics2D,
    AcousticDynamics3D,
    Integrator,
    acoustic_rhs_2d,
    acoustic_rhs_3d,
    build_tspan,
    make_acoustic_dynamics_1d,
    make_acoustic_dynamics_2d,
    make_acoustic_dynamics_3d,
    runge_kutta,
)
from .designs import (
    AdjustablePositionScatterers,
    AdjustableRadiiScatterers,
    Cloak,
    Cylinders,
    DesignInterpolator,
    DesignSpace,
    NoDesign,
    SpeedField,
    build_action_space,
    build_radii_design_space,
    build_rectangular_grid_design_space,
    build_simple_radii_design_space,
    build_triple_ring_design_space,
    hexagon_ring,
    location_mask,
    normalize_design,
    speed,
    stack_cylinders,
)
from .sources import GaussianSource, NoSource, Source

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy submodule access (w.models, w.train, ... without eager imports
    of matplotlib/optax at package import time)."""
    if name in ("models", "train", "control", "parallel", "viz", "data", "env",
                "native", "physics", "ops", "utils"):
        import importlib

        return importlib.import_module("." + name, __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
