from .mpc import (
    GradientShooting,
    RandomShooting,
    build_action_sequence,
    compute_action_cost,
)
