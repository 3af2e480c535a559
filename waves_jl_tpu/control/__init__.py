from .mpc import (
    OracleShooting,
    GradientShooting,
    RandomShooting,
    build_action_sequence,
    compute_action_cost,
)
