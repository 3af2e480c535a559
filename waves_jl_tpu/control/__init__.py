from .mpc import (
    OracleShooting,
    GradientShooting,
    RandomShooting,
    make_mpc_episode_fused,
    build_action_sequence,
    compute_action_cost,
)
