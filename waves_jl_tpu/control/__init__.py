from .mpc import (
    CEMShooting,
    EnsembleShooting,
    OracleShooting,
    GradientShooting,
    RandomShooting,
    make_hybrid_action_fused,
    make_mpc_episode_fused,
    make_oracle_action_fused,
    make_oracle_episode_fused,
    build_action_sequence,
    compute_action_cost,
    selection_tspan,
)
