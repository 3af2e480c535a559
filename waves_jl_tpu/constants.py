"""Material sound-speed constants.

Parity with reference `src/designs.jl:8-13` (gladisor/Waves.jl).
"""

ALUMINIUM = 3100.0
COPPER = 2260.0
BRASS = 2120.0
AIR = 344.0
WATER = 1531.0

DESIGN_SPEED = 3 * AIR

FRAMES_PER_SECOND = 24  # reference src/plot.jl:3
