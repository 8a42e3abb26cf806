"""Hamiltonian null-geodesic integration (the f64 oracle layer)."""

from blackhole_simulation_tpu.geodesic.state import (
    STATE_DIM,
    null_ray,
    pack_state,
    position,
    momentum,
)
from blackhole_simulation_tpu.geodesic.hamiltonian import state_derivative
from blackhole_simulation_tpu.geodesic.integrator import (
    IntegrationMethod,
    IntegrationOptions,
    rk4_step,
    rkf45_step,
    symplectic_step,
)
from blackhole_simulation_tpu.geodesic.invariants import (
    ConstantsOfMotion,
    constants_of_motion,
    hamiltonian,
    renormalize_null,
)
from blackhole_simulation_tpu.geodesic.integrate import (
    Trajectory,
    TERMINATION_NAMES,
    TERM_NONE,
    TERM_HORIZON,
    TERM_ESCAPE,
    TERM_MAX_STEPS,
    TERM_DISK,
    integrate,
    integrate_path,
)

__all__ = [
    "STATE_DIM",
    "null_ray",
    "pack_state",
    "position",
    "momentum",
    "state_derivative",
    "IntegrationMethod",
    "IntegrationOptions",
    "rk4_step",
    "rkf45_step",
    "symplectic_step",
    "ConstantsOfMotion",
    "constants_of_motion",
    "hamiltonian",
    "renormalize_null",
    "Trajectory",
    "TERMINATION_NAMES",
    "TERM_NONE",
    "TERM_HORIZON",
    "TERM_ESCAPE",
    "TERM_MAX_STEPS",
    "TERM_DISK",
    "integrate",
    "integrate_path",
]
