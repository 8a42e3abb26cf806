"""Configuration system: parameter schema, physics constants, perf config.

Capability parity with reference src/configs/ (simulation.config.ts,
physics.config.ts, performance.config.ts) — a typed schema with ranges,
units, labels, presets, and quality->step-budget tables. Feature flags map
to static jit arguments (render.Features), reproducing the reference's
#define variant cache via the jit cache.
"""

from blackhole_simulation_tpu.configs.simulation import (
    PARAMETER_SCHEMA,
    PRESETS,
    QUALITY_RAY_STEPS,
    ParamSpec,
    SimulationParams,
    apply_preset,
    clamp_params,
    detect_preset,
    scene_from_params,
)
from blackhole_simulation_tpu.configs.physics import PHYSICS_CONSTANTS
from blackhole_simulation_tpu.configs.performance import PERFORMANCE_CONFIG

__all__ = [
    "PARAMETER_SCHEMA",
    "PRESETS",
    "QUALITY_RAY_STEPS",
    "ParamSpec",
    "SimulationParams",
    "apply_preset",
    "clamp_params",
    "detect_preset",
    "scene_from_params",
    "PHYSICS_CONSTANTS",
    "PERFORMANCE_CONFIG",
]
