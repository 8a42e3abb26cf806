"""Host-side utilities: validation, error tracking, caching, idle detection.

Twin of the reference's src/utils/ bundle (validation.ts clampAndValidate,
errorTracking.ts ErrorTracker, cpu-optimizations.ts PhysicsCache / debounce
/ IdleDetector, device-detection.ts) — the pieces of the runtime that stay
on the host around the jitted device programs.
"""

from blackhole_simulation_tpu.utils.cache import PhysicsCache, Debouncer, IdleDetector
from blackhole_simulation_tpu.utils.device import detect_device, recommend_preset
from blackhole_simulation_tpu.utils.errors import ErrorTracker
from blackhole_simulation_tpu.utils.validate import clamp_and_validate, is_finite_state

__all__ = [
    "PhysicsCache",
    "Debouncer",
    "IdleDetector",
    "detect_device",
    "recommend_preset",
    "ErrorTracker",
    "clamp_and_validate",
    "is_finite_state",
]
