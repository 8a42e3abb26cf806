"""NaN-safe clamping and state validation (src/utils/validation.ts).

``clamp_and_validate`` is the scalar/array guard used at every host->device
parameter boundary; ``is_finite_state`` is the camera/state rollback check
(gravitas-wasm camera.rs:36-38) in host form.
"""

from __future__ import annotations

import math
from typing import Iterable

import numpy as np


def clamp_and_validate(
    value: float,
    lo: float,
    hi: float,
    default: float | None = None,
) -> float:
    """Clamp to [lo, hi]; non-finite input returns ``default`` (or the
    midpoint when no default is given) — validation.ts clampAndValidate."""
    if default is None:
        default = 0.5 * (lo + hi)
    try:
        v = float(value)
    except (TypeError, ValueError):
        return default
    if not math.isfinite(v):
        return default
    return min(max(v, lo), hi)


def clamp_array(values, lo: float, hi: float, default: float = 0.0) -> np.ndarray:
    """Vector form: NaN/Inf entries replaced by ``default``, rest clamped."""
    arr = np.asarray(values, dtype=np.float64)
    out = np.where(np.isfinite(arr), np.clip(arr, lo, hi), default)
    return out


def is_finite_state(values: Iterable[float]) -> bool:
    """True iff every component is finite (the rollback predicate)."""
    return all(math.isfinite(float(v)) for v in values)
