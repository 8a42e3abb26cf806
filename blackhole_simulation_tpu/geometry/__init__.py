"""Metric tensors, charts, and derived geometry for Kerr spacetimes."""

from blackhole_simulation_tpu.geometry.metrics import (
    Kerr,
    Metric,
    Minkowski,
    Schwarzschild,
    BL,
    KS,
)
from blackhole_simulation_tpu.geometry.tensor import (
    christoffel,
    contract,
    determinant,
    raise_index,
)
from blackhole_simulation_tpu.geometry import radii

__all__ = [
    "Kerr",
    "Metric",
    "Minkowski",
    "Schwarzschild",
    "BL",
    "KS",
    "christoffel",
    "contract",
    "determinant",
    "raise_index",
    "radii",
]
