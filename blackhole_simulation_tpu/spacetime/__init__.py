"""Spacetime-visualization fields: curvature, embeddings, frame drag, cones.

Capability parity with reference gravitas-core/src/spacetime/ — all pure
batched jnp functions feeding the volumetric-analytics outputs (the TPU
replacement for the reference's React-Three-Fiber overlays).
"""

from blackhole_simulation_tpu.spacetime.curvature import (
    kretschmann_kerr,
    kretschmann_schwarzschild,
    curvature_field,
)
from blackhole_simulation_tpu.spacetime.embedding import (
    flamm_height,
    kerr_embedding_height,
    proper_distance,
    embedding_mesh,
)
from blackhole_simulation_tpu.spacetime.frame_drag import (
    frame_dragging_omega,
    frame_drag_field,
    ergosphere_mesh,
)
from blackhole_simulation_tpu.spacetime.lightcone import light_cone_tilt, tilt_field

__all__ = [
    "kretschmann_kerr",
    "kretschmann_schwarzschild",
    "curvature_field",
    "flamm_height",
    "kerr_embedding_height",
    "proper_distance",
    "embedding_mesh",
    "frame_dragging_omega",
    "frame_drag_field",
    "ergosphere_mesh",
    "light_cone_tilt",
    "tilt_field",
]
