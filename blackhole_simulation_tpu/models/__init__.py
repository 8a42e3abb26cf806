"""Model families: the Neural Radiance Surrogate (NRS).

Capability parity with the reference's legacy NRS trainer
(physics-engine/_legacy_src/training.rs:14-80 + shaders/compute/mlp.wgsl):
an MLP surrogate trained against the geodesic integrator to predict
(deflection, time delay, redshift) from (impact parameter, inclination,
spin), used to skip the march for far-field rays.
"""

from blackhole_simulation_tpu.models.nrs import (
    NRS_HIDDEN,
    NRS_LAYERS,
    generate_training_data,
    nrs_apply,
    nrs_init,
    nrs_flat_weights,
    nrs_from_flat,
    train_nrs,
)

__all__ = [
    "NRS_HIDDEN",
    "NRS_LAYERS",
    "generate_training_data",
    "nrs_apply",
    "nrs_init",
    "nrs_flat_weights",
    "nrs_from_flat",
    "train_nrs",
]
