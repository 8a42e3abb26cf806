"""Astrophysical observables: disk thermodynamics, redshift, shadow, spectra.

Capability parity with reference gravitas-core/src/physics/ and quantum/.
"""

from blackhole_simulation_tpu.physics.disk import (
    circular_orbit_energy,
    circular_orbit_angular_momentum,
    circular_orbit_omega,
    page_thorne_flux,
    disk_temperature,
    generate_temperature_lut,
    temperature_profile,
)
from blackhole_simulation_tpu.physics.redshift import (
    gravitational_factor,
    doppler_factor,
    kerr_g_factor,
    combined_redshift,
    intensity_scaling,
)
from blackhole_simulation_tpu.physics.shadow import (
    bardeen_shadow,
    schwarzschild_shadow_radius,
    shadow_critical_params,
    magnification,
    magnification_point_lens,
    einstein_angle,
)
from blackhole_simulation_tpu.physics.spectrum import (
    planck_law,
    integrate_planck_xyz,
    xyz_to_linear_rgb,
    blackbody_rgb,
    generate_blackbody_lut,
)
from blackhole_simulation_tpu.physics.hawking import hawking_temperature

__all__ = [
    "circular_orbit_energy",
    "circular_orbit_angular_momentum",
    "circular_orbit_omega",
    "page_thorne_flux",
    "disk_temperature",
    "generate_temperature_lut",
    "temperature_profile",
    "gravitational_factor",
    "doppler_factor",
    "kerr_g_factor",
    "combined_redshift",
    "intensity_scaling",
    "bardeen_shadow",
    "schwarzschild_shadow_radius",
    "shadow_critical_params",
    "magnification",
    "magnification_point_lens",
    "einstein_angle",
    "planck_law",
    "integrate_planck_xyz",
    "xyz_to_linear_rgb",
    "blackbody_rgb",
    "generate_blackbody_lut",
    "hawking_temperature",
]
