"""Hawking temperature of a Kerr black hole.

Capability parity with reference gravitas-core/src/quantum/hawking.rs:14-32:
surface gravity kappa = (r+ - r-) / (2 (r+^2 + a^2)) in geometric units, then
T_H = hbar c^3 kappa_geom / (2 pi k_B G M_geom) converted through SI.
"""

from __future__ import annotations

import jax.numpy as jnp

from blackhole_simulation_tpu.constants import C_SI, G_SI, HBAR, K_B, M_SUN


def surface_gravity(m, a):
    """kappa = (r+ - r-) / (2 (r+^2 + a^2)), geometric units (1/M)."""
    m = jnp.asarray(m)
    a = jnp.asarray(a)
    root = jnp.sqrt(jnp.maximum(m * m - a * a, 0.0))
    r_plus = m + root
    r_minus = m - root
    return (r_plus - r_minus) / (2.0 * (r_plus * r_plus + a * a))


def hawking_temperature(mass_solar, a_star=0.0):
    """Hawking temperature in kelvin for a hole of ``mass_solar`` solar
    masses and dimensionless spin a* (hawking.rs:14-32).

    kappa_SI = kappa_geom * c^4 / (G M_SI); T_H = hbar kappa_SI / (2 pi k_B c).
    Schwarzschild limit: T_H = hbar c^3 / (8 pi G M k_B) ~ 6.17e-8 K / M_sun.
    """
    m_si = jnp.asarray(mass_solar) * M_SUN
    kappa_geom = surface_gravity(1.0, jnp.asarray(a_star))  # per unit M
    kappa_si = kappa_geom * C_SI**4 / (G_SI * m_si)
    return HBAR * kappa_si / (2.0 * jnp.pi * K_B * C_SI)
