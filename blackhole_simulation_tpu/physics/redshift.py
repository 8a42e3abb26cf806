"""Redshift g-factor suite: gravitational, special-relativistic, full Kerr.

Capability parity with reference gravitas-core/src/physics/redshift.rs:
static gravitational factor (redshift.rs:17-23), SR Doppler (32-35), the full
Cunningham-1975 Kerr g-factor for circular equatorial emitters (65-95), the
combined legacy approximation (103-113), and Liouville intensity scaling
g^4 / g^3 (126-132). All functions broadcast over leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp

from blackhole_simulation_tpu.geometry.metrics import kerr_delta, kerr_sigma
from blackhole_simulation_tpu.physics.disk import circular_orbit_omega


def gravitational_factor(r, m=1.0):
    """Static gravitational redshift g = sqrt(1 - r_s/r), r_s = 2M
    (redshift.rs:17-23). Clipped at 0 inside the horizon."""
    return jnp.sqrt(jnp.maximum(1.0 - 2.0 * m / r, 0.0))


def doppler_factor(beta, cos_theta):
    """Special-relativistic Doppler delta = 1 / (gamma (1 - beta cos theta))
    (redshift.rs:32-35)."""
    gamma = 1.0 / jnp.sqrt(jnp.maximum(1.0 - beta * beta, 1e-12))
    return 1.0 / (gamma * (1.0 - beta * cos_theta))


def kerr_g_factor(r, m=1.0, a=0.0, lam=0.0):
    """Cunningham (1975) g-factor for a circular equatorial Keplerian emitter.

    g = E_obs / E_emit = 1 / (u^t (1 - lam * Omega)) where lam = L_z/E is the
    photon impact parameter and u^t the emitter's time dilation, built from
    the exact equatorial Kerr metric components (redshift.rs:65-95).
    """
    r = jnp.asarray(r)
    theta = jnp.full_like(r, jnp.pi / 2)
    sig = kerr_sigma(jnp.asarray(a), r, theta)
    two_mr = 2.0 * m * r
    g_tt = -(1.0 - two_mr / sig)
    g_tph = -two_mr * a / sig
    g_phph = r * r + a * a + two_mr * a * a / sig
    omega = circular_orbit_omega(m, a, r)
    # u^t = 1 / sqrt(-(g_tt + 2 Omega g_tphi + Omega^2 g_phiphi))
    ut_inv_sq = -(g_tt + 2.0 * omega * g_tph + omega * omega * g_phph)
    u_t = 1.0 / jnp.sqrt(jnp.maximum(ut_inv_sq, 1e-12))
    return 1.0 / (u_t * (1.0 - lam * omega))


def combined_redshift(r, m=1.0, beta=0.0, cos_theta=0.0):
    """Legacy SR x gravitational approximation (redshift.rs:103-113)."""
    return gravitational_factor(r, m) * doppler_factor(beta, cos_theta)


def intensity_scaling(g, optically_thick: bool = True):
    """Liouville invariant: I_obs = g^4 I_emit (optically thick surface) or
    g^3 (optically thin integrated emissivity) (redshift.rs:126-132)."""
    return jnp.power(g, 4.0 if optically_thick else 3.0)
