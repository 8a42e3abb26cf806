"""Kretschmann curvature scalar fields.

Capability parity with reference gravitas-core/src/spacetime/curvature.rs:13-68:
the closed-form Kerr Kretschmann invariant, the Schwarzschild special case,
and an (r, theta, K) field generator for volumetric coloring.
"""

from __future__ import annotations

import jax.numpy as jnp

from blackhole_simulation_tpu.geometry.metrics import kerr_sigma


def kretschmann_kerr(m, a, r, theta):
    """K = R_{abcd} R^{abcd} for Kerr (curvature.rs:13-38):

    K = 48 M^2 (r^6 - 15 r^4 a^2 c^2 + 15 r^2 a^4 c^4 - a^6 c^6) / Sigma^6,
    c = cos(theta). Reduces to 48 M^2 / r^6 at a = 0.
    """
    c = jnp.cos(theta)
    ac = a * c
    r2 = r * r
    ac2 = ac * ac
    sig = kerr_sigma(a, r, theta)
    num = r2**3 - 15.0 * r2 * r2 * ac2 + 15.0 * r2 * ac2 * ac2 - ac2**3
    return 48.0 * m * m * num / sig**6


def kretschmann_schwarzschild(m, r):
    """K = 48 M^2 / r^6 (curvature.rs:41-44)."""
    return 48.0 * m * m / r**6


def curvature_field(m, a, r_grid, theta_grid):
    """Meshgrid field K(r, theta) -> (r, theta, K) arrays (curvature.rs:47-68)."""
    r, th = jnp.meshgrid(jnp.asarray(r_grid), jnp.asarray(theta_grid), indexing="ij")
    return r, th, kretschmann_kerr(m, a, r, th)
