"""Light-cone tilt fields from the covariant metric.

Capability parity with reference gravitas-core/src/spacetime/lightcone.rs:18-73:
diagonal-chart tilt atan(sqrt(-g_tt/g_rr)); non-diagonal (Kerr-Schild) tilt
from the null slopes dr/dt = (-g_tr +- sqrt(g_tr^2 - g_tt g_rr)) / g_rr; and
an (r, theta, tilt) field generator.
"""

from __future__ import annotations

import jax.numpy as jnp


def light_cone_tilt(metric, r, theta):
    """Tilt angle of the local light cone in the (t, r) plane.

    Diagonal charts (g_tr = 0): tilt = atan(sqrt(-g_tt / g_rr)), -> pi/4 in
    flat space and 0 at the horizon where -g_tt -> 0 (cone closes up).
    Non-diagonal charts: the two null slopes dr/dt give an asymmetric cone;
    the tilt reported is the half-opening atan(|s+ - s-| / 2).
    """
    g = metric.covariant(jnp.asarray(r), jnp.asarray(theta))
    g_tt, g_tr, g_rr = g[..., 0, 0], g[..., 0, 1], g[..., 1, 1]
    diag = jnp.abs(g_tr) < 1e-12
    # Diagonal branch.
    ratio = jnp.maximum(-g_tt, 0.0) / jnp.maximum(g_rr, 1e-12)
    tilt_diag = jnp.arctan(jnp.sqrt(ratio))
    # Null slopes branch: g_rr s^2 + 2 g_tr s + g_tt = 0 (lightcone.rs:40-60).
    disc = jnp.maximum(g_tr * g_tr - g_tt * g_rr, 0.0)
    denom = jnp.where(jnp.abs(g_rr) < 1e-12, 1e-12, g_rr)
    s_plus = (-g_tr + jnp.sqrt(disc)) / denom
    s_minus = (-g_tr - jnp.sqrt(disc)) / denom
    tilt_skew = jnp.arctan(0.5 * jnp.abs(s_plus - s_minus))
    return jnp.where(diag, tilt_diag, tilt_skew)


def tilt_field(metric, r_grid, theta_grid):
    """Meshgrid field tilt(r, theta) -> (r, theta, tilt) (lightcone.rs:63-73)."""
    r, th = jnp.meshgrid(jnp.asarray(r_grid), jnp.asarray(theta_grid), indexing="ij")
    return r, th, light_cone_tilt(metric, r, th)
