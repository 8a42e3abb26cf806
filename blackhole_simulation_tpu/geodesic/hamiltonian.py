"""Hamilton's equations for null geodesics.

dx^mu/dlambda = g^{mu nu} p_nu
dp_mu/dlambda = -dH/dx^mu   (only r, theta components are nonzero: t and phi
                             are Killing directions, so p_t and p_phi are
                             exactly conserved)

Parity with reference gravitas-core/src/geodesic/hamiltonian.rs:13-35, batched
over leading ray axes.
"""

from __future__ import annotations

import jax.numpy as jnp

from blackhole_simulation_tpu.geometry.tensor import raise_index


def state_derivative(metric, y: jnp.ndarray) -> jnp.ndarray:
    """dy/dlambda for state y: (..., 8) -> (..., 8)."""
    r = y[..., 1]
    theta = y[..., 2]
    p = y[..., 4:]
    g_inv = metric.contravariant(r, theta)
    dx = raise_index(g_inv, p)
    dh_dr, dh_dth = metric.hamiltonian_derivatives(r, theta, p)
    zeros = jnp.zeros_like(dh_dr)
    dp = jnp.stack([zeros, -dh_dr, -dh_dth, zeros], axis=-1)
    return jnp.concatenate([dx, dp], axis=-1)
