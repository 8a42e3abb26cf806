"""Phase-space state layout for geodesics.

A geodesic state is a flat ``(..., 8)`` tensor: x^mu = (t, r, theta, phi)
followed by p_mu = (p_t, p_r, p_theta, p_phi) — the batched analogue of the
reference's GeodesicState (gravitas-core/src/geodesic/mod.rs:19-146). The
Butcher-tableau helpers there (`add_scaled*`) are unnecessary: states are
tensors, so `y + h * k` just works.
"""

from __future__ import annotations

import jax.numpy as jnp

STATE_DIM = 8

T, R, TH, PH = 0, 1, 2, 3       # position slots
PT, PR, PTH, PPH = 4, 5, 6, 7   # momentum slots


def pack_state(x: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Concatenate position (...,4) and momentum (...,4) into (...,8)."""
    return jnp.concatenate([x, p], axis=-1)


def position(y: jnp.ndarray) -> jnp.ndarray:
    return y[..., :4]


def momentum(y: jnp.ndarray) -> jnp.ndarray:
    return y[..., 4:]


def null_ray(x: jnp.ndarray, p_spatial: jnp.ndarray, metric) -> jnp.ndarray:
    """Construct a null ray at position x with spatial momentum (p_r,p_th,p_ph).

    Sets p_t = -1 (unit energy, matching GeodesicState::null_ray,
    geodesic/mod.rs) and projects p_r onto the H = 0 surface.
    """
    from blackhole_simulation_tpu.geodesic.invariants import renormalize_null

    x = jnp.asarray(x)
    p_spatial = jnp.asarray(p_spatial)
    p_t = -jnp.ones(x.shape[:-1] + (1,), dtype=x.dtype)
    p = jnp.concatenate([p_t, p_spatial], axis=-1)
    return renormalize_null(pack_state(x, p), metric)
