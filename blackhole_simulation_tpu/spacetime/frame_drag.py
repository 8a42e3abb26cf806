"""Frame-dragging (ZAMO) fields and the ergosphere surface.

Capability parity with reference gravitas-core/src/spacetime/frame_drag.rs:13-69:
omega(r, theta) field and the ergosphere mesh r_E(theta) = M +
sqrt(M^2 - a^2 cos^2 theta) as flat xyz vertices.
"""

from __future__ import annotations

import jax.numpy as jnp

from blackhole_simulation_tpu.geometry.metrics import Kerr


def frame_dragging_omega(m, a, r, theta):
    """ZAMO angular velocity omega = -g_tphi/g_phiphi (frame_drag.rs:13-30)."""
    return Kerr(mass=jnp.asarray(m), spin=jnp.asarray(a)).frame_dragging(r, theta)


def frame_drag_field(m, a, r_grid, theta_grid):
    """Meshgrid field omega(r, theta) -> (r, theta, omega) (frame_drag.rs:33-50)."""
    r, th = jnp.meshgrid(jnp.asarray(r_grid), jnp.asarray(theta_grid), indexing="ij")
    return r, th, frame_dragging_omega(m, a, r, th)


def ergosphere_mesh(m=1.0, a=0.9, n_theta: int = 32, n_phi: int = 48):
    """Outer ergosurface as flat xyz float32 vertices (frame_drag.rs:53-69)."""
    bh = Kerr(mass=jnp.asarray(m), spin=jnp.asarray(a))
    th = jnp.linspace(1e-3, jnp.pi - 1e-3, n_theta)
    ph = jnp.linspace(0.0, 2.0 * jnp.pi, n_phi)
    r_e = bh.ergosphere(th)  # (n_theta,)
    sin_t, cos_t = jnp.sin(th), jnp.cos(th)
    x = (r_e * sin_t)[:, None] * jnp.cos(ph)[None, :]
    y = (r_e * sin_t)[:, None] * jnp.sin(ph)[None, :]
    z = jnp.broadcast_to((r_e * cos_t)[:, None], x.shape)
    return jnp.stack([x, y, z], axis=-1).reshape(-1, 3).astype(jnp.float32)
