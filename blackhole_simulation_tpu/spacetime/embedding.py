"""Embedding diagrams: Flamm paraboloid, Kerr funnel, proper distances.

Capability parity with reference gravitas-core/src/spacetime/embedding.rs:14-111:
Flamm height z = 2 sqrt(r_s (r - r_s)), the Kerr embedding integral
Int sqrt(|g_rr - 1|) dr, proper radial distance Int sqrt(g_rr) dr, and a flat
xyz 3-D embedding mesh.

TPU-first: the reference's midpoint-rule loops become vectorized cumulative
trapezoids over a static radial grid.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from blackhole_simulation_tpu.geometry.metrics import kerr_delta, kerr_sigma


def flamm_height(r, m=1.0):
    """Flamm paraboloid z(r) = 2 sqrt(r_s (r - r_s)), r_s = 2M
    (embedding.rs:14-24). Zero inside the horizon."""
    rs = 2.0 * m
    return 2.0 * jnp.sqrt(rs * jnp.maximum(r - rs, 0.0))


def _g_rr_equatorial(m, a, r):
    """BL g_rr = Sigma / Delta on the equator, guarded outside the horizon."""
    sig = kerr_sigma(a, r, jnp.pi / 2)
    delta = kerr_delta(m, a, r)
    return sig / jnp.maximum(delta, 1e-9)


@partial(jax.jit, static_argnames=("n",))
def kerr_embedding_height(r, m=1.0, a=0.0, n: int = 256):
    """Equatorial Kerr embedding z(r) = Int_{r+}^{r} sqrt(|g_rr - 1|) dr'
    (embedding.rs:31-58), cumulative trapezoid from the horizon outward."""
    m = jnp.asarray(m)
    a = jnp.asarray(a)
    r = jnp.asarray(r)
    r_plus = m + jnp.sqrt(jnp.maximum(m * m - a * a, 0.0))
    r0 = r_plus * (1.0 + 1e-6)
    r_hi = jnp.maximum(jnp.max(r), r0 * 2.0)
    grid = r0 + (r_hi - r0) * jnp.linspace(0.0, 1.0, n) ** 2  # dense near horizon
    integrand = jnp.sqrt(jnp.abs(_g_rr_equatorial(m, a, grid) - 1.0))
    panels = 0.5 * (integrand[1:] + integrand[:-1]) * jnp.diff(grid)
    cum = jnp.concatenate([jnp.zeros((1,), grid.dtype), jnp.cumsum(panels)])
    return jnp.interp(r, grid, cum)


@partial(jax.jit, static_argnames=("n",))
def proper_distance(r_from, r_to, m=1.0, a=0.0, n: int = 256):
    """Proper radial distance Int sqrt(g_rr) dr on the equator
    (embedding.rs:61-80), vectorized trapezoid."""
    grid = jnp.linspace(jnp.asarray(r_from), jnp.asarray(r_to), n)
    integrand = jnp.sqrt(_g_rr_equatorial(jnp.asarray(m), jnp.asarray(a), grid))
    return jnp.trapezoid(integrand, grid, axis=0)


def embedding_mesh(m=1.0, a=0.0, n_r: int = 48, n_phi: int = 64, r_max=20.0):
    """3-D embedding funnel mesh as flat xyz float32 vertices
    (embedding.rs:83-111): rings of radius r at height -z(r)."""
    m = jnp.asarray(m)
    a = jnp.asarray(a)
    r_plus = m + jnp.sqrt(jnp.maximum(m * m - a * a, 0.0))
    rs = r_plus * (1.0 + 1e-4) + (r_max * m - r_plus) * jnp.linspace(0.0, 1.0, n_r) ** 1.5
    z = kerr_embedding_height(rs, m, a)
    phi = jnp.linspace(0.0, 2.0 * jnp.pi, n_phi)
    x = rs[:, None] * jnp.cos(phi)[None, :]
    y = rs[:, None] * jnp.sin(phi)[None, :]
    zz = -jnp.broadcast_to(z[:, None], x.shape)
    return jnp.stack([x, y, zz], axis=-1).reshape(-1, 3).astype(jnp.float32)
