"""Conservation-law machinery: H, null renormalization, constants of motion.

Capability parity with reference gravitas-core/src/invariants/ (mod.rs:25-37
hamiltonian; renormalization.rs:13-45 quadratic p_r projection;
constants_of_motion.rs:8-61 E, L_z, Carter Q, Walker-Penrose proxy). All
batched over leading ray axes; NumericalAudit is replaced by autodiff-vs-FD
tests in tests/test_geometry.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


def hamiltonian(y: jnp.ndarray, metric) -> jnp.ndarray:
    """H = 1/2 g^{mu nu} p_mu p_nu for state y: (...,8) -> (...)."""
    return metric.hamiltonian(y[..., 1], y[..., 2], y[..., 4:])


def renormalize_null(y: jnp.ndarray, metric) -> jnp.ndarray:
    """Project p_r onto the null surface H = 0.

    Solves A p_r^2 + B p_r + C = 0 with
      A = g^rr,  B = 2 (g^tr p_t + g^rphi p_phi),
      C = g^tt p_t^2 + g^thth p_th^2 + g^phph p_ph^2 + 2 g^tph p_t p_ph,
    choosing the root nearest the current p_r (preserves ray direction).
    Rays where the discriminant is negative or A ~ 0 are left unchanged.
    """
    r, theta = y[..., 1], y[..., 2]
    p_t, p_r, p_th, p_ph = y[..., 4], y[..., 5], y[..., 6], y[..., 7]
    g = metric.contravariant(r, theta)
    a_quad = g[..., 1, 1]
    b_quad = 2.0 * (g[..., 0, 1] * p_t + g[..., 1, 3] * p_ph)
    c_quad = (
        g[..., 0, 0] * p_t * p_t
        + g[..., 2, 2] * p_th * p_th
        + g[..., 3, 3] * p_ph * p_ph
        + 2.0 * g[..., 0, 3] * p_t * p_ph
    )
    disc = b_quad * b_quad - 4.0 * a_quad * c_quad
    valid = (disc >= 0.0) & (jnp.abs(a_quad) > 1e-12)
    # Safe-where: sqrt sees a strictly positive argument on invalid lanes so
    # its (masked-out) gradient stays finite — sqrt'(0) = inf would otherwise
    # poison the backward pass through the 0 * inf = NaN route.
    sqrt_d = jnp.sqrt(jnp.where(valid, jnp.maximum(disc, 1e-30), 1.0))
    denom = jnp.where(valid, 2.0 * a_quad, 1.0)
    sol1 = (-b_quad + sqrt_d) / denom
    sol2 = (-b_quad - sqrt_d) / denom
    nearest = jnp.where(jnp.abs(sol1 - p_r) < jnp.abs(sol2 - p_r), sol1, sol2)
    new_pr = jnp.where(valid, nearest, p_r)
    return y.at[..., 5].set(new_pr)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["energy", "angular_momentum", "carter_constant", "hamiltonian", "walker_penrose"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class ConstantsOfMotion:
    energy: jnp.ndarray
    angular_momentum: jnp.ndarray
    carter_constant: jnp.ndarray
    hamiltonian: jnp.ndarray
    walker_penrose: jnp.ndarray  # complex


def constants_of_motion(y: jnp.ndarray, metric) -> ConstantsOfMotion:
    """E = -p_t, L_z = p_phi, Carter Q, H, and the complex WP-style invariant.

    Q = p_theta^2 + cos^2(theta) (L_z^2/sin^2(theta) - a^2 E^2) for null rays.
    The walker_penrose field follows the reference's simplified proxy
    (constants_of_motion.rs:52-54): (r + i a cos(theta)) * sqrt(max(Q, 0)) —
    |WP|^2 tracks Q conservation; the phase tracks the principal-null-frame
    rotation.
    """
    r, theta = y[..., 1], y[..., 2]
    p_t, p_th, p_ph = y[..., 4], y[..., 6], y[..., 7]
    a = getattr(metric, "spin", jnp.zeros(()))
    energy = -p_t
    lz = p_ph
    c, s = jnp.cos(theta), jnp.sin(theta)
    s2 = s * s
    lz_term = jnp.where(s2 < 1e-12, 0.0, lz * lz / jnp.maximum(s2, 1e-12))
    carter = p_th * p_th + c * c * (lz_term - a * a * energy * energy)
    h = hamiltonian(y, metric)
    wp = (r + 1j * a * c) * jnp.sqrt(jnp.maximum(carter, 0.0))
    return ConstantsOfMotion(
        energy=energy,
        angular_momentum=lz,
        carter_constant=carter,
        hamiltonian=h,
        walker_penrose=wp,
    )
