"""Bardeen shadow (critical curve) and gravitational-lensing analytics.

Capability parity with reference gravitas-core/src/physics/shadow.rs:
spherical-photon-orbit critical impact parameters (shadow.rs:39-59), the full
shadow boundary (alpha, beta) sweep with beta^2 >= 0 masking and edge
clustering (shadow.rs:81-183), the Schwarzschild circle b = 3 sqrt(3) M
(shadow.rs:191-193), and lensing magnification / Einstein angle
(shadow.rs:218-254).

TPU-first: the sweep is one vectorized evaluation over a cosine-clustered
radius grid (dense near the prograde/retrograde photon-orbit edges where the
curve turns sharply — same clustering intent as the reference's root
bracketing); invalid points carry a validity mask instead of being dropped,
keeping shapes static for jit.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp

from blackhole_simulation_tpu.geometry.metrics import Kerr


def shadow_critical_params(m, a, r):
    """Chandrasekhar critical impact parameters of the spherical photon orbit
    at Boyer-Lindquist radius r (shadow.rs:39-59):

        xi(r)  = [M (r^2 - a^2) - r Delta] / [a (r - M)]
        eta(r) = r^3 [4 a^2 M - r (r - 3M)^2] / [a^2 (r - M)^2]

    Guarded for a -> 0 and r -> M (callers mask with beta^2 >= 0 anyway).
    """
    a_safe = jnp.where(jnp.abs(a) < 1e-8, 1e-8, a)
    delta = r * r - 2.0 * m * r + a_safe * a_safe
    rm = jnp.where(jnp.abs(r - m) < 1e-12, 1e-12, r - m)
    xi = (m * (r * r - a_safe * a_safe) - r * delta) / (a_safe * rm)
    eta = r**3 * (4.0 * a_safe * a_safe * m - r * (r - 3.0 * m) ** 2) / (
        a_safe * a_safe * rm * rm
    )
    return xi, eta


def schwarzschild_shadow_radius(m=1.0):
    """Critical impact parameter b_crit = 3 sqrt(3) M (shadow.rs:191-193)."""
    return 3.0 * jnp.sqrt(3.0) * jnp.asarray(m)


@partial(jnp.vectorize, excluded=(3,), signature="(),(),()->(n),(n),(n)")
def _bardeen_half(m, a, theta_obs, n):
    bh = Kerr(mass=m, spin=a)
    r_pro = bh.photon_sphere(prograde=True)
    r_ret = bh.photon_sphere(prograde=False)
    # Cosine clustering: dense sampling at both edges of the radius window,
    # where the critical curve turns sharply (shadow.rs:120-140 intent).
    ts = 0.5 * (1.0 - jnp.cos(jnp.linspace(0.0, jnp.pi, n)))
    rs = r_pro + (r_ret - r_pro) * ts
    xi, eta = shadow_critical_params(m, a, rs)
    s = jnp.sin(theta_obs)
    c = jnp.cos(theta_obs)
    s_safe = jnp.maximum(jnp.abs(s), 1e-8)
    alpha = -xi / s_safe
    beta_sq = eta + a * a * c * c - xi * xi * (c / s_safe) ** 2
    beta = jnp.sqrt(jnp.maximum(beta_sq, 0.0))
    return alpha, beta, beta_sq


def bardeen_shadow(m=1.0, a=0.0, theta_obs=jnp.pi / 2, n: int = 32):
    """Shadow boundary on the observer's sky: (alpha, beta, valid).

    Returns arrays of shape (2n,): the upper branch (+beta) followed by the
    reversed lower branch (-beta) — a closed polyline like the 64-point curve
    the reference streams into its SAB (gravitas-wasm/lib.rs:366-404).
    ``valid`` masks points where beta^2 >= 0 (real spherical orbits seen from
    this inclination). For a ~ 0 the curve degenerates to the analytic circle
    of radius 3 sqrt(3) M, which is substituted exactly.
    """
    m = jnp.asarray(m, dtype=jnp.result_type(float))
    a = jnp.asarray(a, dtype=m.dtype)
    theta_obs = jnp.asarray(theta_obs, dtype=m.dtype)
    alpha, beta, beta_sq = _bardeen_half(m, a, theta_obs, n)
    valid = beta_sq >= 0.0

    # Analytic a ~ 0 circle (shadow.rs:100-106): avoids the 0/0 in xi, eta.
    phi = jnp.linspace(0.0, jnp.pi, n)
    b0 = schwarzschild_shadow_radius(m)
    circ_alpha = b0 * jnp.cos(phi)
    circ_beta = b0 * jnp.sin(phi)
    near_schw = jnp.abs(a) < 1e-6
    alpha = jnp.where(near_schw, circ_alpha, alpha)
    beta = jnp.where(near_schw, circ_beta, beta)
    valid = jnp.where(near_schw, jnp.ones_like(valid), valid)

    # On-axis special case (shadow.rs on-axis branch): seen down the spin
    # axis the shadow is the circle through the xi = 0 spherical orbit,
    # radius sqrt(eta(r0) + a^2). Newton-solve r0^3 - 3M r0^2 + a^2 r0
    # + M a^2 = 0 (root -> 3M as a -> 0).
    r0 = 3.0 * m
    for _ in range(8):
        fval = r0**3 - 3.0 * m * r0**2 + a * a * r0 + m * a * a
        fp = 3.0 * r0**2 - 6.0 * m * r0 + a * a
        r0 = r0 - fval / fp
    _, eta0 = shadow_critical_params(m, a, r0)
    b_axis = jnp.sqrt(jnp.maximum(eta0 + a * a, 0.0))
    on_axis = jnp.abs(jnp.sin(theta_obs)) < 0.05
    alpha = jnp.where(on_axis & ~near_schw, b_axis * jnp.cos(phi), alpha)
    beta = jnp.where(on_axis & ~near_schw, b_axis * jnp.sin(phi), beta)
    valid = jnp.where(on_axis, jnp.ones_like(valid), valid)

    alpha_full = jnp.concatenate([alpha, alpha[::-1]], axis=-1)
    beta_full = jnp.concatenate([beta, -beta[::-1]], axis=-1)
    valid_full = jnp.concatenate([valid, valid[::-1]], axis=-1)
    return alpha_full, beta_full, valid_full


def magnification(solid_angle_image, solid_angle_source):
    """Lensing magnification as the solid-angle ratio (shadow.rs:218-230)."""
    return solid_angle_image / jnp.maximum(solid_angle_source, 1e-30)


def magnification_point_lens(u):
    """Point-lens total magnification mu(u) = (u^2+2)/(u sqrt(u^2+4))
    (shadow.rs:233-243); u = angular separation in Einstein radii."""
    u = jnp.asarray(u)
    u_safe = jnp.maximum(jnp.abs(u), 1e-12)
    return (u_safe * u_safe + 2.0) / (u_safe * jnp.sqrt(u_safe * u_safe + 4.0))


def einstein_angle(m, d_l, d_s):
    """Einstein ring angle theta_E = sqrt(4 M D_LS / (D_L D_S)) in geometric
    units (shadow.rs:246-254); scales as 1/sqrt(D) for d_s >> d_l."""
    d_ls = d_s - d_l
    return jnp.sqrt(jnp.maximum(4.0 * m * d_ls / (d_l * d_s), 0.0))
