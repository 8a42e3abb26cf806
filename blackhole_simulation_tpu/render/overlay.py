"""Analytic Bardeen shadow-curve debug overlay.

The reference composites its 64-point analytic Bardeen critical curve over
the marched image as a thin distance-to-polyline line so the rendered shadow
edge can be compared against theory in-frame
(src/shaders/blackhole/fragment.glsl.ts:279-325, curve streamed from
gravitas-wasm/lib.rs:366-404). This is the TPU twin — and it is *exact*
rather than screen-approximate: each pixel's ray carries the conserved
(lambda, eta) = (L_z/E, Q/E^2) (invariants/constants_of_motion.rs:8-61), and
a pixel lies on the true shadow boundary iff its (lambda, eta) lies on the
critical curve — independent of camera distance. Both are mapped to Bardeen
celestial coordinates at the observer inclination

    alpha = -lambda / sin(theta_0)
    beta  = +-sqrt(eta + a^2 cos^2(theta_0) - lambda^2 cot^2(theta_0))

(shadow.rs:81-183's parameterization) and the overlay weight falls off with
the point-to-polyline distance in that plane.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from blackhole_simulation_tpu.physics.shadow import bardeen_shadow


def pixel_celestial_coords(y0: jnp.ndarray, a, theta_obs, dtype):
    """Per-ray Bardeen (alpha, beta, beta^2 deficit) from conserved quantities.

    ``y0``: (N, 8) theta-form KS state at the camera. beta's sign follows
    -p_theta (screen-up is -e_theta, render/camera.py). Where beta^2 < 0
    (no real spherical orbit at this lambda/inclination) beta folds to 0 and
    the deficit |beta^2| is returned so callers can add it to the squared
    distance instead of falsely placing the pixel on the equatorial axis.
    """
    a = jnp.asarray(a, dtype)
    th = y0[:, 2]
    pt, pth, pph = y0[:, 4], y0[:, 6], y0[:, 7]
    e = -pt
    inv_e = 1.0 / jnp.where(jnp.abs(e) < 1e-12, 1.0, e)
    lam = pph * inv_e
    s2 = jnp.maximum(jnp.sin(th) ** 2, 1e-12)
    c2 = jnp.cos(th) ** 2
    q = pth * pth + c2 * (pph * pph / s2 - a * a * pt * pt)
    eta = q * inv_e * inv_e

    s0 = jnp.sin(jnp.asarray(theta_obs, dtype))
    c0 = jnp.cos(jnp.asarray(theta_obs, dtype))
    s0 = jnp.where(jnp.abs(s0) < 1e-6, 1e-6, s0)
    alpha = -lam / s0
    beta_sq = eta + a * a * c0 * c0 - lam * lam * (c0 / s0) ** 2
    beta = jnp.sign(-pth) * jnp.sqrt(jnp.maximum(beta_sq, 0.0))
    deficit = jnp.maximum(-beta_sq, 0.0)
    return alpha, beta, deficit


def _polyline_distance_sq(px, py, deficit, cx, cy, valid):
    """Min squared distance from points (px, py) to the closed polyline
    (cx, cy) (K,), skipping segments with an invalid endpoint. The beta^2
    deficit adds to the squared distance (see pixel_celestial_coords).
    fori_loop over the K segments carries one (N,) running min — no (N, K)
    materialization (1 GB at 1080p x 64 points).
    """
    k = cx.shape[0]
    big = jnp.asarray(1e30, px.dtype)

    def seg(i, dmin):
        j = (i + 1) % k
        ax, ay = cx[i], cy[i]
        bx, by = cx[j], cy[j]
        ok = valid[i] & valid[j]
        dx, dy = bx - ax, by - ay
        len_sq = dx * dx + dy * dy
        t = ((px - ax) * dx + (py - ay) * dy) / jnp.maximum(len_sq, 1e-20)
        t = jnp.clip(t, 0.0, 1.0)
        ex = px - (ax + t * dx)
        ey = py - (ay + t * dy)
        d = ex * ex + ey * ey
        return jnp.minimum(dmin, jnp.where(ok, d, big))

    dmin = jnp.full(px.shape, big, px.dtype)
    dmin = jax.lax.fori_loop(0, k, seg, dmin)
    return dmin + deficit


def shadow_overlay(
    radiance: jnp.ndarray,
    y0: jnp.ndarray,
    bh,
    theta_obs,
    dtype=jnp.float32,
    n_pts: int = 32,
    line_width=None,
    color=(0.15, 1.0, 0.35),
    gain: float = 1.2,
) -> jnp.ndarray:
    """Blend the analytic critical curve into (N, 3) linear radiance.

    ``line_width`` is the Gaussian half-width in impact-parameter units
    (M = 1 scale: the whole shadow is ~10 M across); None means 0.06 M —
    callers rendering coarse frames should pass ~1.5 pixels' worth of
    impact parameter or the line falls between pixel centers (the pipeline
    does). Composited additively before tone mapping, as the reference
    blends its curve before ACES (fragment.glsl.ts:279-331).
    """
    m = bh.mass.astype(dtype)
    a = bh.spin.astype(dtype)
    if line_width is None:
        line_width = 0.06 * m
    alpha_c, beta_c, valid = bardeen_shadow(m, a, theta_obs=theta_obs, n=n_pts)
    alpha_c = alpha_c.astype(dtype)
    beta_c = beta_c.astype(dtype)

    px, py, deficit = pixel_celestial_coords(y0, a, theta_obs, dtype)
    d_sq = _polyline_distance_sq(px, py, deficit, alpha_c, beta_c, valid)

    w = jnp.asarray(line_width, dtype)
    weight = gain * jnp.exp(-d_sq / jnp.maximum(w * w, 1e-12))
    tint = jnp.asarray(color, dtype)
    return radiance + weight[:, None] * tint[None, :]
