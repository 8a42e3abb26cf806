"""Shadow-interior pre-cull: kill provably-captured rays before the march.

The reference culls rays whose Euclidean impact parameter is below
0.9 r_h before marching (src/shaders/blackhole/fragment.glsl.ts:118-127) —
an ultra-conservative heuristic that kills only the innermost few percent
of shadow pixels. The TPU build replaces it with the EXACT capture test:

A null geodesic in Kerr is captured iff its radial potential

    R(r) = (r^2 + a^2 - a lam)^2 - Delta(r) [ (lam - a)^2 + eta ]

(E = 1 units; lam = L_z/E, eta = Q/E^2) has no root outside the horizon,
i.e. iff (lam, eta) lies inside the Bardeen critical curve
(gravitas-core/src/physics/shadow.rs:39-59 computes the same curve for the
shadow overlay). Spherical photon orbits at radius s parameterize that
curve (Bardeen 1973):

    lam_c(s) = [ s^2 (3M - s) - a^2 (M + s) ] / [ a (s - M) ]
    eta_c(s) = s^3 [ 4 a^2 M - s (s - 3M)^2 ] / [ a^2 (s - M)^2 ]

for s in [s_pro, s_retro] (the pro/retrograde circular photon radii), with
lam_c monotone decreasing in s. The test is exact for ANY start radius:
a ray at r0 exists only where R(r0) >= 0, so if R has a root > r_h it has
one in (r_h, r0) and the inward ray turns; if R has no root the ray falls
through the horizon. Capture therefore depends only on the conserved
(lam, eta) — ~25 vectorized bisection iterations per ray, vs the ~10^2
march steps a shadow-interior ray would otherwise burn. The cull also
makes shadow-interior Pallas tiles exit at step 0 (ops/pallas_march.py's
per-tile wavefront exit), which is where the frame time actually goes.

Culled rays are re-born at r = r_h/2 (inside the horizon): both march
paths already classify such rays HIT_HORIZON at step 0 with no kernel
changes, keeping jnp/Pallas parity trivially.

A relative margin keeps the cull strictly interior: pixels within
``margin`` of the critical curve march normally, so the photon ring and
its gradients (the high-|d pixel/d spin| band that inverse rendering
lives on) are untouched; the margin also absorbs f32 round-off in the
bisection. eta < 0 (vortical) photons are never culled.
"""

from __future__ import annotations

import jax.numpy as jnp


def _lam_c(m, a, s):
    """Critical lambda of the spherical photon orbit at radius s."""
    return (s * s * (3.0 * m - s) - a * a * (m + s)) / (a * (s - m))


def _eta_c(m, a, s):
    """Critical eta of the spherical photon orbit at radius s."""
    sm = s - m
    return s**3 * (4.0 * a * a * m - s * (s - 3.0 * m) ** 2) / (a * a * sm * sm)


def photon_orbit_radii(m, a):
    """Pro/retrograde equatorial circular photon radii (metric/kerr.rs:91-94):
    r_ph^{pro,retro} = 2M {1 + cos[(2/3) arccos(∓ a/M)]}."""
    x = jnp.clip(a / m, -1.0, 1.0)
    s_pro = 2.0 * m * (1.0 + jnp.cos(2.0 / 3.0 * jnp.arccos(-x)))
    s_retro = 2.0 * m * (1.0 + jnp.cos(2.0 / 3.0 * jnp.arccos(x)))
    return s_pro, s_retro


def capture_mask(m, a, y0: jnp.ndarray, margin: float = 0.04) -> jnp.ndarray:
    """(N,) bool — True where the ray is PROVABLY captured (with margin).

    ``y0``: (N, 8) theta-form KS state (t, r, th, ph, p_t, p_r, p_th, p_ph).
    Works for either spin sign via the (a, lam) -> (-a, -lam) isometry;
    near a = 0 the spin is clamped to |a| >= 1e-3 M (the critical curve
    moves O(a^2) ~ 1e-6, absorbed by the margin).
    """
    dtype = y0.dtype
    m = jnp.asarray(m, dtype)
    a_signed = jnp.asarray(a, dtype)
    flip = jnp.where(a_signed < 0.0, -1.0, 1.0).astype(dtype)
    a = jnp.maximum(jnp.abs(a_signed), 1e-3 * m)

    th = y0[:, 2]
    pt, pth, pph = y0[:, 4], y0[:, 6], y0[:, 7]
    # Conserved quantities (invariants/constants_of_motion.rs:8-61):
    # E = -p_t, L_z = p_phi, Q = p_th^2 + cos^2(th) (L^2/sin^2 - a^2 E^2).
    e = -pt
    inv_e = 1.0 / jnp.where(jnp.abs(e) < 1e-12, 1.0, e)
    lam = flip * pph * inv_e
    s2 = jnp.maximum(jnp.sin(th) ** 2, 1e-12)
    c2 = jnp.cos(th) ** 2
    q = pth * pth + c2 * (pph * pph / s2 - a_signed * a_signed * pt * pt)
    eta = q * inv_e * inv_e

    s_pro, s_retro = photon_orbit_radii(m, a)
    lam_hi = _lam_c(m, a, s_pro)    # largest critical lambda (prograde)
    lam_lo = _lam_c(m, a, s_retro)  # smallest (retrograde, negative)

    in_range = (lam > lam_lo) & (lam < lam_hi)
    lam_b = jnp.clip(lam, lam_lo, lam_hi)

    # Bisect lam_c(s) = lam on [s_pro, s_retro] (lam_c monotone decreasing).
    # 18 iterations resolve s* to (s_retro - s_pro)/2^18 ~ 1e-5 M — far
    # below the 4% relative margin; the bisection is ~2 ms of the 1080p
    # frame, so iterations are not free.
    lo = jnp.broadcast_to(s_pro, lam.shape)
    hi = jnp.broadcast_to(s_retro, lam.shape)
    for _ in range(18):
        mid = 0.5 * (lo + hi)
        go_right = _lam_c(m, a, mid) > lam_b  # lam_c(mid) > lam -> s* right
        lo = jnp.where(go_right, mid, lo)
        hi = jnp.where(go_right, hi, mid)
    eta_crit = _eta_c(m, a, 0.5 * (lo + hi))

    inside = eta < eta_crit * (1.0 - margin) - margin * m * m

    # "No turning point" implies capture only for rays moving INWARD at t=0
    # (an outward ray with rootless R escapes — relevant when the cinematic
    # camera dives inside the photon shell). dr/dlam = h p_t + (D/S) p_r
    # + (a/S) p_phi with the sparse ingoing-KS contravariant components
    # (ops/ks_kernel.ks_rhs).
    r0, th0 = y0[:, 1], y0[:, 2]
    pr = y0[:, 5]
    ssq = r0 * r0 + a_signed * a_signed * jnp.cos(th0) ** 2
    delta = r0 * r0 - 2.0 * m * r0 + a_signed * a_signed
    dr_dlam = (2.0 * m * r0 * pt + delta * pr + a_signed * pph) / ssq
    inward = dr_dlam < 0.0

    return in_range & inside & (eta >= 0.0) & inward
