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
(lam, eta) — evaluated per ray as a 32-term Chebyshev series of the
critical curve (fit per scene, see _eta_crit_cheb_coeffs), vs the ~10^2
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

import jax
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


# Chebyshev fit of the critical curve eta_c(lam): nodes, coefficients.
_CHEB_K = 32
# Empirical max |fit - exact| over a in [0.1, 0.999] at K = 32 (the error
# concentrates at the prograde edge near extremality; measured 2.85e-2 at
# a = 0.999, <3e-9 below a = 0.9). Subtracted from the fit so the cull can
# only ever be MORE conservative than the exact test.
_CHEB_ERR = 0.03


def _eta_crit_cheb_coeffs(m, a):
    """Per-SCENE Chebyshev-interpolation of eta_c(lam) on the critical
    curve: K scalar bisections for s*(lam) at the Chebyshev nodes + a DCT —
    all O(K) scalar work, traced once per jitted render. Replaces the
    per-RAY 18-iteration rational bisection (a divide per iteration over
    2M lanes ~ 4 ms/frame at 1080p) with a 32-term Clenshaw evaluation.
    """
    s_pro, s_retro = photon_orbit_radii(m, a)
    lam_hi = _lam_c(m, a, s_pro)
    lam_lo = _lam_c(m, a, s_retro)
    mid = 0.5 * (lam_hi + lam_lo)
    half = 0.5 * (lam_hi - lam_lo)
    k = jnp.arange(_CHEB_K, dtype=m.dtype)
    x = jnp.cos(jnp.pi * (k + 0.5) / _CHEB_K)
    lam_k = mid + half * x
    lo = jnp.broadcast_to(s_pro, lam_k.shape)
    hi = jnp.broadcast_to(s_retro, lam_k.shape)
    for _ in range(40):  # scalar-width bisection: K lanes, cost-free
        s_mid = 0.5 * (lo + hi)
        go_right = _lam_c(m, a, s_mid) > lam_k
        lo = jnp.where(go_right, s_mid, lo)
        hi = jnp.where(go_right, hi, s_mid)
    eta_k = _eta_c(m, a, 0.5 * (lo + hi))
    j = jnp.arange(_CHEB_K, dtype=m.dtype)
    coeffs = (2.0 / _CHEB_K) * (
        eta_k[None, :] * jnp.cos(jnp.pi * j[:, None] * (k[None, :] + 0.5) / _CHEB_K)
    ).sum(axis=1)
    coeffs = coeffs.at[0].mul(0.5)
    return coeffs, mid, half, lam_lo, lam_hi


def _cheb_eval(coeffs, mid, half, lam):
    """Clenshaw evaluation of the Chebyshev series at lam (vectorized)."""
    t = jnp.clip((lam - mid) / half, -1.0, 1.0)
    b1 = jnp.zeros_like(t)
    b2 = jnp.zeros_like(t)
    for j in range(_CHEB_K - 1, 0, -1):
        b1, b2 = 2.0 * t * b1 - b2 + coeffs[j], b1
    return t * b1 - b2 + coeffs[0]


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
    # Clamp to the range the _CHEB_ERR bound was validated on: [1e-3, 0.999]M
    # (ADVICE r3). Above 0.999 the fit error could exceed the 0.03 margin and
    # over-cull escaping rays; clamping instead evaluates the 0.999 curve,
    # whose distance to the true a -> 1 curve (O(1e-3) in eta) is far inside
    # the 4% relative + 0.04 M^2 absolute cull margin below.
    a = jnp.clip(jnp.abs(a_signed), 1e-3 * m, 0.999 * m)

    # Row view of the packed state: column slices of an (N, 8) array carry
    # a 1-sublane degenerate TPU layout; the barrier forces one contiguous
    # (8, N) copy so every row op below runs on full (8, 128) tiles.
    y0t = jax.lax.optimization_barrier(y0.T)
    th = y0t[2]
    pt, pth, pph = y0t[4], y0t[6], y0t[7]
    # Conserved quantities (invariants/constants_of_motion.rs:8-61):
    # E = -p_t, L_z = p_phi, Q = p_th^2 + cos^2(th) (L^2/sin^2 - a^2 E^2).
    e = -pt
    inv_e = 1.0 / jnp.where(jnp.abs(e) < 1e-12, 1.0, e)
    lam = flip * pph * inv_e
    s2 = jnp.maximum(jnp.sin(th) ** 2, 1e-12)
    c2 = jnp.cos(th) ** 2
    return _capture_core(
        m, a, a_signed, flip, y0t[1], s2, c2, pt, y0t[5], pth * pth, pph,
        lam, inv_e, margin,
    )


def capture_mask_u(m, a, yt_u: jnp.ndarray, margin: float = 0.04) -> jnp.ndarray:
    """capture_mask on (8, N) u-chart rows (t, r, u, phi, p_t, p_r, p_u,
    p_phi) — fully trig-free (s^2 = 1 - u^2, p_theta^2 = p_u^2 (1 - u^2)),
    the row-native fast-path entry."""
    dtype = yt_u.dtype
    m = jnp.asarray(m, dtype)
    a_signed = jnp.asarray(a, dtype)
    flip = jnp.where(a_signed < 0.0, -1.0, 1.0).astype(dtype)
    a = jnp.clip(jnp.abs(a_signed), 1e-3 * m, 0.999 * m)  # see capture_mask
    u = yt_u[2]
    pt, pu, pph = yt_u[4], yt_u[6], yt_u[7]
    e = -pt
    inv_e = 1.0 / jnp.where(jnp.abs(e) < 1e-12, 1.0, e)
    lam = flip * pph * inv_e
    w = 1.0 - u * u
    s2 = jnp.maximum(w, 1e-12)
    c2 = u * u
    return _capture_core(
        m, a, a_signed, flip, yt_u[1], s2, c2, pt, yt_u[5], pu * pu * w, pph,
        lam, inv_e, margin,
    )


def band_metric_values(m, eta, eta_crit_raw, lam, lam_lo, lam_hi):
    """Distance-to-critical-curve metric d (M^2 units, conserved space).

    d = |eta - eta_c(lam)| / M^2 for in-range lam, plus a steep penalty for
    the lam excess outside [lam_lo, lam_hi] (rays there are hyperbolic-like,
    far from criticality in any direction). Shared expression between the
    jnp band metric and the fused kernel's band plane (ops/pallas_render.py)
    so both paths select the same refinement set. ``eta_crit_raw`` is the
    UNSHIFTED Chebyshev curve (best estimate, not the conservative cull
    form). Small d = chaotic capture/escape boundary = the pixels whose hit
    classification is step-size sensitive (VERDICT r4 item 1).
    """
    m2 = m * m
    d_eta = jnp.abs(eta - eta_crit_raw) / m2
    excess = jnp.maximum(lam - lam_hi, lam_lo - lam)
    d_lam = jnp.maximum(excess, 0.0) * (4.0 / m)
    return d_eta + d_lam


def pole_w_min_values(m, a, lam, eta):
    """Minimum w = sin^2(theta) a ray can reach, from conserved (lam, eta).

    The theta-potential (E = 1) Theta(u) = eta + (a^2 - eta - lam^2) u^2
    - a^2 u^4 vanishes at u_max^2 = [b2 + sqrt(b2^2 + 4 a^2 eta)]/(2 a^2),
    b2 = a^2 - eta - lam^2 — closed form, no marching. Rays with small
    w_min pass near the coordinate axis, where the coarse-rate u-chart
    integration is least accurate (measured r5: ~half of all out-of-band
    hit-classification flips at 1080p a=0.999 are such rays). Used as the
    optional second refinement selector (MarchConfig.refine_pole_w)."""
    a2 = jnp.maximum(a * a, 1e-12)
    b2 = a2 - eta - lam * lam
    disc = jnp.sqrt(jnp.maximum(b2 * b2 + 4.0 * a2 * eta, 0.0))
    umax2 = jnp.clip((b2 + disc) / (2.0 * a2), 0.0, 1.0)
    return 1.0 - umax2


def fold_pole_metric(d_band, w_min, refine_band: float, refine_pole_w: float):
    """Fold the pole criterion into the band metric so ONE threshold
    (refine_band) selects both families: w_min < refine_pole_w maps below
    the threshold on the shared scale. Shared by the jnp path and the
    fused kernel's band plane."""
    if refine_pole_w <= 0.0:
        return d_band
    scale = refine_band / refine_pole_w
    return jnp.minimum(d_band, w_min * scale)


def critical_band_metric_u(m, a, yt_u: jnp.ndarray,
                           refine_band: float = 0.0,
                           refine_pole_w: float = 0.0) -> jnp.ndarray:
    """(N,) band metric d for (8, N) u-chart rows (see band_metric_values).

    Same conserved-quantity and Chebyshev-curve expressions as
    capture_mask_u; used by the staged render path to pick refinement rays
    (the fused kernel computes the identical metric in-kernel from its SMEM
    coefficients). With ``refine_pole_w`` > 0 the pole criterion folds in
    (fold_pole_metric)."""
    dtype = yt_u.dtype
    m = jnp.asarray(m, dtype)
    a_signed = jnp.asarray(a, dtype)
    flip = jnp.where(a_signed < 0.0, -1.0, 1.0).astype(dtype)
    a = jnp.clip(jnp.abs(a_signed), 1e-3 * m, 0.999 * m)
    u = yt_u[2]
    pt, pu, pph = yt_u[4], yt_u[6], yt_u[7]
    e = -pt
    inv_e = 1.0 / jnp.where(jnp.abs(e) < 1e-12, 1.0, e)
    lam = flip * pph * inv_e
    w = 1.0 - u * u
    s2 = jnp.maximum(w, 1e-12)
    c2 = u * u
    q = pu * pu * w + c2 * (pph * pph / s2 - a_signed * a_signed * pt * pt)
    eta = q * inv_e * inv_e
    coeffs, c_mid, c_half, lam_lo, lam_hi = _eta_crit_cheb_coeffs(m, a)
    eta_crit_raw = _cheb_eval(coeffs, c_mid, c_half, lam)
    d = band_metric_values(m, eta, eta_crit_raw, lam, lam_lo, lam_hi)
    if refine_pole_w > 0.0:
        w_min = pole_w_min_values(m, a, lam, eta)
        d = fold_pole_metric(d, w_min, refine_band, refine_pole_w)
    return d


def _capture_core(m, a, a_signed, flip, r0, s2, c2, pt, pr, pth2, pph,
                  lam, inv_e, margin):
    q = pth2 + c2 * (pph * pph / s2 - a_signed * a_signed * pt * pt)
    eta = q * inv_e * inv_e

    coeffs, c_mid, c_half, lam_lo, lam_hi = _eta_crit_cheb_coeffs(m, a)
    in_range = (lam > lam_lo) & (lam < lam_hi)
    eta_crit = _cheb_eval(coeffs, c_mid, c_half, lam) - _CHEB_ERR * m * m

    inside = eta < eta_crit * (1.0 - margin) - margin * m * m

    # "No turning point" implies capture only for rays moving INWARD at t=0
    # (an outward ray with rootless R escapes — relevant when the cinematic
    # camera dives inside the photon shell). dr/dlam = h p_t + (D/S) p_r
    # + (a/S) p_phi with the sparse ingoing-KS contravariant components
    # (ops/ks_kernel.ks_rhs). Note Sigma = r^2 + a^2 cos^2 = r^2 + a^2 c2.
    ssq = r0 * r0 + a_signed * a_signed * c2
    delta = r0 * r0 - 2.0 * m * r0 + a_signed * a_signed
    dr_dlam = (2.0 * m * r0 * pt + delta * pr + a_signed * pph) / ssq
    inward = dr_dlam < 0.0

    return in_range & inside & (eta >= 0.0) & inward
