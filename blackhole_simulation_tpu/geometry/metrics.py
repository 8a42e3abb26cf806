"""Spacetime metrics: Kerr (Boyer-Lindquist + Kerr-Schild), Schwarzschild, Minkowski.

Capability parity with reference gravitas-core/src/metric/ (mod.rs:21-85 Metric
trait; kerr.rs full Kerr in both charts with analytic Hamiltonian derivatives;
schwarzschild.rs; minkowski.rs) — re-derived TPU-first:

- metrics are pure functions of ``(r, theta)`` returning batched ``(...,4,4)``
  tensors; everything broadcasts over leading ray axes,
- the Hamiltonian H = 1/2 g^{mu nu} p_mu p_nu uses *sparse* contractions with
  only the nonzero chart components (the hot-path form used by the
  integrators and the Pallas kernels),
- dH/dr and dH/dtheta come from exact reverse-mode autodiff of H rather than
  the reference's hand-expanded closed forms (kerr.rs:295-372, 442-499); the
  tests cross-check autodiff against independent finite differences, replacing
  the reference's NumericalAudit (invariants/audit.rs:6-48).

Charts
------
Boyer-Lindquist ("bl"): the textbook Kerr form, singular at the horizon
    (Delta -> 0) — used for analytics and far-field work.
Kerr-Schild ("ks"): horizon-regular ingoing form g = eta + 2 H l (x) l in
    oblate-spheroidal coordinates; all contravariant components are polynomial
    in 1/Sigma with g^rr = Delta/Sigma, so the march crosses the horizon
    smoothly. This is the chart the fast path integrates in (mirroring the
    reference's WGSL compute path, src/shaders/compute.wgsl.ts:42-120).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

BL = "bl"
KS = "ks"

# Pole guard for sin^2(theta) divisions — same epsilon role as the reference's
# KS pole guard (kerr.rs:417,449).
_SIN2_EPS = 1e-12


def _sym4(rows) -> jnp.ndarray:
    """Stack a symmetric 4x4 from its upper-triangle entries, batched."""
    (tt, tr, tth, tph), (rr, rth, rph), (thth, thph), (phph) = rows
    row_t = jnp.stack([tt, tr, tth, tph], axis=-1)
    row_r = jnp.stack([tr, rr, rth, rph], axis=-1)
    row_th = jnp.stack([tth, rth, thth, thph], axis=-1)
    row_ph = jnp.stack([tph, rph, thph, phph], axis=-1)
    return jnp.stack([row_t, row_r, row_th, row_ph], axis=-2)


# ---------------------------------------------------------------------------
# Kerr component functions (free functions: the jit/grad-friendly core)
# ---------------------------------------------------------------------------

def kerr_sigma(a, r, theta):
    """Sigma = r^2 + a^2 cos^2(theta)."""
    c = jnp.cos(theta)
    return r * r + a * a * c * c


def kerr_delta(m, a, r):
    """Delta = r^2 - 2 M r + a^2."""
    return r * r - 2.0 * m * r + a * a


def kerr_cov_bl(m, a, r, theta):
    """Covariant Kerr metric, Boyer-Lindquist chart, shape (...,4,4)."""
    s = jnp.sin(theta)
    s2 = s * s
    sig = kerr_sigma(a, r, theta)
    delta = kerr_delta(m, a, r)
    two_mr = 2.0 * m * r
    z = jnp.zeros_like(r)
    g_tt = -(1.0 - two_mr / sig)
    g_tph = -two_mr * a * s2 / sig
    g_rr = sig / delta
    g_thth = sig
    g_phph = (r * r + a * a + two_mr * a * a * s2 / sig) * s2
    return _sym4([(g_tt, z, z, g_tph), (g_rr, z, z), (g_thth, z), g_phph])


def kerr_con_bl(m, a, r, theta):
    """Contravariant Kerr metric, Boyer-Lindquist chart, shape (...,4,4)."""
    s = jnp.sin(theta)
    s2 = jnp.maximum(s * s, _SIN2_EPS)
    sig = kerr_sigma(a, r, theta)
    delta = kerr_delta(m, a, r)
    r2a2 = r * r + a * a
    big_a = r2a2 * r2a2 - a * a * delta * s2
    z = jnp.zeros_like(r)
    g_tt = -big_a / (sig * delta)
    g_tph = -2.0 * m * a * r / (sig * delta)
    g_rr = delta / sig
    g_thth = 1.0 / sig
    g_phph = (delta - a * a * s2) / (sig * delta * s2)
    return _sym4([(g_tt, z, z, g_tph), (g_rr, z, z), (g_thth, z), g_phph])


def kerr_cov_ks(m, a, r, theta):
    """Covariant Kerr metric, Kerr-Schild ingoing chart: g = eta + 2H l (x) l.

    H = M r / Sigma, l_mu = (1, 1, 0, -a sin^2 theta); eta is flat space in
    oblate-spheroidal coordinates (eta_rphi = -a sin^2 theta,
    eta_phiphi = (r^2+a^2) sin^2 theta).
    """
    s = jnp.sin(theta)
    s2 = s * s
    sig = kerr_sigma(a, r, theta)
    h2 = 2.0 * m * r / sig  # 2H
    z = jnp.zeros_like(r)
    g_tt = -1.0 + h2
    g_tr = h2
    g_tph = -h2 * a * s2
    g_rr = 1.0 + h2
    g_rph = -a * s2 * (1.0 + h2)
    g_thth = sig
    g_phph = s2 * (r * r + a * a + h2 * a * a * s2)
    return _sym4([(g_tt, g_tr, z, g_tph), (g_rr, z, g_rph), (g_thth, z), g_phph])


def kerr_con_ks(m, a, r, theta):
    """Contravariant Kerr metric, Kerr-Schild ingoing chart.

    g^{mu nu} = eta^{mu nu} - 2H l^mu l^nu with l^mu = (-1, 1, 0, 0):
        g^tt = -(1+2H), g^tr = 2H, g^rr = Delta/Sigma, g^rphi = a/Sigma,
        g^thth = 1/Sigma, g^phph = 1/(Sigma sin^2 theta).
    Horizon-regular: no Delta in any denominator.
    """
    s = jnp.sin(theta)
    s2 = jnp.maximum(s * s, _SIN2_EPS)
    sig = kerr_sigma(a, r, theta)
    delta = kerr_delta(m, a, r)
    h2 = 2.0 * m * r / sig
    z = jnp.zeros_like(r)
    g_tt = -(1.0 + h2)
    g_tr = h2
    g_rr = delta / sig
    g_rph = a / sig
    g_thth = 1.0 / sig
    g_phph = 1.0 / (sig * s2)
    return _sym4([(g_tt, g_tr, z, z), (g_rr, z, g_rph), (g_thth, z), g_phph])


def hamiltonian_bl(m, a, r, theta, p):
    """H = 1/2 g^{mu nu} p_mu p_nu, BL chart, sparse contraction. p: (...,4)."""
    s = jnp.sin(theta)
    s2 = jnp.maximum(s * s, _SIN2_EPS)
    sig = kerr_sigma(a, r, theta)
    delta = kerr_delta(m, a, r)
    r2a2 = r * r + a * a
    big_a = r2a2 * r2a2 - a * a * delta * s2
    pt, pr, pth, pph = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    inv_sd = 1.0 / (sig * delta)
    return 0.5 * (
        -big_a * inv_sd * pt * pt
        - 4.0 * m * a * r * inv_sd * pt * pph
        + delta / sig * pr * pr
        + pth * pth / sig
        + (delta - a * a * s2) * inv_sd / s2 * pph * pph
    )


def hamiltonian_ks(m, a, r, theta, p):
    """H = 1/2 g^{mu nu} p_mu p_nu, KS chart, sparse contraction. p: (...,4)."""
    s = jnp.sin(theta)
    s2 = jnp.maximum(s * s, _SIN2_EPS)
    sig = kerr_sigma(a, r, theta)
    delta = kerr_delta(m, a, r)
    h2 = 2.0 * m * r / sig
    pt, pr, pth, pph = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    return 0.5 * (
        -(1.0 + h2) * pt * pt
        + 2.0 * h2 * pt * pr
        + delta / sig * pr * pr
        + 2.0 * a / sig * pr * pph
        + pth * pth / sig
        + pph * pph / (sig * s2)
    )


def _ham_derivs(ham_fn, m, a, r, theta, p):
    """Batched (dH/dr, dH/dtheta) by one reverse pass over sum(H)."""
    def total(rr, tt):
        return jnp.sum(ham_fn(m, a, rr, tt, p))

    return jax.grad(total, argnums=(0, 1))(r, theta)


# ---------------------------------------------------------------------------
# Metric classes (pytree dataclasses; `chart` is static metadata)
# ---------------------------------------------------------------------------

@partial(jax.tree_util.register_dataclass, data_fields=["mass", "spin"], meta_fields=["chart"])
@dataclasses.dataclass(frozen=True)
class Kerr:
    """Kerr black hole of mass M and angular momentum a = J/M (geometric units).

    API parity with the reference `Metric` trait + `Kerr` impl
    (gravitas-core/src/metric/mod.rs:54-85, metric/kerr.rs).
    """

    mass: jnp.ndarray
    spin: jnp.ndarray
    chart: str = BL

    # -- chart tensors ------------------------------------------------------
    def covariant(self, r, theta):
        fn = kerr_cov_bl if self.chart == BL else kerr_cov_ks
        return fn(self.mass, self.spin, r, theta)

    def contravariant(self, r, theta):
        fn = kerr_con_bl if self.chart == BL else kerr_con_ks
        return fn(self.mass, self.spin, r, theta)

    def hamiltonian(self, r, theta, p):
        fn = hamiltonian_bl if self.chart == BL else hamiltonian_ks
        return fn(self.mass, self.spin, r, theta, p)

    def hamiltonian_derivatives(self, r, theta, p):
        """(dH/dr, dH/dtheta) — exact autodiff, replaces kerr.rs:295-499."""
        fn = hamiltonian_bl if self.chart == BL else hamiltonian_ks
        return _ham_derivs(fn, self.mass, self.spin, r, theta, p)

    def with_chart(self, chart: str) -> "Kerr":
        return dataclasses.replace(self, chart=chart)

    # -- derived radii (kerr.rs:76-204) -------------------------------------
    @property
    def spin_ratio(self):
        return self.spin / self.mass

    def event_horizon(self):
        """r+ = M + sqrt(M^2 - a^2)."""
        return self.mass + jnp.sqrt(jnp.maximum(self.mass**2 - self.spin**2, 0.0))

    def cauchy_horizon(self):
        """r- = M - sqrt(M^2 - a^2)."""
        return self.mass - jnp.sqrt(jnp.maximum(self.mass**2 - self.spin**2, 0.0))

    def photon_sphere(self, prograde: bool = True):
        """Equatorial circular photon orbit r_ph = 2M{1 + cos[(2/3) acos(∓|a*|)]}.

        "prograde" means co-rotating with the hole (uses -|a*| in the acos).
        a*=0 gives 3M; prograde extremal gives M; retrograde extremal 4M.
        """
        a_star = jnp.abs(jnp.clip(self.spin_ratio, -1.0, 1.0))
        sgn = -1.0 if prograde else 1.0
        return 2.0 * self.mass * (1.0 + jnp.cos((2.0 / 3.0) * jnp.arccos(sgn * a_star)))

    def isco(self, prograde: bool = True):
        """Bardeen-Press-Teukolsky innermost stable circular orbit.

        r_isco = M [3 + Z2 ∓ sqrt((3-Z1)(3+Z1+2Z2))], minus for co-rotating.
        """
        a_star = jnp.abs(jnp.clip(self.spin_ratio, -1.0, 1.0))
        z1 = 1.0 + jnp.cbrt(1.0 - a_star**2) * (
            jnp.cbrt(1.0 + a_star) + jnp.cbrt(1.0 - a_star)
        )
        z2 = jnp.sqrt(3.0 * a_star**2 + z1 * z1)
        sgn = 1.0 if prograde else -1.0
        root = jnp.sqrt(jnp.maximum((3.0 - z1) * (3.0 + z1 + 2.0 * z2), 0.0))
        return self.mass * (3.0 + z2 - sgn * root)

    def ergosphere(self, theta):
        """Outer ergosurface r_E(theta) = M + sqrt(M^2 - a^2 cos^2 theta)."""
        c = jnp.cos(theta)
        return self.mass + jnp.sqrt(jnp.maximum(self.mass**2 - self.spin**2 * c * c, 0.0))

    def frame_dragging(self, r, theta):
        """ZAMO angular velocity omega = -g_tphi / g_phiphi = 2 M a r / A."""
        s = jnp.sin(theta)
        s2 = s * s
        sig = kerr_sigma(self.spin, r, theta)
        delta = kerr_delta(self.mass, self.spin, r)
        r2a2 = r * r + self.spin**2
        big_a = r2a2 * r2a2 - self.spin**2 * delta * s2
        return 2.0 * self.mass * self.spin * r / big_a

    def keplerian_omega(self, r, prograde: bool = True):
        """Circular equatorial orbit Omega_K = ±M^(1/2) / (r^(3/2) ± a M^(1/2))."""
        sqm = jnp.sqrt(self.mass)
        sgn = 1.0 if prograde else -1.0
        return sgn * sqm / (r ** 1.5 + sgn * self.spin * sqm)

    def time_dilation(self, r, theta):
        """Static-observer lapse sqrt(-g_tt) = sqrt(1 - 2Mr/Sigma), clipped at 0."""
        sig = kerr_sigma(self.spin, r, theta)
        return jnp.sqrt(jnp.maximum(1.0 - 2.0 * self.mass * r / sig, 0.0))


@partial(jax.tree_util.register_dataclass, data_fields=["mass"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class Schwarzschild:
    """Schwarzschild (a = 0) metric — parity with metric/schwarzschild.rs:20-120."""

    mass: jnp.ndarray

    def covariant(self, r, theta):
        f = 1.0 - 2.0 * self.mass / r
        s = jnp.sin(theta)
        z = jnp.zeros_like(r)
        return _sym4([(-f, z, z, z), (1.0 / f, z, z), (r * r, z), r * r * s * s])

    def contravariant(self, r, theta):
        f = 1.0 - 2.0 * self.mass / r
        s2 = jnp.maximum(jnp.sin(theta) ** 2, _SIN2_EPS)
        z = jnp.zeros_like(r)
        return _sym4([(-1.0 / f, z, z, z), (f, z, z), (1.0 / (r * r), z), 1.0 / (r * r * s2)])

    def hamiltonian(self, r, theta, p):
        return hamiltonian_bl(self.mass, jnp.zeros_like(self.mass), r, theta, p)

    def hamiltonian_derivatives(self, r, theta, p):
        return _ham_derivs(
            hamiltonian_bl, self.mass, jnp.zeros_like(self.mass), r, theta, p
        )

    def event_horizon(self):
        return 2.0 * self.mass

    def photon_sphere(self, prograde: bool = True):
        return 3.0 * self.mass

    def isco(self, prograde: bool = True):
        return 6.0 * self.mass

    def time_dilation(self, r, theta=None):
        return jnp.sqrt(jnp.maximum(1.0 - 2.0 * self.mass / r, 0.0))


@partial(jax.tree_util.register_dataclass, data_fields=[], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class Minkowski:
    """Flat spacetime in spherical coordinates — parity with metric/minkowski.rs."""

    def covariant(self, r, theta):
        r = jnp.asarray(r)
        s = jnp.sin(theta)
        one = jnp.ones_like(r)
        z = jnp.zeros_like(r)
        return _sym4([(-one, z, z, z), (one, z, z), (r * r, z), r * r * s * s])

    def contravariant(self, r, theta):
        r = jnp.asarray(r)
        s2 = jnp.maximum(jnp.sin(theta) ** 2, _SIN2_EPS)
        one = jnp.ones_like(r)
        z = jnp.zeros_like(r)
        return _sym4([(-one, z, z, z), (one, z, z), (1.0 / (r * r), z), 1.0 / (r * r * s2)])

    def hamiltonian(self, r, theta, p):
        g = self.contravariant(r, theta)
        return 0.5 * jnp.einsum("...ij,...i,...j->...", g, p, p)

    def hamiltonian_derivatives(self, r, theta, p):
        def total(rr, tt):
            return jnp.sum(self.hamiltonian(rr, tt, p))

        return jax.grad(total, argnums=(0, 1))(r, theta)

    def event_horizon(self):
        return jnp.asarray(0.0)


# Anything with covariant/contravariant/hamiltonian_derivatives quacks as a
# Metric (the reference's trait, metric/mod.rs:54-85).
Metric = Kerr | Schwarzschild | Minkowski
