"""Page-Thorne (Novikov-Thorne) relativistic thin-disk thermodynamics.

Capability parity with reference gravitas-core/src/physics/disk.rs:
circular-orbit E(r), L_z(r), Omega(r) (disk.rs:24-64); the Page-Thorne flux
integral F(r) = -(Mdot/4pi) * (Omega,r / (E - Omega L)^2) *
Int_{isco}^r (E - Omega L) L,r dr' (disk.rs:90-151); effective temperature
T ~ F^{1/4} scaled to ~1e7 K (disk.rs:160-170); and a normalized
512-wide temperature LUT for the renderer (disk.rs:175-201).

TPU-first re-design: the reference computes dE/dr, dL/dr, dOmega/dr by
central finite differences and the inner integral with a 200-panel Simpson
loop per radius. Here the derivatives are *exact* (jax.grad of the
closed-form orbit quantities) and the cumulative integral is one vectorized
trapezoid ``cumsum`` over a shared radial grid — O(N) total instead of
O(N * panels), and differentiable w.r.t. (M, a, Mdot) for inverse rendering.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from blackhole_simulation_tpu.geometry.metrics import Kerr


def circular_orbit_energy(m, a, r):
    """Specific energy E(r) of a prograde circular equatorial orbit
    (Bardeen-Press-Teukolsky; disk.rs:24-38)."""
    x = jnp.sqrt(m / r)
    denom = jnp.sqrt(jnp.maximum(1.0 - 3.0 * x * x + 2.0 * a * x**3 / m, 1e-12))
    return (1.0 - 2.0 * x * x + a * x**3 / m) / denom


def circular_orbit_angular_momentum(m, a, r):
    """Specific angular momentum L_z(r), prograde (disk.rs:41-53)."""
    x = jnp.sqrt(m / r)
    denom = jnp.sqrt(jnp.maximum(1.0 - 3.0 * x * x + 2.0 * a * x**3 / m, 1e-12))
    return r * x * (1.0 - 2.0 * a * x**3 / m + (a / r) ** 2) / denom


def circular_orbit_omega(m, a, r):
    """Keplerian angular velocity Omega(r), prograde (disk.rs:56-64)."""
    sqm = jnp.sqrt(m)
    return sqm / (r**1.5 + a * sqm)


def _flux_integrand(m, a, r):
    """(E - Omega L) dL/dr — the Page-Thorne integrand, exact derivative."""
    e = circular_orbit_energy(m, a, r)
    l = circular_orbit_angular_momentum(m, a, r)
    om = circular_orbit_omega(m, a, r)
    dl_dr = jax.grad(lambda rr: circular_orbit_angular_momentum(m, a, rr))(r)
    return (e - om * l) * dl_dr


@partial(jax.jit, static_argnames=("n_grid",))
def page_thorne_flux(r, m=1.0, a=0.0, mdot=1.0, n_grid: int = 512):
    """Page-Thorne flux F(r) radiated per unit disk area (disk.rs:90-151).

    ``r`` may be scalar or batched; returns the same shape. Zero inside the
    ISCO (the no-torque boundary condition). The inner integral runs over a
    fixed log-spaced grid from r_isco to max(r) and is interpolated at r —
    fully vectorized and differentiable.
    """
    m = jnp.asarray(m)
    a = jnp.asarray(a)
    r = jnp.asarray(r)
    bh = Kerr(mass=m, spin=a)
    r_isco = bh.isco()
    r_max = jnp.maximum(jnp.max(r), r_isco * 2.0) * 1.001

    # Log-spaced integration grid from the ISCO outward.
    ts = jnp.linspace(0.0, 1.0, n_grid)
    grid = r_isco * (r_max / r_isco) ** ts
    vals = jax.vmap(lambda rr: _flux_integrand(m, a, rr))(grid)
    # Cumulative trapezoid of integrand over the grid.
    dr = jnp.diff(grid)
    panels = 0.5 * (vals[1:] + vals[:-1]) * dr
    cum = jnp.concatenate([jnp.zeros((1,), grid.dtype), jnp.cumsum(panels)])
    integral = jnp.interp(r, grid, cum)

    e = circular_orbit_energy(m, a, r)
    l = circular_orbit_angular_momentum(m, a, r)
    om = circular_orbit_omega(m, a, r)
    dom_dr = jax.vmap(lambda rr: jax.grad(lambda q: circular_orbit_omega(m, a, q))(rr))(
        jnp.atleast_1d(r).ravel()
    ).reshape(jnp.shape(r))
    # Page-Thorne: F = Mdot/(4 pi sqrt(-g)) * (-Omega,r/(E-Omega L)^2) * Int,
    # with sqrt(-g) = r on the equatorial slice -> the classic ~r^-3 far field.
    flux = (
        -(mdot / (4.0 * jnp.pi * r))
        * dom_dr
        / jnp.maximum((e - om * l) ** 2, 1e-30)
        * integral
    )
    return jnp.where(r > r_isco, jnp.maximum(flux, 0.0), 0.0)


def disk_temperature(r, m=1.0, a=0.0, mdot=1.0, t_scale=1e7):
    """Effective temperature T(r) = F(r)^{1/4}, scaled so the peak lands near
    ``t_scale`` kelvin for the default disk (disk.rs:160-170)."""
    f = page_thorne_flux(r, m, a, mdot)
    t_raw = jnp.power(jnp.maximum(f, 0.0), 0.25)
    # Normalize by the analytic peak of the raw profile so max(T) ~ t_scale.
    r_probe = jnp.linspace(1.0, 50.0, 256) * jnp.asarray(m)
    peak = jnp.max(jnp.power(jnp.maximum(page_thorne_flux(r_probe, m, a, mdot), 0.0), 0.25))
    return t_raw / jnp.maximum(peak, 1e-30) * t_scale


@partial(jax.jit, static_argnames=("width",))
def generate_temperature_lut(m=1.0, a=0.0, mdot=1.0, width: int = 512, r_max=50.0):
    """Normalized T(r) LUT over [r_isco, r_max], float32 width-wide —
    the renderer upload format (disk.rs:175-201). Returns (lut, r_isco, r_max)."""
    m = jnp.asarray(m)
    bh = Kerr(mass=m, spin=jnp.asarray(a))
    r_isco = bh.isco()
    rs = r_isco + (r_max * m - r_isco) * jnp.linspace(0.0, 1.0, width)
    f = page_thorne_flux(rs, m, a, mdot)
    t = jnp.power(jnp.maximum(f, 0.0), 0.25)
    t = t / jnp.maximum(jnp.max(t), 1e-30)
    return t.astype(jnp.float32), r_isco, r_max * m


def temperature_profile(m=1.0, a=0.0, mdot=1.0, n: int = 128, r_max=50.0):
    """(r, T(r)) pairs for plotting (disk.rs:206-220)."""
    m = jnp.asarray(m)
    bh = Kerr(mass=m, spin=jnp.asarray(a))
    rs = bh.isco() + (r_max * m - bh.isco()) * jnp.linspace(0.0, 1.0, n)
    return rs, disk_temperature(rs, m, a, mdot)
