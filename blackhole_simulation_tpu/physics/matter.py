"""Matter fields: accretion-disk and relativistic-jet density/emissivity.

TPU re-design of the reference's legacy matter module
(physics-engine/_legacy_src/matter.rs: MatterField trait + AccretionDisk +
RelativisticJet with Blandford-Znajek-flavored power) and the volumetric
sampling chunks the GPU marcher uses (src/shaders/chunks/disk.ts:16-155).
Every field is a pure batched function of position (and black-hole
parameters) so it can be sampled inside a jitted march step, plotted as a
volumetric grid, or differentiated for inverse problems.

The render path's *shading* (render/shading.py) consumes these through its
own DiskParams/JetParams; this module is the physics-facing API: densities,
four-velocities, stress-energy diagnostics, and jet power.
"""

from __future__ import annotations

import dataclasses
from typing import Protocol, runtime_checkable

import jax.numpy as jnp

from blackhole_simulation_tpu.geometry import radii


@runtime_checkable
class MatterField(Protocol):
    """The MatterField trait (matter.rs): density and bulk velocity at a
    point, in geometric units."""

    def density(self, m, a, r, theta, phi): ...

    def four_velocity(self, m, a, r, theta): ...


@dataclasses.dataclass(frozen=True)
class AccretionDisk:
    """Geometrically-thin Keplerian disk (matter.rs AccretionDisk +
    chunks/disk.ts:33-61 slab geometry).

    Density: Gaussian in height with scale ``h_ratio * r``, power-law in
    radius inside [isco, r_out], zero inside the ISCO (zero-torque inner
    boundary, disk.rs Page-Thorne BC).
    """

    r_out: float = 20.0
    h_ratio: float = 0.08        # scale height H/r
    density_index: float = -1.5  # rho ~ r^index
    rho0: float = 1.0

    def density(self, m, a, r, theta, phi=0.0):
        r_in = radii.isco(m, a, prograde=True)
        z = r * jnp.cos(theta)
        h = self.h_ratio * r
        radial = jnp.where(
            (r >= r_in) & (r <= self.r_out),
            (r / jnp.maximum(r_in, 1e-6)) ** self.density_index,
            0.0,
        )
        return self.rho0 * radial * jnp.exp(-0.5 * (z / jnp.maximum(h, 1e-6)) ** 2)

    def four_velocity(self, m, a, r, theta):
        """Circular-equatorial u^mu = u^t (1, 0, 0, Omega_K) with
        Omega_K = sqrt(M)/(r^{3/2} + a sqrt(M)) (kerr.rs:172-176) and u^t
        from the BL metric normalization (redshift.rs:65-95)."""
        sm = jnp.sqrt(m)
        omega = sm / (r ** 1.5 + a * sm)
        # u^t = 1/sqrt(-(g_tt + 2 g_tphi Omega + g_phiphi Omega^2)), equatorial BL.
        g_tt = -(1.0 - 2.0 * m / r)
        g_tph = -2.0 * m * a / r
        g_phph = r * r + a * a + 2.0 * m * a * a / r
        ut = 1.0 / jnp.sqrt(
            jnp.maximum(-(g_tt + 2.0 * g_tph * omega + g_phph * omega * omega), 1e-12)
        )
        zeros = jnp.zeros_like(r)
        return jnp.stack([ut, zeros, zeros, ut * omega], axis=-1)

    def surface_density(self, m, a, r):
        """Vertically-integrated density Sigma(r) = sqrt(2 pi) H rho."""
        return jnp.sqrt(2.0 * jnp.pi) * self.h_ratio * r * self.density(
            m, a, r, jnp.pi / 2
        )


@dataclasses.dataclass(frozen=True)
class RelativisticJet:
    """Bi-conical relativistic jet (matter.rs RelativisticJet,
    chunks/disk.ts:117-155): density in two cones about the spin axis with
    opening half-angle ``half_angle``, bulk speed ``beta`` along the axis,
    power-law falloff along the jet."""

    half_angle: float = 0.15     # radians
    beta: float = 0.92           # bulk speed (disk.ts beta = 0.92)
    r_base: float = 2.0
    r_max: float = 60.0
    rho0: float = 0.05
    falloff: float = -2.0        # rho ~ r^falloff

    def density(self, m, a, r, theta, phi=0.0):
        # Angle from the nearer pole.
        ang = jnp.minimum(theta, jnp.pi - theta)
        core = jnp.exp(-0.5 * (ang / jnp.maximum(self.half_angle, 1e-6)) ** 2)
        radial = jnp.where(
            (r >= self.r_base) & (r <= self.r_max),
            (r / self.r_base) ** self.falloff,
            0.0,
        )
        return self.rho0 * core * radial

    def four_velocity(self, m, a, r, theta):
        """Outflow along +-e_r near the axis at speed beta: u = gamma (e_t
        +- beta e_r) in the local static frame (flat-space normalized — the
        jet lives far outside the ergosphere where this is the reference's
        own approximation)."""
        gamma = 1.0 / jnp.sqrt(1.0 - self.beta * self.beta)
        zeros = jnp.zeros_like(r)
        # +e_r is outward in both hemispheres (r is the radial coordinate).
        return jnp.stack(
            [jnp.full_like(r, gamma), jnp.full_like(r, gamma * self.beta),
             zeros, zeros],
            axis=-1,
        )

    def doppler(self, costh_view):
        """Relativistic Doppler delta = 1/(gamma (1 - beta cos theta)), the
        beaming factor the shader raises to 3.5 (disk.ts:92-98)."""
        gamma = 1.0 / jnp.sqrt(1.0 - self.beta * self.beta)
        return 1.0 / (gamma * (1.0 - self.beta * costh_view))

    def blandford_znajek_power(self, m, a, b_field=1.0):
        """BZ-flavored jet power ~ (B Phi)^2 a*^2 / (8 pi) with the horizon
        angular velocity Omega_H = a / (2 M r_+) (matter.rs's scaling; this
        is the standard P_BZ ~ kappa Phi^2 Omega_H^2 estimate)."""
        r_p = radii.event_horizon(m, a)
        omega_h = a / (2.0 * m * r_p)
        phi_flux = b_field * jnp.pi * r_p * r_p
        kappa = 0.053  # split-monopole coefficient
        return kappa * phi_flux * phi_flux * omega_h * omega_h / (4.0 * jnp.pi)


def stress_energy_dust(rho, u_con, g_cov):
    """T^{mu nu} = rho u^mu u^nu (pressureless dust, matter.rs's form) and
    its trace T = rho (u.u) as a diagnostic. u_con: (..., 4), g_cov:
    (..., 4, 4)."""
    t_con = rho[..., None, None] * u_con[..., :, None] * u_con[..., None, :]
    u_cov = jnp.einsum("...ij,...j->...i", g_cov, u_con)
    trace = rho * jnp.einsum("...i,...i->...", u_con, u_cov)
    return t_con, trace
