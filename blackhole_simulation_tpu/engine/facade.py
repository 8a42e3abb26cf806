"""PhysicsEngine facade — the complete scalar/LUT/field/tick API surface.

Capability parity with reference gravitas-wasm/src/lib.rs PhysicsEngine
(lib.rs:42-465), the single object the frontend talks to:
compute_horizon/isco/photon_sphere/dilation (lib.rs:85-105),
generate_disk_lut (107-110), generate_spectrum_lut (128-136),
embedding/ergosphere meshes (139-157), compute_shadow_curve/radius/shift
(161-195), compute_disk_flux / compute_g_factor (198-205), Kretschmann/
light-cone/frame-drag fields + Flamm + proper distance (214-305),
tick (307-409) via the native seqlock bridge, and
integrate_ray_relativistic (421-464) via the f64 RKF45 oracle.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from blackhole_simulation_tpu.geometry.metrics import BL, KS, Kerr
from blackhole_simulation_tpu.geodesic import (
    IntegrationMethod,
    IntegrationOptions,
    integrate,
)
from blackhole_simulation_tpu.engine.native import load_bridge
from blackhole_simulation_tpu.physics import (
    bardeen_shadow,
    generate_blackbody_lut,
    generate_temperature_lut,
    hawking_temperature,
    kerr_g_factor,
    page_thorne_flux,
    schwarzschild_shadow_radius,
)
from blackhole_simulation_tpu.spacetime import (
    curvature_field,
    embedding_mesh,
    ergosphere_mesh,
    flamm_height,
    frame_drag_field,
    proper_distance,
    tilt_field,
)


class PhysicsEngine:
    """Host-side engine: owns the BL + KS metric pair, the native camera
    bridge, and every derived-physics entry point."""

    def __init__(self, mass: float = 1.0, spin: float = 0.9, prefer_native: bool = True):
        self._mass = float(mass)
        self._spin = float(spin)
        self.bridge = load_bridge(mass, spin, prefer_native=prefer_native)
        self._rebuild()

    def _rebuild(self) -> None:
        m = jnp.asarray(self._mass, jnp.float64)
        a = jnp.asarray(self._spin, jnp.float64)
        self.kerr_bl = Kerr(mass=m, spin=a, chart=BL)
        self.kerr_ks = Kerr(mass=m, spin=a, chart=KS)

    # -- parameters ----------------------------------------------------------
    @property
    def mass(self) -> float:
        return self._mass

    @property
    def spin(self) -> float:
        return self._spin

    def update_parameters(self, mass: float | None = None, spin: float | None = None):
        if mass is not None:
            self._mass = float(mass)
        if spin is not None:
            self._spin = float(spin)
        self.bridge.set_params(self._mass, self._spin)
        self._rebuild()

    # -- scalar radii (lib.rs:85-105) -----------------------------------------
    def compute_horizon(self) -> float:
        return float(self.kerr_bl.event_horizon())

    def compute_isco(self, prograde: bool = True) -> float:
        return float(self.kerr_bl.isco(prograde))

    def compute_photon_sphere(self, prograde: bool = True) -> float:
        return float(self.kerr_bl.photon_sphere(prograde))

    def compute_dilation(self, r: float, theta: float = np.pi / 2) -> float:
        return float(self.kerr_bl.time_dilation(jnp.asarray(r), jnp.asarray(theta)))

    def compute_hawking_temperature(self, mass_solar: float | None = None) -> float:
        return float(hawking_temperature(mass_solar or self._mass, self._spin / self._mass))

    # -- LUTs (lib.rs:107-136) -------------------------------------------------
    def generate_disk_lut(self, width: int = 512, mdot: float = 1.0):
        lut, r_in, r_out = generate_temperature_lut(self._mass, self._spin, mdot, width)
        return np.asarray(lut), float(r_in), float(r_out)

    def generate_spectrum_lut(self, width: int = 256, height: int = 64):
        return np.asarray(generate_blackbody_lut(width, height))

    # -- meshes (lib.rs:139-157) -----------------------------------------------
    def generate_embedding_mesh(self, n_r: int = 48, n_phi: int = 64):
        return np.asarray(embedding_mesh(self._mass, self._spin, n_r, n_phi))

    def generate_ergosphere_mesh(self, n_theta: int = 32, n_phi: int = 48):
        return np.asarray(ergosphere_mesh(self._mass, self._spin, n_theta, n_phi))

    # -- shadow (lib.rs:161-195) ------------------------------------------------
    def compute_shadow_curve(self, theta_obs: float, n: int = 32):
        alpha, beta, valid = bardeen_shadow(self._mass, self._spin, theta_obs, n)
        return np.asarray(alpha), np.asarray(beta), np.asarray(valid)

    def compute_shadow_radius(self) -> float:
        return float(schwarzschild_shadow_radius(self._mass))

    def compute_shadow_shift(self, theta_obs: float = np.pi / 2) -> float:
        """Centroid displacement of the critical curve (frame-drag shift)."""
        alpha, _, valid = self.compute_shadow_curve(theta_obs)
        a = alpha[valid]
        return float((a.max() + a.min()) / 2.0) if a.size else 0.0

    # -- disk physics (lib.rs:198-205) ------------------------------------------
    def compute_disk_flux(self, r: float, mdot: float = 1.0) -> float:
        return float(page_thorne_flux(jnp.asarray(r), self._mass, self._spin, mdot))

    def compute_g_factor(self, r: float, lam: float = 0.0) -> float:
        return float(kerr_g_factor(jnp.asarray(r), self._mass, self._spin, lam))

    # -- fields (lib.rs:214-305) -------------------------------------------------
    def compute_kretschmann_field(self, r_grid, theta_grid):
        r, th, k = curvature_field(self._mass, self._spin, jnp.asarray(r_grid), jnp.asarray(theta_grid))
        return np.asarray(r), np.asarray(th), np.asarray(k)

    def compute_frame_drag_field(self, r_grid, theta_grid):
        r, th, om = frame_drag_field(self._mass, self._spin, jnp.asarray(r_grid), jnp.asarray(theta_grid))
        return np.asarray(r), np.asarray(th), np.asarray(om)

    def compute_light_cone_field(self, r_grid, theta_grid, use_ks: bool = True):
        metric = self.kerr_ks if use_ks else self.kerr_bl
        r, th, tilt = tilt_field(metric, jnp.asarray(r_grid), jnp.asarray(theta_grid))
        return np.asarray(r), np.asarray(th), np.asarray(tilt)

    def compute_flamm_height(self, r: float) -> float:
        return float(flamm_height(jnp.asarray(r), self._mass))

    def compute_proper_distance(self, r_from: float, r_to: float) -> float:
        return float(proper_distance(r_from, r_to, self._mass, self._spin))

    # -- tick (lib.rs:307-409) ----------------------------------------------------
    def tick(self, dt: float) -> dict:
        """Advance camera kinematics (native bridge) and return the combined
        camera + physics snapshot with the shadow curve, like tick_sab."""
        self.bridge.tick(dt)
        snap = {"camera": self.bridge.camera(), "physics": self.bridge.physics()}
        pts, extents = self.bridge.shadow_curve()
        snap["shadow_curve"] = pts
        snap["shadow_extents"] = extents
        return snap

    def input(self, dx: float = 0.0, dy: float = 0.0, zoom: float = 0.0) -> None:
        self.bridge.input(dx, dy, zoom)

    def start_heartbeat(self, hz: float = 75.0) -> None:
        self.bridge.start(hz)

    def stop_heartbeat(self) -> None:
        self.bridge.stop()

    # -- high-precision single-ray API (lib.rs:421-464) ----------------------------
    def integrate_ray_relativistic(
        self,
        state,
        max_steps: int = 10_000,
        tolerance: float = 1e-8,
        use_ks: bool = True,
        method: IntegrationMethod = IntegrationMethod.RKF45,
    ):
        metric = self.kerr_ks if use_ks else self.kerr_bl
        opts = IntegrationOptions(method=method, tolerance=tolerance, max_steps=max_steps)
        traj = integrate(jnp.asarray(state, jnp.float64), metric, opts)
        return {
            "final_state": np.asarray(traj.final_state),
            "termination": int(traj.termination),
            "steps_taken": int(traj.steps_taken),
            "max_hamiltonian_drift": float(traj.max_hamiltonian_drift),
        }

    def close(self) -> None:
        self.bridge.close()
