"""Physics-layer tests against analytic GR oracles.

Mirrors the reference's Rust unit-test oracles (SURVEY.md §4: disk.rs:222-309,
redshift.rs:134-172, shadow.rs:256-336, hawking).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from blackhole_simulation_tpu.physics import (
    bardeen_shadow,
    blackbody_rgb,
    circular_orbit_energy,
    circular_orbit_omega,
    disk_temperature,
    doppler_factor,
    einstein_angle,
    generate_blackbody_lut,
    generate_temperature_lut,
    gravitational_factor,
    hawking_temperature,
    intensity_scaling,
    kerr_g_factor,
    magnification_point_lens,
    page_thorne_flux,
    planck_law,
    schwarzschild_shadow_radius,
)
from blackhole_simulation_tpu.constants import WIEN_B
from blackhole_simulation_tpu.geometry.metrics import Kerr


class TestDisk:
    def test_flux_zero_at_and_inside_isco(self):
        """Page-Thorne no-torque boundary condition (disk.rs tests)."""
        bh = Kerr(mass=jnp.asarray(1.0), spin=jnp.asarray(0.0))
        r_isco = float(bh.isco())
        f = page_thorne_flux(jnp.array([r_isco * 0.5, r_isco, r_isco * 1.001]), 1.0, 0.0)
        assert float(f[0]) == 0.0
        assert float(f[1]) == 0.0
        assert float(f[2]) >= 0.0

    def test_flux_positive_and_decays(self):
        rs = jnp.array([8.0, 12.0, 30.0, 100.0])
        f = np.asarray(page_thorne_flux(rs, 1.0, 0.0))
        assert np.all(f > 0)
        # Far-field decay ~ r^-3: F(30)/F(100) ~ (100/30)^3 ~ 37
        assert f[2] / f[3] > 15.0

    def test_flux_peak_location_schwarzschild(self):
        """Peak of F(r) for a=0 sits near r ~ 9.5 M (classic NT result)."""
        rs = jnp.linspace(6.05, 30.0, 400)
        f = np.asarray(page_thorne_flux(rs, 1.0, 0.0))
        r_peak = float(rs[int(np.argmax(f))])
        assert 8.5 < r_peak < 11.0

    def test_spin_raises_peak_flux(self):
        rs = jnp.linspace(1.2, 30.0, 600)
        f0 = np.max(np.asarray(page_thorne_flux(rs, 1.0, 0.0)))
        f9 = np.max(np.asarray(page_thorne_flux(rs, 1.0, 0.9)))
        assert f9 > 3.0 * f0

    def test_temperature_lut_normalized(self):
        lut, r_isco, r_max = generate_temperature_lut(1.0, 0.5)
        lut = np.asarray(lut)
        assert lut.shape == (512,)
        assert lut.dtype == np.float32
        np.testing.assert_allclose(lut.max(), 1.0, rtol=1e-5)
        assert float(r_isco) < float(r_max)

    def test_temperature_scale(self):
        t = disk_temperature(jnp.array([10.0]), 1.0, 0.0, t_scale=1e7)
        assert 1e6 < float(t[0]) <= 1.01e7

    def test_circular_orbit_known_values(self):
        """E(6M) = sqrt(8/9) for a=0 (the classic ISCO binding energy)."""
        e = circular_orbit_energy(1.0, 0.0, jnp.asarray(6.0))
        np.testing.assert_allclose(float(e), np.sqrt(8.0 / 9.0), rtol=1e-10)
        om = circular_orbit_omega(1.0, 0.0, jnp.asarray(6.0))
        np.testing.assert_allclose(float(om), 6.0**-1.5, rtol=1e-12)


class TestRedshift:
    def test_gravitational_limits(self):
        assert abs(float(gravitational_factor(1e3)) - 1.0) < 2e-3
        assert float(gravitational_factor(2.0)) == 0.0

    def test_doppler_blue_red(self):
        assert float(doppler_factor(0.5, 1.0)) > 1.0   # approaching: blueshift
        assert float(doppler_factor(0.5, -1.0)) < 1.0  # receding: redshift

    def test_kerr_g_factor_far_field(self):
        g = kerr_g_factor(jnp.asarray(1000.0), 1.0, 0.9, 0.0)
        np.testing.assert_allclose(float(g), 1.0, atol=2e-3)

    def test_kerr_g_factor_redshifted_near_isco(self):
        bh = Kerr(mass=jnp.asarray(1.0), spin=jnp.asarray(0.0))
        g = kerr_g_factor(bh.isco(), 1.0, 0.0, 0.0)
        # Face-on ISCO emitter: g = sqrt(1 - 3M/r) = sqrt(1/2)
        np.testing.assert_allclose(float(g), np.sqrt(0.5), rtol=1e-6)

    def test_blue_red_asymmetry(self):
        """Approaching side (lam aligned with orbit) blueshifted vs receding."""
        r = jnp.asarray(8.0)
        g_app = kerr_g_factor(r, 1.0, 0.5, 4.0)
        g_rec = kerr_g_factor(r, 1.0, 0.5, -4.0)
        assert float(g_app) > float(g_rec)

    def test_intensity_scaling_exponents(self):
        np.testing.assert_allclose(float(intensity_scaling(jnp.asarray(2.0))), 16.0)
        np.testing.assert_allclose(
            float(intensity_scaling(jnp.asarray(2.0), optically_thick=False)), 8.0
        )


class TestShadow:
    def test_schwarzschild_circle(self):
        alpha, beta, valid = bardeen_shadow(1.0, 0.0, jnp.pi / 2, n=32)
        r = np.sqrt(np.asarray(alpha) ** 2 + np.asarray(beta) ** 2)
        np.testing.assert_allclose(r, 3.0 * np.sqrt(3.0), rtol=1e-6)
        assert np.all(np.asarray(valid))

    def test_kerr_shadow_asymmetric_and_shrinks(self):
        """Spin displaces the shadow and flattens the prograde edge
        (shadow.rs Kerr asymmetry tests)."""
        alpha, beta, valid = bardeen_shadow(1.0, 0.9, jnp.pi / 2, n=128)
        alpha = np.asarray(alpha)[np.asarray(valid)]
        beta = np.asarray(beta)[np.asarray(valid)]
        b0 = float(schwarzschild_shadow_radius(1.0))
        width = alpha.max() - alpha.min()
        height = beta.max() - beta.min()
        assert width < 2.0 * b0            # narrower than Schwarzschild diameter
        assert abs(height - 2.0 * b0) < 1.2  # height barely changes
        # Centroid displaced off alpha = 0 (frame dragging).
        assert abs((alpha.max() + alpha.min()) / 2.0) > 0.5

    def test_on_axis_observer_circular(self):
        """Seen down the spin axis the Kerr shadow is circular."""
        alpha, beta, valid = bardeen_shadow(1.0, 0.9, 0.01, n=64)
        r = np.sqrt(np.asarray(alpha) ** 2 + np.asarray(beta) ** 2)
        r = r[np.asarray(valid)]
        assert r.std() / r.mean() < 0.05

    def test_einstein_angle_distance_scaling(self):
        th1 = float(einstein_angle(1.0, 1e6, 2e6))
        th2 = float(einstein_angle(1.0, 4e6, 8e6))
        np.testing.assert_allclose(th1 / th2, 2.0, rtol=1e-10)

    def test_point_lens_magnification(self):
        # mu(1) = 3/sqrt(5) * ... : (1+2)/(1*sqrt(5)) = 3/sqrt(5)
        np.testing.assert_allclose(
            float(magnification_point_lens(1.0)), 3.0 / np.sqrt(5.0), rtol=1e-12
        )
        assert float(magnification_point_lens(0.01)) > 50.0  # diverges at u->0


class TestSpectrum:
    def test_planck_peak_wien(self):
        t = 5800.0
        lams = jnp.linspace(200e-9, 2000e-9, 2000)
        b = np.asarray(planck_law(lams, t))
        lam_peak = float(lams[int(np.argmax(b))])
        np.testing.assert_allclose(lam_peak, WIEN_B / t, rtol=2e-2)

    def test_blackbody_color_temperature_trend(self):
        cool = np.asarray(blackbody_rgb(jnp.asarray(2500.0)))
        hot = np.asarray(blackbody_rgb(jnp.asarray(20000.0)))
        assert cool[0] > cool[2]  # cool: red dominates blue
        assert hot[2] > hot[0]    # hot: blue dominates red

    def test_blackbody_lut_shape_and_finite(self):
        lut = np.asarray(generate_blackbody_lut(width=64, height=16))
        assert lut.shape == (16, 64, 4)
        assert lut.dtype == np.float32
        assert np.all(np.isfinite(lut))
        assert lut[..., 3].max() <= 1.0 + 1e-6


class TestHawking:
    def test_solar_mass_value(self):
        """T_H(1 M_sun, a=0) = 6.17e-8 K (hawking.rs oracle)."""
        np.testing.assert_allclose(float(hawking_temperature(1.0)), 6.17e-8, rtol=1e-2)

    def test_spin_lowers_temperature(self):
        assert float(hawking_temperature(1.0, 0.9)) < float(hawking_temperature(1.0, 0.0))

    def test_mass_scaling(self):
        np.testing.assert_allclose(
            float(hawking_temperature(1.0)) / float(hawking_temperature(10.0)),
            10.0,
            rtol=1e-10,
        )
