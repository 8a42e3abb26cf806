"""Matter fields: disk/jet densities, four-velocities, stress-energy, BZ power."""

import jax.numpy as jnp
import numpy as np

from blackhole_simulation_tpu.geometry import radii
from blackhole_simulation_tpu.geometry.metrics import BL, Kerr
from blackhole_simulation_tpu.physics.matter import (
    AccretionDisk,
    MatterField,
    RelativisticJet,
    stress_energy_dust,
)


class TestAccretionDisk:
    def test_zero_inside_isco(self):
        disk = AccretionDisk()
        r_in = float(radii.isco(1.0, 0.9))
        assert float(disk.density(1.0, 0.9, r_in * 0.9, jnp.pi / 2)) == 0.0
        assert float(disk.density(1.0, 0.9, r_in * 1.1, jnp.pi / 2)) > 0.0

    def test_gaussian_height(self):
        disk = AccretionDisk(h_ratio=0.1)
        r = 8.0
        mid = float(disk.density(1.0, 0.5, r, jnp.pi / 2))
        off = float(disk.density(1.0, 0.5, r, jnp.pi / 2 - 0.1))
        # one scale height up: expect e^{-0.5} falloff (z = r cos(theta))
        z = r * np.cos(np.pi / 2 - 0.1)
        expected = np.exp(-0.5 * (z / (0.1 * r)) ** 2)
        np.testing.assert_allclose(off / mid, expected, rtol=1e-5)

    def test_four_velocity_normalized(self):
        """u.u = -1 against the BL metric for circular equatorial orbits."""
        bh = Kerr(mass=jnp.asarray(1.0), spin=jnp.asarray(0.9), chart=BL)
        disk = AccretionDisk()
        r = jnp.asarray(8.0)
        u = disk.four_velocity(1.0, 0.9, r, jnp.pi / 2)
        g = bh.covariant(r, jnp.asarray(jnp.pi / 2))
        norm = float(jnp.einsum("i,ij,j->", u, g, u))
        np.testing.assert_allclose(norm, -1.0, atol=1e-6)

    def test_protocol_conformance(self):
        assert isinstance(AccretionDisk(), MatterField)
        assert isinstance(RelativisticJet(), MatterField)


class TestRelativisticJet:
    def test_conical_density(self):
        jet = RelativisticJet(half_angle=0.2)
        on_axis = float(jet.density(1.0, 0.9, 10.0, 0.01))
        off_axis = float(jet.density(1.0, 0.9, 10.0, jnp.pi / 2))
        assert on_axis > 100 * off_axis
        # symmetric about the equator
        south = float(jet.density(1.0, 0.9, 10.0, jnp.pi - 0.01))
        np.testing.assert_allclose(on_axis, south, rtol=1e-6)

    def test_doppler_limits(self):
        jet = RelativisticJet(beta=0.92)
        gamma = 1.0 / np.sqrt(1 - 0.92**2)
        approaching = float(jet.doppler(jnp.asarray(1.0)))
        receding = float(jet.doppler(jnp.asarray(-1.0)))
        np.testing.assert_allclose(approaching, 1 / (gamma * (1 - 0.92)), rtol=1e-6)
        assert approaching > 1.0 > receding

    def test_bz_power_scales_with_spin(self):
        jet = RelativisticJet()
        p_low = float(jet.blandford_znajek_power(1.0, 0.2))
        p_high = float(jet.blandford_znajek_power(1.0, 0.9))
        assert p_high > p_low > 0.0
        assert float(jet.blandford_znajek_power(1.0, 0.0)) == 0.0


class TestStressEnergy:
    def test_dust_trace(self):
        """T = rho u.u = -rho for normalized dust."""
        bh = Kerr(mass=jnp.asarray(1.0), spin=jnp.asarray(0.5), chart=BL)
        disk = AccretionDisk()
        r = jnp.asarray(10.0)
        th = jnp.asarray(jnp.pi / 2)
        rho = disk.density(1.0, 0.5, r, th)
        u = disk.four_velocity(1.0, 0.5, r, th)
        g = bh.covariant(r, th)
        t_con, trace = stress_energy_dust(rho, u, g)
        np.testing.assert_allclose(float(trace), -float(rho), rtol=1e-5)
        assert t_con.shape == (4, 4)
        # symmetric
        np.testing.assert_allclose(np.asarray(t_con), np.asarray(t_con).T, rtol=1e-6)
