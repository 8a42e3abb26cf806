"""Spacetime-field tests against closed-form GR values."""

import jax.numpy as jnp
import numpy as np

from blackhole_simulation_tpu.geometry.metrics import KS, Kerr, Minkowski, Schwarzschild
from blackhole_simulation_tpu.spacetime import (
    curvature_field,
    embedding_mesh,
    ergosphere_mesh,
    flamm_height,
    frame_dragging_omega,
    kerr_embedding_height,
    kretschmann_kerr,
    kretschmann_schwarzschild,
    light_cone_tilt,
    proper_distance,
    tilt_field,
)


class TestCurvature:
    def test_schwarzschild_limit(self):
        k = kretschmann_kerr(1.0, 0.0, jnp.asarray(5.0), jnp.asarray(1.0))
        np.testing.assert_allclose(float(k), 48.0 / 5.0**6, rtol=1e-12)
        np.testing.assert_allclose(
            float(kretschmann_schwarzschild(1.0, jnp.asarray(5.0))), 48.0 / 5.0**6
        )

    def test_equatorial_kerr_matches_r6(self):
        """On the equator cos(theta) = 0 so K = 48 M^2 / r^6 for any spin."""
        k = kretschmann_kerr(1.0, 0.95, jnp.asarray(3.0), jnp.asarray(jnp.pi / 2))
        np.testing.assert_allclose(float(k), 48.0 / 3.0**6, rtol=1e-10)

    def test_field_shape(self):
        r, th, k = curvature_field(1.0, 0.5, jnp.linspace(2, 10, 8), jnp.linspace(0.1, 3.0, 5))
        assert r.shape == th.shape == k.shape == (8, 5)
        assert np.all(np.isfinite(np.asarray(k)))


class TestEmbedding:
    def test_flamm_values(self):
        """z(r_s) = 0; z(4M) = 2 sqrt(2*2) = 4 for M=1 (embedding.rs oracle)."""
        assert float(flamm_height(jnp.asarray(2.0), 1.0)) == 0.0
        np.testing.assert_allclose(float(flamm_height(jnp.asarray(4.0), 1.0)), 4.0)

    def test_kerr_embedding_monotone(self):
        rs = jnp.array([2.5, 4.0, 8.0, 16.0])
        z = np.asarray(kerr_embedding_height(rs, 1.0, 0.5))
        assert np.all(np.diff(z) > 0)
        assert np.all(np.isfinite(z))

    def test_proper_distance_exceeds_coordinate(self):
        """sqrt(g_rr) > 1 outside the horizon -> proper > coordinate distance."""
        d = float(proper_distance(3.0, 10.0, 1.0, 0.0))
        assert d > 7.0
        # Far-field: approaches coordinate distance.
        d_far = float(proper_distance(1000.0, 1010.0, 1.0, 0.0))
        np.testing.assert_allclose(d_far, 10.0, rtol=5e-3)

    def test_mesh_shapes(self):
        mesh = np.asarray(embedding_mesh(1.0, 0.5, n_r=8, n_phi=12))
        assert mesh.shape == (96, 3)
        assert mesh.dtype == np.float32


class TestFrameDrag:
    def test_omega_sign_and_falloff(self):
        om_near = float(frame_dragging_omega(1.0, 0.9, jnp.asarray(2.0), jnp.asarray(jnp.pi / 2)))
        om_far = float(frame_dragging_omega(1.0, 0.9, jnp.asarray(50.0), jnp.asarray(jnp.pi / 2)))
        assert om_near > om_far > 0.0
        # omega ~ 2 M a / r^3 far away
        np.testing.assert_allclose(om_far, 2.0 * 0.9 / 50.0**3, rtol=1e-2)

    def test_retrograde_flips_sign(self):
        om = float(frame_dragging_omega(1.0, -0.9, jnp.asarray(3.0), jnp.asarray(jnp.pi / 2)))
        assert om < 0.0

    def test_ergosphere_mesh_radii(self):
        """Equatorial ergo radius = 2M; polar = r+ (for M=1, a=0.9)."""
        mesh = np.asarray(ergosphere_mesh(1.0, 0.9, n_theta=64, n_phi=8))
        radii = np.linalg.norm(mesh, axis=1)
        np.testing.assert_allclose(radii.max(), 2.0, rtol=1e-3)
        r_plus = 1.0 + np.sqrt(1.0 - 0.81)
        np.testing.assert_allclose(radii.min(), r_plus, rtol=2e-2)


class TestLightCone:
    def test_flat_space_45_degrees(self):
        tilt = float(light_cone_tilt(Minkowski(), 10.0, jnp.pi / 2))
        np.testing.assert_allclose(tilt, np.pi / 4, rtol=1e-12)

    def test_cone_closes_at_horizon(self):
        m = Schwarzschild(mass=jnp.asarray(1.0))
        t_far = float(light_cone_tilt(m, 100.0, jnp.pi / 2))
        t_near = float(light_cone_tilt(m, 2.01, jnp.pi / 2))
        assert t_near < 0.1 < t_far

    def test_ks_chart_nondiagonal_branch_finite(self):
        m = Kerr(mass=jnp.asarray(1.0), spin=jnp.asarray(0.9), chart=KS)
        r, th, tilt = tilt_field(m, jnp.linspace(1.2, 10.0, 8), jnp.linspace(0.3, 2.8, 6))
        assert np.all(np.isfinite(np.asarray(tilt)))
        assert np.all(np.asarray(tilt) >= 0.0)
