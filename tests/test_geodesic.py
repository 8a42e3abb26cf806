"""Geodesic integrator tests against analytic GR oracles.

Mirrors the reference's test strategy (SURVEY.md §4): known GR values,
cross-coordinate consistency (kerr.rs:569-597), conservation-law audits,
and integrator behavior (capture vs escape at the critical impact parameter).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackhole_simulation_tpu.geometry.metrics import BL, KS, Kerr, Minkowski, Schwarzschild
from blackhole_simulation_tpu.geodesic import (
    IntegrationMethod,
    IntegrationOptions,
    TERM_ESCAPE,
    TERM_HORIZON,
    constants_of_motion,
    hamiltonian,
    integrate,
    integrate_path,
    null_ray,
    pack_state,
    renormalize_null,
)


def equatorial_photon(metric, r0, b, ingoing=True):
    """Null ray in the equatorial plane with E=1, L_z=b, at radius r0."""
    x = jnp.array([0.0, r0, jnp.pi / 2, 0.0])
    pr0 = -1.0 if ingoing else 1.0
    p_spatial = jnp.array([pr0, 0.0, b])
    return null_ray(x, p_spatial, metric)


class TestNullRayConstruction:
    def test_null_after_construction(self):
        m = Kerr(mass=jnp.asarray(1.0), spin=jnp.asarray(0.9))
        y = equatorial_photon(m, 30.0, 5.0)
        assert abs(float(hamiltonian(y, m))) < 1e-12

    def test_renormalize_projects_batch(self):
        m = Schwarzschild(mass=jnp.asarray(1.0))
        x = jnp.tile(jnp.array([0.0, 20.0, jnp.pi / 2, 0.0]), (4, 1))
        p = jnp.stack(
            [jnp.array([-1.0, -0.9 - 0.1 * i, 0.02, 3.0]) for i in range(4)]
        )
        y = renormalize_null(pack_state(x, p), m)
        np.testing.assert_allclose(np.asarray(hamiltonian(y, m)), 0.0, atol=1e-12)


class TestChartConsistency:
    """BL <-> KS Hamiltonian invariance under the covector transform
    p_r^KS = p_r^BL - (2Mr/Delta) p_t - (a/Delta) p_phi (kerr.rs:569-597)."""

    @pytest.mark.parametrize("a", [0.0, 0.5, 0.999])
    def test_hamiltonian_invariant_under_chart_transform(self, a):
        mass = 1.0
        kerr_bl = Kerr(mass=jnp.asarray(mass), spin=jnp.asarray(a), chart=BL)
        kerr_ks = kerr_bl.with_chart(KS)
        r, theta = 5.0, 1.1
        delta = r * r - 2.0 * mass * r + a * a
        p_bl = jnp.array([-1.0, 0.3, 0.2, 4.0])
        pr_ks = p_bl[1] - (2.0 * mass * r / delta) * p_bl[0] - (a / delta) * p_bl[3]
        p_ks = p_bl.at[1].set(pr_ks)
        h_bl = kerr_bl.hamiltonian(jnp.asarray(r), jnp.asarray(theta), p_bl)
        h_ks = kerr_ks.hamiltonian(jnp.asarray(r), jnp.asarray(theta), p_ks)
        np.testing.assert_allclose(float(h_bl), float(h_ks), rtol=1e-10)


class TestMinkowskiStraightLine:
    def test_radial_ray_travels_straight(self):
        m = Minkowski()
        y0 = equatorial_photon(m, 10.0, 0.0, ingoing=False)
        opts = IntegrationOptions(max_steps=4000, escape_radius=100.0)
        traj = integrate(y0, m, opts)
        assert int(traj.termination) == TERM_ESCAPE
        # phi unchanged for a radial ray; coordinate time equals distance.
        assert abs(float(traj.final_state[3])) < 1e-8
        r_final = float(traj.final_state[1])
        t_final = float(traj.final_state[0])
        np.testing.assert_allclose(t_final, r_final - 10.0, rtol=1e-6)

    def test_hamiltonian_drift_tiny(self):
        m = Minkowski()
        y0 = equatorial_photon(m, 10.0, 3.0, ingoing=False)
        traj = integrate(y0, m, IntegrationOptions(max_steps=4000, escape_radius=100.0))
        assert float(traj.max_hamiltonian_drift) < 1e-8


class TestSchwarzschildCapture:
    """Critical impact parameter b_crit = 3*sqrt(3) M ~ 5.196: inside -> horizon,
    outside -> escape (the sharpest end-to-end check of the whole integrator)."""

    def setup_method(self):
        self.m = Schwarzschild(mass=jnp.asarray(1.0))
        self.opts = IntegrationOptions(max_steps=20_000, escape_radius=200.0)

    def test_subcritical_ray_captured(self):
        y0 = equatorial_photon(self.m, 50.0, 5.0)
        traj = integrate(y0, self.m, self.opts)
        assert int(traj.termination) == TERM_HORIZON

    def test_supercritical_ray_escapes(self):
        y0 = equatorial_photon(self.m, 50.0, 5.4)
        traj = integrate(y0, self.m, self.opts)
        assert int(traj.termination) == TERM_ESCAPE

    def test_batch_of_rays_splits_at_critical_b(self):
        bs = jnp.array([0.0, 2.0, 4.0, 5.0, 5.4, 7.0, 12.0])
        y0 = jax.vmap(lambda b: equatorial_photon(self.m, 50.0, b))(bs)
        traj = integrate(y0, self.m, self.opts)
        b_crit = 3.0 * np.sqrt(3.0)
        expected = np.where(np.asarray(bs) < b_crit, TERM_HORIZON, TERM_ESCAPE)
        np.testing.assert_array_equal(np.asarray(traj.termination), expected)

    def test_weak_field_deflection(self):
        """Deflection of a grazing ray ~ 4M/b + (15 pi/4)(M/b)^2 for b >> M."""
        b = 20.0
        y0 = equatorial_photon(self.m, 400.0, b)
        opts = IntegrationOptions(max_steps=60_000, escape_radius=500.0, tolerance=1e-10)
        traj = integrate(y0, self.m, opts)
        assert int(traj.termination) == TERM_ESCAPE
        # Incoming direction was -r_hat at phi=0 (phi increases as ray swings by).
        # Total swing of an undeflected ray through closest approach is pi.
        phi_out = float(traj.final_state[3])
        pr, pph = float(traj.final_state[5]), float(traj.final_state[7])
        r_out = float(traj.final_state[1])
        # Outgoing direction angle relative to radial: asymptotically the
        # deflection is (phi_swing - pi) + residual angle at finite radius.
        out_angle = np.arctan2(pph / r_out, pr)
        in_angle = np.arcsin(b / 400.0)  # incoming asymptote at phi ~ -asin(b/r0)
        deflection = phi_out + out_angle + in_angle - np.pi
        expected = 4.0 / b + (15.0 * np.pi / 4.0) / b**2
        np.testing.assert_allclose(deflection, expected, rtol=0.05)


class TestConservation:
    def test_kerr_constants_conserved_off_equatorial(self):
        m = Kerr(mass=jnp.asarray(1.0), spin=jnp.asarray(0.9), chart=BL)
        x = jnp.array([0.0, 20.0, 1.0, 0.0])
        y0 = null_ray(x, jnp.array([-1.0, 0.15, 4.0]), m)
        c0 = constants_of_motion(y0, m)
        traj = integrate(y0, m, IntegrationOptions(max_steps=30_000, escape_radius=100.0))
        c1 = constants_of_motion(traj.final_state, m)
        np.testing.assert_allclose(float(c1.energy), float(c0.energy), rtol=1e-12)
        np.testing.assert_allclose(
            float(c1.angular_momentum), float(c0.angular_momentum), rtol=1e-12
        )
        np.testing.assert_allclose(
            float(c1.carter_constant), float(c0.carter_constant), rtol=1e-5, atol=1e-7
        )
        assert float(traj.max_hamiltonian_drift) < 1e-7

    def test_ks_chart_crosses_horizon_smoothly(self):
        """In the horizon-regular KS chart a captured ray reaches r < r+ with
        bounded H drift — the property BL cannot deliver (Delta -> 0)."""
        m = Kerr(mass=jnp.asarray(1.0), spin=jnp.asarray(0.999), chart=KS)
        y0 = equatorial_photon(m, 20.0, 1.0)
        traj = integrate(y0, m, IntegrationOptions(max_steps=30_000))
        assert int(traj.termination) == TERM_HORIZON
        assert float(traj.max_hamiltonian_drift) < 1e-6


class TestFixedStepMethods:
    @pytest.mark.parametrize(
        "method", [IntegrationMethod.RK4, IntegrationMethod.SYMPLECTIC]
    )
    def test_fixed_step_methods_agree_with_rkf45(self, method):
        m = Schwarzschild(mass=jnp.asarray(1.0))
        y0 = equatorial_photon(m, 30.0, 8.0)
        ref = integrate(y0, m, IntegrationOptions(max_steps=40_000, escape_radius=60.0))
        opts = IntegrationOptions(
            method=method, initial_step=5e-3, max_steps=40_000, escape_radius=60.0
        )
        got = integrate(y0, m, opts)
        assert int(got.termination) == int(ref.termination) == TERM_ESCAPE
        # Compare phi at escape between methods. The exit overshoot past
        # escape_radius differs per method, so allow a small angular slack.
        np.testing.assert_allclose(
            float(got.final_state[3]), float(ref.final_state[3]), atol=2e-2
        )

    def test_integrate_path_records_shape(self):
        m = Schwarzschild(mass=jnp.asarray(1.0))
        y0 = equatorial_photon(m, 10.0, 3.0)
        traj = integrate_path(y0, m, n_steps=50, step_size=0.05)
        assert traj.path.shape == (51, 8)
        # Path r decreases monotonically for this plunging ray while live.
        r_path = np.asarray(traj.path[:, 1])
        assert r_path[10] < r_path[0]


class TestJitAndGrad:
    def test_integrate_jits(self):
        m = Schwarzschild(mass=jnp.asarray(1.0))
        y0 = equatorial_photon(m, 30.0, 7.0)
        opts = IntegrationOptions(max_steps=10_000, escape_radius=60.0)
        fn = jax.jit(lambda y: integrate(y, m, opts).final_state)
        np.testing.assert_allclose(
            np.asarray(fn(y0)), np.asarray(integrate(y0, m, opts).final_state), rtol=1e-12
        )

    def test_gradient_through_fixed_step_march(self):
        """d(final phi)/d(spin) through a short fixed-step march is finite and
        matches central finite differences — the differentiability contract."""

        def final_phi(a):
            m = Kerr(mass=jnp.asarray(1.0), spin=a, chart=KS)
            y0 = equatorial_photon(m, 15.0, 6.5)
            traj = integrate_path(y0, m, n_steps=200, step_size=0.05)
            return traj.final_state[3]

        g = jax.grad(final_phi)(jnp.asarray(0.5))
        eps = 1e-5
        fd = (final_phi(jnp.asarray(0.5 + eps)) - final_phi(jnp.asarray(0.5 - eps))) / (
            2 * eps
        )
        assert np.isfinite(float(g))
        np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)
