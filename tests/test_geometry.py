"""Geometry layer tests — analytic GR oracles.

Mirrors the reference's Rust unit-test strategy (gravitas-core kerr.rs:502-598,
metric_tensor.rs:108-134) and the property-based TS tests
(src/__tests__/physics/kerr-metric.test.ts:19-292): known values, orderings,
monotonicity, cross-chart consistency, and autodiff-vs-finite-difference audit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackhole_simulation_tpu.geometry import Kerr, Minkowski, Schwarzschild, christoffel
from blackhole_simulation_tpu.geometry.metrics import (
    BL,
    KS,
    hamiltonian_bl,
    hamiltonian_ks,
)


def rand_params(n=32, seed=0):
    rng = np.random.default_rng(seed)
    m = rng.uniform(0.5, 5.0, n)
    a = rng.uniform(-0.99, 0.99, n) * m
    return jnp.asarray(m), jnp.asarray(a)


class TestKnownValues:
    def test_schwarzschild_radii(self):
        bh = Schwarzschild(mass=jnp.asarray(1.0))
        assert np.isclose(bh.event_horizon(), 2.0)
        assert np.isclose(bh.photon_sphere(), 3.0)
        assert np.isclose(bh.isco(), 6.0)

    def test_kerr_a0_matches_schwarzschild(self):
        bh = Kerr(mass=jnp.asarray(1.0), spin=jnp.asarray(0.0))
        assert np.isclose(bh.event_horizon(), 2.0)
        assert np.isclose(bh.photon_sphere(True), 3.0)
        assert np.isclose(bh.photon_sphere(False), 3.0)
        assert np.isclose(bh.isco(True), 6.0, atol=1e-6)

    def test_extremal_kerr(self):
        bh = Kerr(mass=jnp.asarray(1.0), spin=jnp.asarray(0.999999))
        assert np.isclose(bh.event_horizon(), 1.0, atol=2e-3)
        assert float(bh.isco(True)) < 1.5
        assert np.isclose(bh.photon_sphere(True), 1.0, atol=5e-3)
        assert np.isclose(bh.photon_sphere(False), 4.0, atol=5e-3)

    def test_ergosphere(self):
        bh = Kerr(mass=jnp.asarray(1.0), spin=jnp.asarray(0.9))
        # poles touch the horizon, equator touches 2M
        assert np.isclose(bh.ergosphere(0.0), bh.event_horizon())
        assert np.isclose(bh.ergosphere(jnp.pi / 2), 2.0)


class TestProperties:
    """Property tests over random (m, a) — kerr-metric.test.ts parity."""

    def test_horizon_bounds_and_monotonicity(self):
        m, a = rand_params()
        bh = Kerr(mass=m, spin=a)
        rh = bh.event_horizon()
        assert np.all(rh > 0) and np.all(rh <= 2 * m + 1e-12)
        # horizon shrinks with |spin|
        bh2 = Kerr(mass=m, spin=a * 0.5)
        assert np.all(bh2.event_horizon() >= rh - 1e-12)

    def test_radius_ordering(self):
        m, a = rand_params()
        bh = Kerr(mass=m, spin=a)
        rh = np.asarray(bh.event_horizon())
        rph = np.asarray(bh.photon_sphere(True))
        risco_pro = np.asarray(bh.isco(True))
        risco_retro = np.asarray(bh.isco(False))
        assert np.all(rh < rph)
        assert np.all(rph < risco_pro)
        assert np.all(risco_pro <= risco_retro + 1e-9)

    def test_time_dilation_range(self):
        m, a = rand_params()
        bh = Kerr(mass=m, spin=a)
        r = 3.0 * m
        td = np.asarray(bh.time_dilation(r, jnp.pi / 2))
        assert np.all(td >= 0) and np.all(td <= 1)
        far = np.asarray(bh.time_dilation(1e6 * m, jnp.pi / 2))
        assert np.allclose(far, 1.0, atol=1e-5)


class TestMetricAlgebra:
    def test_signature_and_inverse(self):
        """cov @ con == identity for both charts (kerr.rs metric tests parity)."""
        for chart in (BL, KS):
            bh = Kerr(mass=jnp.asarray(1.0), spin=jnp.asarray(0.9), chart=chart)
            r = jnp.asarray([3.0, 5.0, 20.0])
            th = jnp.asarray([0.3, 1.2, 2.0])
            g = bh.covariant(r, th)
            gi = bh.contravariant(r, th)
            ident = jnp.einsum("...ij,...jk->...ik", g, gi)
            np.testing.assert_allclose(
                np.asarray(ident), np.broadcast_to(np.eye(4), ident.shape), atol=1e-10
            )
            # Lorentzian signature: det < 0
            assert np.all(np.linalg.det(np.asarray(g)) < 0)

    def test_ks_regular_at_horizon(self):
        bh = Kerr(mass=jnp.asarray(1.0), spin=jnp.asarray(0.999), chart=KS)
        rh = bh.event_horizon()
        g = bh.contravariant(rh, jnp.asarray(1.0))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_minkowski_flat(self):
        mk = Minkowski()
        g = mk.covariant(jnp.asarray(2.0), jnp.asarray(1.0))
        gammas = christoffel(mk, jnp.asarray(5.0), jnp.asarray(1.0))
        # Flat space in spherical coords still has nonzero Gammas, but the
        # Riemann-free check here is H conservation along straight lines;
        # we just sanity check shapes + symmetry Gamma^a_{mn} = Gamma^a_{nm}.
        assert g.shape == (4, 4)
        np.testing.assert_allclose(
            np.asarray(gammas), np.asarray(jnp.swapaxes(gammas, -1, -2)), atol=1e-12
        )


class TestHamiltonianDerivatives:
    """Autodiff dH/dx vs central finite differences — replaces the reference's
    NumericalAudit (invariants/audit.rs:6-48)."""

    @pytest.mark.parametrize("chart,fn", [(BL, hamiltonian_bl), (KS, hamiltonian_ks)])
    def test_against_finite_difference(self, chart, fn):
        m = jnp.asarray(1.0)
        a = jnp.asarray(0.93)
        bh = Kerr(mass=m, spin=a, chart=chart)
        rng = np.random.default_rng(1)
        r = jnp.asarray(rng.uniform(2.5, 30.0, 16))
        th = jnp.asarray(rng.uniform(0.2, np.pi - 0.2, 16))
        p = jnp.asarray(rng.normal(size=(16, 4)))
        dh_dr, dh_dth = bh.hamiltonian_derivatives(r, th, p)
        eps = 1e-6
        fd_r = (fn(m, a, r + eps, th, p) - fn(m, a, r - eps, th, p)) / (2 * eps)
        fd_th = (fn(m, a, r, th + eps, p) - fn(m, a, r, th - eps, p)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(dh_dr), np.asarray(fd_r), rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(dh_dth), np.asarray(fd_th), rtol=1e-5, atol=1e-7)

    def test_bl_ks_hamiltonian_consistency(self):
        """H is chart-invariant once p transforms: p^BL -> p^KS.

        Parity with the reference's BL<->KS invariance test (kerr.rs:569-597).
        With t_KS = t_BL + ∫ 2Mr/Delta dr, phi_KS = phi_BL + ∫ a/Delta dr, the
        covector transform is p_r^KS = p_r^BL - (2Mr/Delta) p_t
        - (a/Delta) p_phi; p_t, p_theta, p_phi unchanged.
        """
        m = jnp.asarray(1.0)
        a = jnp.asarray(0.8)
        rng = np.random.default_rng(2)
        r = jnp.asarray(rng.uniform(2.2, 50.0, 32))
        th = jnp.asarray(rng.uniform(0.1, np.pi - 0.1, 32))
        p_bl = jnp.asarray(rng.normal(size=(32, 4)))
        delta = r * r - 2 * m * r + a * a
        p_ks = p_bl.at[:, 1].add(
            -(2 * m * r / delta) * p_bl[:, 0] - (a / delta) * p_bl[:, 3]
        )
        h_bl = hamiltonian_bl(m, a, r, th, p_bl)
        h_ks = hamiltonian_ks(m, a, r, th, p_ks)
        np.testing.assert_allclose(np.asarray(h_bl), np.asarray(h_ks), rtol=1e-9, atol=1e-9)


class TestGradFlow:
    def test_horizon_differentiable_in_spin(self):
        g = jax.grad(lambda a: Kerr(mass=jnp.asarray(1.0), spin=a).event_horizon())(
            jnp.asarray(0.5)
        )
        # d r+/d a = -a / sqrt(M^2-a^2)
        assert np.isclose(float(g), -0.5 / np.sqrt(0.75), rtol=1e-6)
