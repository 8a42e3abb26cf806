"""ops/ kernel tests: the sparse KS kernel must match the general
autodiff-metric path to round-off — the Pallas-vs-jnp-reference pattern of
SURVEY.md §4 applied at the first kernel level."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
from blackhole_simulation_tpu.geodesic import (
    hamiltonian,
    renormalize_null,
    state_derivative,
)
from blackhole_simulation_tpu.geodesic.integrator import symplectic_step
from blackhole_simulation_tpu.ops import (
    ks_hamiltonian,
    ks_renormalize,
    ks_rhs,
    ks_symplectic_step,
)


def random_states(n=64, seed=0):
    rng = np.random.default_rng(seed)
    r = rng.uniform(1.3, 50.0, n)
    th = rng.uniform(0.15, np.pi - 0.15, n)
    ph = rng.uniform(0, 2 * np.pi, n)
    t = rng.uniform(0, 10, n)
    pt = -rng.uniform(0.5, 1.5, n)
    pr = rng.normal(0, 1, n)
    pth = rng.normal(0, 2, n)
    pph = rng.normal(0, 3, n)
    return jnp.asarray(np.stack([t, r, th, ph, pt, pr, pth, pph], axis=-1))


@pytest.mark.parametrize("a", [0.0, 0.7, 0.999])
class TestSparseKernelMatchesAutodiff:
    def test_hamiltonian(self, a):
        bh = Kerr(mass=jnp.asarray(1.0), spin=jnp.asarray(a), chart=KS)
        y = random_states()
        np.testing.assert_allclose(
            np.asarray(ks_hamiltonian(bh.mass, bh.spin, y)),
            np.asarray(hamiltonian(y, bh)),
            rtol=1e-12,
            atol=1e-12,
        )

    def test_rhs(self, a):
        """Hand-derived dH/dr, dH/dth vs reverse-mode autodiff of H."""
        bh = Kerr(mass=jnp.asarray(1.0), spin=jnp.asarray(a), chart=KS)
        y = random_states()
        got = np.asarray(ks_rhs(bh.mass, bh.spin, y))
        want = np.asarray(state_derivative(bh, y))
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)

    def test_renormalize(self, a):
        bh = Kerr(mass=jnp.asarray(1.0), spin=jnp.asarray(a), chart=KS)
        y = random_states()
        got = np.asarray(ks_renormalize(bh.mass, bh.spin, y))
        want = np.asarray(renormalize_null(y, bh))
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)

    def test_symplectic_step(self, a):
        bh = Kerr(mass=jnp.asarray(1.0), spin=jnp.asarray(a), chart=KS)
        y = random_states()
        h = jnp.full(y.shape[:-1], 0.01, y.dtype)
        got = np.asarray(ks_symplectic_step(bh.mass, bh.spin, y, h))
        want = np.asarray(symplectic_step(bh, y, h))
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


class TestKernelGrad:
    def test_rhs_differentiable_wrt_spin(self):
        y = random_states(8)

        def f(a):
            return jnp.sum(ks_rhs(jnp.asarray(1.0), a, y) ** 2)

        g = jax.grad(f)(jnp.asarray(0.8))
        eps = 1e-6
        fd = (f(jnp.asarray(0.8 + eps)) - f(jnp.asarray(0.8 - eps))) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)
