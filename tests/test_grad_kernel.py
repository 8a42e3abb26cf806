"""Pallas gradient kernel (ops/pallas_grad.py) vs jnp reverse-mode AD.

Interpret mode on CPU: the grad kernel's checkpoint/replay VJP must agree
with jax.grad through the jnp march (the same DAG, ordinary AD) for smooth
losses touching every differentiable output (final state, crossing
records, r_min_ph) and every differentiable input (rays, spin, mass).
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
from blackhole_simulation_tpu.render import Camera, MarchConfig
from blackhole_simulation_tpu.render.camera import camera_rays_u
from blackhole_simulation_tpu.render.march import march_rows, march_rows_ad

pytestmark = pytest.mark.slow  # interpret-mode kernel runs

CAM = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.25, fov=0.5, width=48,
                    height=32)
CFG = MarchConfig(max_steps=48, shadow_precull=False, remat_every=0)


def _loss(spin, fn, cfg=CFG, mass=1.0):
    bh = Kerr(mass=jnp.asarray(mass, jnp.float32), spin=spin, chart=KS)
    rays = camera_rays_u(CAM, bh, dtype=jnp.float32)
    rows = fn(rays, bh, cfg)
    w = jnp.exp(-rows.r_min_ph)
    return (
        jnp.mean(rows.state_u[1])
        + 0.1 * jnp.mean(rows.cross_r)
        + 0.05 * jnp.mean(rows.cross_phi)
        + 0.02 * jnp.mean(rows.cross_t)
        + 0.01 * jnp.mean(w)
    )


class TestGradKernel:
    @pytest.mark.parametrize("spin", [0.3, 0.9])
    def test_dspin_matches_jnp_ad(self, spin):
        g_ref = jax.grad(lambda s: _loss(s, march_rows))(jnp.float32(spin))
        g_ker = jax.grad(lambda s: _loss(s, lambda y, b, c: march_rows_ad(y, b, c)))(
            jnp.float32(spin)
        )
        rel = abs(float(g_ker) - float(g_ref)) / max(abs(float(g_ref)), 1e-9)
        assert np.isfinite(float(g_ker))
        assert rel < 5e-3, (float(g_ref), float(g_ker))

    def test_values_match_forward(self):
        bh = Kerr(mass=jnp.float32(1.0), spin=jnp.float32(0.9), chart=KS)
        rays = camera_rays_u(CAM, bh, dtype=jnp.float32)
        a = march_rows(rays, bh, CFG)
        b = march_rows_ad(rays, bh, CFG)
        # Bulk agreement at the renorm-boundary ulp level; ~0.1% of
        # entries are chaotic near-critical rays where ulp divergence
        # amplifies (the usual critical-band exception).
        sa, sb = np.asarray(a.state_u), np.asarray(b.state_u)
        rel = np.abs(sa - sb) / (np.abs(sa) + 1e-3)
        assert (rel < 1e-4).mean() > 0.997, (rel < 1e-4).mean()
        assert (np.asarray(a.hit) == np.asarray(b.hit)).mean() > 0.995
        ca, cb = np.asarray(a.cross_r), np.asarray(b.cross_r)
        assert (np.abs(ca - cb) < 1e-3).mean() > 0.997

    def test_dray_cotangents_match(self):
        """Per-ray cotangents (the camera chain rule input) match jnp AD."""
        bh = Kerr(mass=jnp.float32(1.0), spin=jnp.float32(0.7), chart=KS)
        rays = camera_rays_u(CAM, bh, dtype=jnp.float32)

        def loss_of_rays(r, fn):
            rows = fn(r, bh, CFG)
            return jnp.mean(rows.state_u[1]) + 0.1 * jnp.mean(rows.cross_r)

        g_ref = jax.grad(lambda r: loss_of_rays(r, march_rows))(rays)
        g_ker = jax.grad(
            lambda r: loss_of_rays(r, lambda y, b, c: march_rows_ad(y, b, c))
        )(rays)
        ref = np.asarray(g_ref)
        ker = np.asarray(g_ker)
        assert np.isfinite(ker).all()
        # bulk agreement; chaotic near-critical rays excluded by quantile
        d = np.abs(ref - ker)
        scale = np.abs(ref) + 1e-6
        assert np.quantile(d / scale, 0.95) < 1e-2

    def test_precull_and_remat_variants(self):
        cfg = dc.replace(CFG, shadow_precull=True)
        g_ref = jax.grad(lambda s: _loss(s, march_rows, cfg))(jnp.float32(0.8))
        g_ker = jax.grad(
            lambda s: _loss(s, lambda y, b, c: march_rows_ad(y, b, c), cfg)
        )(jnp.float32(0.8))
        rel = abs(float(g_ker) - float(g_ref)) / max(abs(float(g_ref)), 1e-9)
        assert rel < 5e-3

    def test_dmass_matches(self):
        def loss_m(mass, fn):
            return _loss(jnp.float32(0.6), fn, mass=mass)

        g_ref = jax.grad(lambda mm: loss_m(mm, march_rows))(jnp.float32(1.0))
        g_ker = jax.grad(
            lambda mm: loss_m(mm, lambda y, b, c: march_rows_ad(y, b, c))
        )(jnp.float32(1.0))
        rel = abs(float(g_ker) - float(g_ref)) / max(abs(float(g_ref)), 1e-9)
        # d/d(mass) sums many near-cancelling per-ray terms; the two paths'
        # ulp streams differ (renorm boundary form), measured ~6e-3.
        assert rel < 2e-2

    def test_cotangent_clip_matches_jnp(self):
        """MarchConfig.cotangent_clip in the KERNEL VJP (r5): the per-step
        adjoint clip must match the jnp path's clip_cotangent transpose —
        this is what lets the AD inverse curriculum run at kernel speed."""
        cfg = dc.replace(CFG, cotangent_clip=0.05)
        spin = jnp.float32(0.9)
        g_ref = jax.grad(lambda s: _loss(s, march_rows, cfg))(spin)
        g_ker = jax.grad(
            lambda s: _loss(s, lambda y, b, c: march_rows_ad(y, b, c), cfg)
        )(spin)
        rel = abs(float(g_ker) - float(g_ref)) / max(abs(float(g_ref)), 1e-9)
        assert np.isfinite(float(g_ker))
        # clip-threshold ulp flips loosen the bound vs the unclipped test
        assert rel < 2e-2, (float(g_ref), float(g_ker))
        # and the clip must actually change the gradient
        g_unclipped = jax.grad(
            lambda s: _loss(s, lambda y, b, c: march_rows_ad(y, b, c), CFG)
        )(spin)
        assert abs(float(g_ker) - float(g_unclipped)) > 1e-9
