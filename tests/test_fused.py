"""Fused render megakernel (ops/pallas_render.py) parity vs the staged
jnp path — interpret mode on CPU (same discipline as test_pallas.py).

The analytic path shares its whole expression DAG with the jnp pipeline,
so agreement is ulp-level except for chaotic critical-band pixels; the
spectral path replaces LUT interpolation with Chebyshev series
(shading.spectral_cheb_coeffs), bounded at ~3% relative, so its gate is a
distribution bound.
"""

import dataclasses as dc

import jax.numpy as jnp
import numpy as np
import pytest

from blackhole_simulation_tpu.render import (
    Camera,
    MarchConfig,
    Scene,
    render,
    render_radiance,
)
from blackhole_simulation_tpu.render.pipeline import Features

pytestmark = pytest.mark.slow  # interpret-mode kernel runs

BASE = MarchConfig(
    max_steps=48,
    use_pallas=True,
    fused=True,
    shadow_precull=True,
    far_step_cap_rate=0.4,
    far_boost_radius=20.0,
    midpoint_iters=1,
)


def _pair(width, height, feats=Features(), spin=0.9, **cfg_over):
    cam = Camera.create(
        r=30.0, theta=jnp.pi / 2 - 0.25, fov=0.5, width=width, height=height
    )
    cfg = dc.replace(BASE, **cfg_over)
    fused = Scene.create(
        mass=1.0, spin=spin, camera=cam, march_cfg=cfg, features=feats
    )
    staged = Scene.create(
        mass=1.0, spin=spin, camera=cam,
        march_cfg=dc.replace(cfg, use_pallas=False, fused=False),
        features=feats,
    )
    return fused, staged


class TestFusedParity:
    def test_analytic_matches_jnp(self):
        fused, staged = _pair(96, 54)
        ia = np.asarray(render_radiance(fused))
        ib = np.asarray(render_radiance(staged))
        d = np.abs(ia - ib)
        # ulp-level except chaotic critical-band pixels
        assert np.percentile(d, 99) < 1e-4, np.percentile(d, 99)
        assert d.mean() < 1e-5, d.mean()

    def test_spectral_matches_jnp_lut(self):
        fused, staged = _pair(96, 54, feats=Features(spectral_lut=True))
        assert fused.spectral_coeffs is not None  # Scene.create precomputed
        ia = np.asarray(render_radiance(fused))
        ib = np.asarray(render_radiance(staged))
        d = np.abs(ia - ib)
        # Chebyshev-vs-LUT-interp tolerance (~3% relative on disk pixels)
        assert np.percentile(d, 99) < 2e-2, np.percentile(d, 99)
        assert d.mean() < 1e-3, d.mean()

    def test_non_tile_multiple_frame(self):
        fused, staged = _pair(50, 21)  # neither dim a (SUB, LANE) multiple
        ia = np.asarray(render_radiance(fused))
        ib = np.asarray(render_radiance(staged))
        assert ia.shape == ib.shape == (21, 50, 3)
        d = np.abs(ia - ib)
        assert np.percentile(d, 99) < 1e-4

    def test_no_precull_and_features_off(self):
        feats = Features(disk=False, starfield=True, photon_ring_glow=False)
        fused, staged = _pair(64, 32, feats=feats, shadow_precull=False)
        ia = np.asarray(render_radiance(fused))
        ib = np.asarray(render_radiance(staged))
        assert np.abs(ia - ib).max() < 1e-3

    def test_full_render_tonemap_path(self):
        fused, staged = _pair(64, 32)
        ia = np.asarray(render(fused, n_samples=2))
        ib = np.asarray(render(staged, n_samples=2))
        assert ia.shape == (32, 64, 3)
        assert np.isfinite(ia).all()
        assert np.abs(ia - ib).mean() < 1e-4

    def test_jets_in_kernel_match_jnp(self):
        # Per-step jet accumulation runs INSIDE the fused kernel's march
        # loop (VERDICT r3 item 5) — parity with the jnp path's per-step
        # accumulation.
        feats = Features(jets=True)
        fused, staged = _pair(48, 24, feats=feats)
        ia = np.asarray(render_radiance(fused))
        ib = np.asarray(render_radiance(staged))
        d = np.abs(ia - ib)
        assert np.isfinite(ia).all()
        assert np.percentile(d, 99) < 1e-4, np.percentile(d, 99)
        # the jets must actually emit something
        no_jets, _ = _pair(48, 24, feats=Features())
        assert np.abs(ia - np.asarray(render_radiance(no_jets))).max() > 1e-4
