"""Bardeen shadow-curve debug overlay (render/overlay.py).

The reference's u_shadowCurve overlay (fragment.glsl.ts:279-325) drawn the
TPU way: per-pixel conserved (lambda, eta) mapped to Bardeen celestial
coordinates, distance-to-polyline against the analytic critical curve.
"""

import dataclasses as dc

import jax.numpy as jnp
import numpy as np

from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
from blackhole_simulation_tpu.physics.shadow import schwarzschild_shadow_radius
from blackhole_simulation_tpu.render import Camera, Features, MarchConfig, Scene, render
from blackhole_simulation_tpu.render.camera import camera_rays
from blackhole_simulation_tpu.render.overlay import (
    pixel_celestial_coords,
    shadow_overlay,
)


def _scene(spin, w=48, h=48, **feat):
    cam = Camera.create(
        r=30.0, theta=jnp.pi / 2 - 0.25, fov=0.6, width=w, height=h
    )
    return Scene.create(
        mass=1.0,
        spin=spin,
        camera=cam,
        features=Features(**feat),
        march_cfg=MarchConfig(max_steps=24),
    )


class TestCelestialCoords:
    def test_schwarzschild_overlay_band_at_critical_radius(self):
        """For a = 0 the curve is the circle b = 3 sqrt(3) M; pixels the
        overlay marks must have conserved impact parameter within a couple
        of line widths of it."""
        scene = _scene(0.0)
        bh = Kerr(mass=jnp.float32(1.0), spin=jnp.float32(0.0), chart=KS)
        rays = camera_rays(scene.camera, bh, dtype=jnp.float32)
        zero = jnp.zeros((rays.shape[0], 3), jnp.float32)
        marked = np.asarray(
            shadow_overlay(
                zero, rays, bh, scene.camera.theta, jnp.float32, line_width=0.3
            )
        )
        weight = marked.max(axis=1)

        alpha, beta, _ = pixel_celestial_coords(
            rays, bh.spin, scene.camera.theta, jnp.float32
        )
        b_pix = np.hypot(np.asarray(alpha), np.asarray(beta))
        b_crit = float(schwarzschild_shadow_radius(1.0))

        on_line = weight > 0.5
        assert on_line.sum() > 20  # the ring is visible
        assert np.all(np.abs(b_pix[on_line] - b_crit) < 0.45)

    def test_kerr_overlay_asymmetric(self):
        """At high spin the prograde edge sits closer to alpha = 0 than the
        retrograde edge — the overlay band inherits the Bardeen asymmetry."""
        scene = _scene(0.95)
        bh = Kerr(mass=jnp.float32(1.0), spin=jnp.float32(0.95), chart=KS)
        rays = camera_rays(scene.camera, bh, dtype=jnp.float32)
        zero = jnp.zeros((rays.shape[0], 3), jnp.float32)
        marked = np.asarray(
            shadow_overlay(
                zero, rays, bh, scene.camera.theta, jnp.float32, line_width=0.3
            )
        )
        weight = marked.max(axis=1)
        alpha, _, _ = pixel_celestial_coords(
            rays, bh.spin, scene.camera.theta, jnp.float32
        )
        alpha = np.asarray(alpha)
        on_line = weight > 0.5
        assert on_line.sum() > 20
        # The D-shape: |min alpha| != |max alpha| on the marked band.
        lo, hi = alpha[on_line].min(), alpha[on_line].max()
        assert abs(abs(lo) - abs(hi)) > 0.5


class TestRenderIntegration:
    def test_feature_flag_composites_lines(self):
        base = np.asarray(render(_scene(0.6)))
        over = np.asarray(render(_scene(0.6, shadow_overlay=True)))
        diff = np.abs(over - base).max(axis=2)
        # A thin band changes, the bulk does not.
        assert (diff > 0.05).sum() > 20
        # At 48x48 the ~1.5-pixel Gaussian band is fat; require the majority
        # of the frame near-unchanged and the far corners untouched (the
        # curve sits at b ~ 5.2 M, corners at b ~ 8+ M).
        assert (diff < 1e-2).mean() > 0.5
        assert diff[:3, :3].max() < 1e-3
        assert np.all(np.isfinite(over))

    def test_default_off(self):
        s = _scene(0.6)
        assert s.features.shadow_overlay is False
