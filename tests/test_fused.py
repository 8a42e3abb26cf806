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

    def test_replace_built_spectral_scene_uses_host_coeffs(self):
        """The dataclasses.replace footgun (VERDICT r4 item 4): a scene with
        spectral_lut flipped on AFTER construction must get its Chebyshev
        coefficients from the cached HOST build at the render entry
        (pipeline.ensure_spectral_coeffs) — never from the in-trace f64
        Page-Thorne build (a ~340 s TPU compile)."""
        import jax

        import blackhole_simulation_tpu.render.shading as sh

        fused, _ = _pair(48, 24)
        foot = dc.replace(fused, features=Features(spectral_lut=True))
        assert foot.spectral_coeffs is None

        orig = sh.build_disk_luts
        traced_calls = []

        def spy(bh, disk, dtype=jnp.float32):
            traced_calls.append(isinstance(bh.mass, jax.core.Tracer))
            return orig(bh, disk, dtype)

        sh.build_disk_luts = spy
        try:
            img = np.asarray(render_radiance(foot))
        finally:
            sh.build_disk_luts = orig
        assert np.isfinite(img).all()
        assert not any(traced_calls), "in-trace f64 LUT build occurred"
        # And the backfilled scene must match the Scene.create-built one.
        ref = dc.replace(
            fused,
            features=Features(spectral_lut=True),
            spectral_coeffs=sh.spectral_kernel_tables(
                1.0, float(fused.bh.spin), fused.disk
            ),
        )
        np.testing.assert_allclose(
            img, np.asarray(render_radiance(ref)), atol=1e-6
        )


class TestCriticalBandRefinement:
    """Critical-band refinement pass (VERDICT r4 item 1): the fused
    kernel's band plane, the compacted re-march, and its accuracy win."""

    def test_band_plane_matches_jnp_metric(self):
        from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
        from blackhole_simulation_tpu.ops.pallas_render import (
            pallas_render_sample,
        )
        from blackhole_simulation_tpu.render.camera import camera_rays_u
        from blackhole_simulation_tpu.render.precull import (
            critical_band_metric_u,
        )

        cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.25, fov=0.5,
                            width=96, height=48)
        sc = Scene.create(
            mass=1.0, spin=0.999, camera=cam,
            march_cfg=dc.replace(BASE, step_rate=0.2, refine_band=0.6,
                                 refine_budget=512),
        )
        _, band = pallas_render_sample(sc, None)
        assert band is not None
        bh = Kerr(mass=jnp.float32(1.0), spin=jnp.float32(0.999), chart=KS)
        band_jnp = critical_band_metric_u(
            bh.mass, bh.spin, camera_rays_u(cam, bh)
        )
        d = np.abs(np.asarray(band) - np.asarray(band_jnp))
        assert d.max() < 1e-3, d.max()
        # the band must be a thin minority of pixels
        frac = (np.asarray(band) < 0.6).mean()
        assert 0.0 < frac < 0.05, frac

    def test_fused_refined_matches_staged_refined(self):
        cfg = dict(step_rate=0.2, refine_band=0.5, refine_budget=256,
                   refine_step_rate=0.08, refine_max_steps=192)
        fused, staged = _pair(96, 48, spin=0.97, **cfg)
        ia = np.asarray(render_radiance(fused))
        ib = np.asarray(render_radiance(staged))
        d = np.abs(ia - ib)
        assert np.isfinite(ia).all()
        # selection-boundary pixels may differ; the bulk must agree
        assert np.percentile(d, 99) < 1e-3, np.percentile(d, 99)

    def test_refinement_improves_band_accuracy(self):
        """Refined production render must be closer to the fine reference
        than the unrefined one over the critical band (a=0.999)."""
        from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
        from blackhole_simulation_tpu.render.camera import camera_rays_u
        from blackhole_simulation_tpu.render.precull import (
            critical_band_metric_u,
        )

        cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.25, fov=0.5,
                            width=128, height=64)
        mk = lambda **kw: Scene.create(
            mass=1.0, spin=0.999, camera=cam,
            march_cfg=MarchConfig(
                max_steps=256, shadow_precull=True, far_step_cap_rate=0.4,
                far_boost_radius=20.0, midpoint_iters=1, **kw,
            ),
        )
        coarse = mk(step_rate=0.2)
        refined = mk(step_rate=0.2, refine_band=0.6, refine_budget=512,
                     refine_step_rate=0.06, refine_max_steps=1024)
        fine = mk(step_rate=0.03, max_step=1.0)
        ic = np.asarray(render_radiance(coarse))
        ir = np.asarray(render_radiance(refined))
        fn = np.asarray(render_radiance(fine))
        bh = Kerr(mass=jnp.float32(1.0), spin=jnp.float32(0.999), chart=KS)
        band = np.asarray(
            critical_band_metric_u(bh.mass, bh.spin, camera_rays_u(cam, bh))
        ).reshape(64, 128)
        msk = band < 0.6
        err_c = np.abs(ic - fn).max(axis=2)[msk].mean()
        err_r = np.abs(ir - fn).max(axis=2)[msk].mean()
        assert err_r < 0.75 * err_c, (err_r, err_c)
        # non-band pixels are untouched by the pass
        d_out = np.abs(ir - ic).max(axis=2)[~msk]
        assert np.percentile(d_out, 99.9) < 1e-5

    def test_shadow_overlay_in_kernel_matches_staged(self):
        """VERDICT r4 item 4: the fused kernel composites the Bardeen
        critical-curve overlay IN-KERNEL (distance to the SMEM polyline)
        and must match the staged post-pass (render/overlay.py) exactly —
        same conserved-space math, same Gaussian width."""
        feats = Features(shadow_overlay=True)
        fused, staged = _pair(96, 48, feats=feats)
        ia = np.asarray(render(fused, n_samples=1))
        ib = np.asarray(render(staged, n_samples=1))
        d = np.abs(ia - ib)
        assert np.percentile(d, 99) < 1e-4, np.percentile(d, 99)
        # and the overlay actually draws something
        off, _ = _pair(96, 48)
        assert np.abs(ia - np.asarray(render(off, n_samples=1))).max() > 0.1

    def test_nrs_far_field_in_kernel_matches_staged(self):
        """VERDICT r4 item 4: Features.nrs_far_field runs the FUSED path
        (MLP in SMEM + Rodrigues deflection in-kernel) and matches the
        staged nrs_far_field_rows pipeline."""
        from blackhole_simulation_tpu.models.nrs import nrs_init

        cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.25, fov=1.0,
                            width=96, height=48)
        feats = Features(nrs_far_field=True)
        params = nrs_init(0)  # parity needs identical weights, not accuracy
        mk = lambda c: Scene.create(mass=1.0, spin=0.9, camera=cam,
                                    march_cfg=c, features=feats,
                                    nrs_params=params)
        fused = mk(dc.replace(BASE, max_steps=64))
        staged = mk(dc.replace(BASE, max_steps=64, use_pallas=False,
                               fused=False))
        ia = np.asarray(render_radiance(fused))
        ib = np.asarray(render_radiance(staged))
        d = np.abs(ia - ib)
        assert np.isfinite(ia).all()
        assert np.percentile(d, 99) < 1e-4, np.percentile(d, 99)
