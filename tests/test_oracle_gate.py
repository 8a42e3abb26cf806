"""THE BASELINE correctness gate: fast path vs the f64 RKF45 oracle.

BASELINE.md targets: "image and d(pixel)/d(spin) allclose vs f64 CPU RKF45
reference at a = 0.999". The oracle is geodesic/oracle.py (adaptive
Fehlberg in f64, tolerance 1e-10 — mirroring gravitas-core
geodesic/integrator.rs:113-190 + mod.rs:180-253); both paths drive the
IDENTICAL shading code, so every difference is integration error.

Tolerance rationale (documented per VERDICT r2 item 3):
 - The march is chaotic near the photon sphere: a near-critical ray's f32
   round-off e-folds over the orbit and can flip capture/escape. Those
   pixels live on the measure-zero critical curve; they are bounded in
   NUMBER (outlier fraction), not in value.
 - Away from the critical curve the fast path is a 2nd-order symplectic
   integrator in f32 with per-16-step renormalization: per-pixel radiance
   agrees to ~1e-3 absolute (radiance is O(1) after the starfield scale).
 - Gradients: compared through a fixed random pixel weighting restricted
   to oracle-stable pixels (per-pixel FD at two step sizes must agree),
   because d(pixel)/d(spin) on critical-curve pixels is genuinely
   divergent as a -> a_crit(pixel) — no integrator computes it.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackhole_simulation_tpu.render import (
    Camera,
    Features,
    MarchConfig,
    Scene,
    StarfieldParams,
    oracle_render,
    render_radiance,
)

# The gate background is the smooth nebula only (star density 0): the
# hashed star spots are exp(-40 d^2) deltas in direction space, so an
# f32-level ~1e-3 rad phase error — which IS the fast path's accuracy, and
# is bounded separately below — becomes an O(1) radiance difference at a
# star's edge. Star-position accuracy is exactly the direction bound, so
# asserting it through delta-function shading would only re-test the same
# quantity with an amplified, binary metric.
_GATE_STARS = StarfieldParams(density=0.0)


def _gate_scene(spin, width, height, disk, max_steps=256):
    cam = Camera.create(
        r=30.0, theta=jnp.pi / 2 - 0.25, fov=0.5, width=width, height=height
    )
    return Scene.create(
        mass=1.0,
        spin=spin,
        camera=cam,
        features=Features(disk=disk),
        stars=_GATE_STARS,
        march_cfg=MarchConfig(max_steps=max_steps),
    )


class TestImageGate:
    """BASELINE configs[0]: Schwarzschild, no disk — image allclose."""

    def test_schwarzschild_image_matches_oracle(self):
        # 96x96 in CI (the oracle integrates every ray at tol 1e-10 on CPU);
        # the geometry (shadow, lensed background, photon ring) is fully
        # exercised at this size. Run BH_GATE_FULL=1 for the 256^2 version.
        # The fast path runs its VALIDATION step config (step_rate 0.03):
        # the production step_rate 0.12 trades ~5 mrad of median deflection
        # phase for 4x throughput (measured, see
        # test_fast_march_converges_to_oracle, which pins the production
        # config's error and its 2nd-order convergence to this one).
        import os

        size = 256 if os.environ.get("BH_GATE_FULL") else 96
        scene = _gate_scene(0.0, size, size, disk=False)
        fine = dataclasses.replace(
            scene,
            march_cfg=dataclasses.replace(
                scene.march_cfg, step_rate=0.03, max_steps=1024
            ),
        )
        img_fast = np.asarray(render_radiance(fine))
        img_oracle = np.asarray(oracle_render(scene)).astype(np.float32)

        d = np.abs(img_fast - img_oracle).max(axis=2)
        # Bulk: allclose at the f32 march's phase accuracy through the
        # smooth background (|grad| <~ 2 per radian of direction). Outliers
        # are the ~1-pixel-wide critical-curve band where capture/escape
        # flips under any perturbation (chaotic; ~2% of pixels at 96^2 —
        # the band is O(circumference/area) and shrinks with resolution).
        assert (d < 5e-3).mean() > 0.96, (
            f"only {(d < 5e-3).mean():.4f} of pixels within 5e-3"
        )
        # Bulk mean with the critical band excluded: the plain mean is
        # dominated by the ~2% band pixels (each O(0.1-0.5) where
        # capture/escape or ring glow flips), which the fraction bound
        # already constrains in number.
        trimmed = np.sort(d.reshape(-1))[: int(d.size * 0.975)]
        assert trimmed.mean() < 5e-4, f"trimmed mean {trimmed.mean():.2e}"

    def test_fast_march_converges_to_oracle(self):
        """2nd-order convergence of the fast march TO the oracle: halving
        the step rate must better-than-halve the median escape-direction
        error. This pins the production config's accuracy (~5 mrad median)
        and proves the error is step-size, not physics (the f64 fast march
        at fine steps matches the f32 one — roundoff is irrelevant)."""
        from blackhole_simulation_tpu.geodesic.oracle import oracle_march
        from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
        from blackhole_simulation_tpu.render import camera_rays, march
        from blackhole_simulation_tpu.render.march import HIT_ESCAPE
        from blackhole_simulation_tpu.render.shading import escape_direction

        scene = _gate_scene(0.0, 48, 32, disk=False)
        bh32 = Kerr(
            mass=scene.bh.mass.astype(jnp.float32),
            spin=scene.bh.spin.astype(jnp.float32),
            chart=KS,
        )
        bh64 = Kerr(
            mass=scene.bh.mass.astype(jnp.float64),
            spin=scene.bh.spin.astype(jnp.float64),
            chart=KS,
        )
        rays32 = camera_rays(scene.camera, bh32, dtype=jnp.float32)
        rays64 = camera_rays(scene.camera, bh64, dtype=jnp.float64)
        ro = oracle_march(rays64, bh64, scene.march_cfg)
        ho = np.asarray(ro.hit)
        d_o = np.asarray(escape_direction(ro.state, bh64))

        medians = []
        # First rung = the FLAGSHIP production step rate (bench.py, r4:
        # 0.2); the halving ladder proves its error is step-size-limited
        # and 2nd-order, i.e. the production error bound below is a real
        # convergence statement, not a tuned coincidence.
        for step_rate, max_steps in [(0.2, 256), (0.1, 512), (0.05, 1024)]:
            cfg = dataclasses.replace(
                scene.march_cfg, step_rate=step_rate, max_steps=max_steps
            )
            rf = march(rays32, bh32, cfg)
            hf = np.asarray(rf.hit)
            both = (hf == HIT_ESCAPE) & (ho == HIT_ESCAPE)
            d_f = np.asarray(escape_direction(rf.state, bh32))[both]
            ang = np.arccos(
                np.clip((d_f * d_o[both].astype(np.float32)).sum(axis=1), -1, 1)
            )
            medians.append(np.median(ang))

        assert medians[0] < 2e-2, f"production config error {medians[0]:.2e}"
        assert medians[1] < 0.55 * medians[0], f"not converging: {medians}"
        assert medians[2] < 0.55 * medians[1], f"not converging: {medians}"
        assert medians[2] < 1.5e-3, f"fine config error {medians[2]:.2e}"

    def test_schwarzschild_geometry_matches_oracle(self):
        """The quantities behind the image: capture mask and escape
        direction, bounded directly (the star-position accuracy bound)."""
        from blackhole_simulation_tpu.geodesic.oracle import oracle_march
        from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
        from blackhole_simulation_tpu.render import camera_rays, march
        from blackhole_simulation_tpu.render.march import HIT_ESCAPE
        from blackhole_simulation_tpu.render.shading import escape_direction

        scene = _gate_scene(0.0, 64, 64, disk=False)
        fine_cfg = dataclasses.replace(
            scene.march_cfg, step_rate=0.03, max_steps=1024
        )
        bh32 = Kerr(
            mass=scene.bh.mass.astype(jnp.float32),
            spin=scene.bh.spin.astype(jnp.float32),
            chart=KS,
        )
        bh64 = Kerr(
            mass=scene.bh.mass.astype(jnp.float64),
            spin=scene.bh.spin.astype(jnp.float64),
            chart=KS,
        )
        rays32 = camera_rays(scene.camera, bh32, dtype=jnp.float32)
        rays64 = camera_rays(scene.camera, bh64, dtype=jnp.float64)
        res_f = march(rays32, bh32, fine_cfg)
        res_o = oracle_march(rays64, bh64, scene.march_cfg)

        hit_f = np.asarray(res_f.hit)
        hit_o = np.asarray(res_o.hit)
        # Disagreements live in the ~1 px critical-curve band
        # (circumference/area ~ 3% at 64^2); bulk must agree.
        assert (hit_f == hit_o).mean() > 0.97, (
            f"termination agreement {(hit_f == hit_o).mean():.4f}"
        )

        both = (hit_f == HIT_ESCAPE) & (hit_o == HIT_ESCAPE)
        d_f = np.asarray(escape_direction(res_f.state, bh32))[both]
        d_o = np.asarray(
            escape_direction(res_o.state, bh64).astype(jnp.float32)
        )[both]
        ang = np.arccos(np.clip((d_f * d_o).sum(axis=1), -1.0, 1.0))
        # Fine-config f32 march vs f64 tol-1e-10 oracle: sub-mrad median;
        # the q95 tail is the near-critical amplification band.
        assert np.median(ang) < 1e-3, f"median {np.median(ang):.2e} rad"
        assert np.quantile(ang, 0.95) < 5e-2, (
            f"direction error q95 {np.quantile(ang, 0.95):.2e} rad"
        )

    def test_kerr_extremal_image_matches_oracle(self):
        """The a = 0.999 gate with the disk on (BASELINE primary config),
        at the validation step config (see the Schwarzschild gate)."""
        scene = _gate_scene(0.999, 72, 48, disk=True)
        fine = dataclasses.replace(
            scene,
            march_cfg=dataclasses.replace(
                scene.march_cfg, step_rate=0.03, max_steps=1024
            ),
        )
        img_fast = np.asarray(render_radiance(fine))
        img_oracle = np.asarray(oracle_render(scene)).astype(np.float32)

        d = np.abs(img_fast - img_oracle).max(axis=2)
        scale = np.abs(img_oracle).mean() + 1e-8
        # Near-extremal + disk: the inner disk edge (g^4 beaming, ISCO at
        # r = 1.18) concentrates the chaotic band; bulk pixels allclose at
        # a radiance-relative 1e-2, band pixels bounded in number, and the
        # 97.5%-trimmed mean at 1% of mean radiance (measured 0.55%).
        assert (d < 1e-2 * (1.0 + np.abs(img_oracle).max(axis=2))).mean() > 0.98
        trimmed = np.sort(d.reshape(-1))[: int(d.size * 0.975)]
        assert trimmed.mean() / scale < 1e-2, (
            f"trimmed mean rel {trimmed.mean() / scale:.2e}"
        )


class TestGradientGate:
    """d(pixel)/d(spin) of the fast differentiable path vs the oracle's
    central finite difference, at a = 0.999 (BASELINE correctness gate)."""

    def test_dpixel_dspin_matches_oracle_fd(self):
        w, h = 48, 32
        spin0 = 0.999

        # Turbulence off for the GRADIENT gate only: the Keplerian-phase
        # noise argument is phi - Omega(r) t with crossing times t ~ 100 M,
        # so d(noise)/d(spin) ~ noise' * t * dOmega/da is a large
        # high-frequency term whose f32-AD-vs-f64-FD mismatch is an artifact
        # of the display modulation, not of the GR gradient this gate pins
        # (the image gates keep turbulence on).
        def smooth_disk(scene):
            return dataclasses.replace(
                scene, disk=dataclasses.replace(scene.disk, turbulence=0.0)
            )

        # Oracle per-pixel FD at two step sizes; a pixel is "stable" where
        # they agree — d/d(spin) diverges on critical-curve pixels as
        # a -> a_crit(pixel), so no integrator computes those (see module
        # docstring); the gate compares everywhere the derivative exists.
        def oracle_img(a):
            return np.asarray(
                oracle_render(smooth_disk(_gate_scene(a, w, h, disk=True)))
            ).astype(np.float64)

        eps = 5e-4
        img_p, img_m = oracle_img(spin0 + eps), oracle_img(spin0 - eps)
        fd = (img_p - img_m) / (2 * eps)
        eps2 = 2.5e-4
        img_p2, img_m2 = oracle_img(spin0 + eps2), oracle_img(spin0 - eps2)
        fd2 = (img_p2 - img_m2) / (2 * eps2)

        denom = np.abs(fd) + np.abs(fd2) + 1e-2
        stable = (np.abs(fd - fd2) / denom < 0.05).all(axis=2)
        assert stable.mean() > 0.7, f"only {stable.mean():.2f} stable pixels"

        # Fast-path AD gradient of the stable-pixel weighted sum, at the
        # VALIDATION step config: near extremality d(r_isco)/da ~
        # (1-a)^{-2/3} ~ 100, so the disk inner edge dominates d/d(spin)
        # and amplifies the production config's ~5 mrad step error ~3x in
        # gradient space (measured); the fine config converges (the
        # convergence gate pins the rate).
        rng = np.random.default_rng(0)
        weights = jnp.asarray(
            rng.uniform(0.5, 1.5, size=(h, w, 3)) * stable[..., None],
            jnp.float32,
        )

        def loss(a):
            scene = smooth_disk(_gate_scene(a, w, h, disk=True))
            scene = dataclasses.replace(
                scene,
                march_cfg=dataclasses.replace(
                    scene.march_cfg, step_rate=0.03, max_steps=1024
                ),
            )
            return jnp.sum(render_radiance(scene) * weights)

        g_ad = float(jax.grad(loss)(jnp.float32(spin0)))
        g_fd = float(np.sum(fd * np.asarray(weights)))

        assert np.sign(g_ad) == np.sign(g_fd)
        rel = abs(g_ad - g_fd) / (abs(g_fd) + 1e-6)
        # Tolerance 0.2: f32 AD through the 1024-step near-extremal march
        # carries an O(15%) aggregate deviation from the f64 oracle's FD
        # that moves with fp32 reassociation (measured 0.14 before and
        # 0.167 after the r3 channel-row shading relayout — same math,
        # different rounding). Sign and magnitude are pinned here; the
        # convergence gate below pins the step-size convergence RATE.
        assert rel < 0.2, f"AD {g_ad:.4f} vs oracle FD {g_fd:.4f} (rel {rel:.3f})"

    def _param_gate(self, oracle_of, ad_loss_of, p0, eps, rel_tol,
                    w=48, h=32):
        """Shared stable-pixel machinery (VERDICT r3 item 6): oracle FD at
        two step sizes defines the stable set; the fast path's AD of a
        stable-pixel weighted sum must match the oracle FD in sign and
        magnitude."""
        img = lambda p: np.asarray(oracle_of(p)).astype(np.float64)
        fd = (img(p0 + eps) - img(p0 - eps)) / (2 * eps)
        fd2 = (img(p0 + eps / 2) - img(p0 - eps / 2)) / eps
        denom = np.abs(fd) + np.abs(fd2) + 1e-2
        stable = (np.abs(fd - fd2) / denom < 0.05).all(axis=2)
        assert stable.mean() > 0.7, f"only {stable.mean():.2f} stable pixels"
        rng = np.random.default_rng(0)
        weights = jnp.asarray(
            rng.uniform(0.5, 1.5, size=(h, w, 3)) * stable[..., None],
            jnp.float32,
        )
        g_ad = float(jax.grad(lambda p: ad_loss_of(p, weights))(jnp.float32(p0)))
        g_fd = float(np.sum(fd * np.asarray(weights)))
        assert np.sign(g_ad) == np.sign(g_fd), (g_ad, g_fd)
        rel = abs(g_ad - g_fd) / (abs(g_fd) + 1e-6)
        assert rel < rel_tol, f"AD {g_ad:.4f} vs FD {g_fd:.4f} (rel {rel:.3f})"

    def test_dpixel_ddensity_matches_oracle_fd(self):
        """d/d(disk density) at a = 0.999 — the disk-parameter axis of
        BASELINE configs[3] (the inverse-rendering parameter vector)."""
        w, h = 48, 32
        base = _gate_scene(0.999, w, h, disk=True)
        base = dataclasses.replace(
            base, disk=dataclasses.replace(base.disk, turbulence=0.0)
        )
        fine_cfg = dataclasses.replace(
            base.march_cfg, step_rate=0.03, max_steps=1024
        )

        def oracle_of(dens):
            s = dataclasses.replace(
                base, disk=dataclasses.replace(base.disk, density=float(dens))
            )
            return oracle_render(s)

        def ad_loss_of(dens, weights):
            # density enters as the traced multiplicative scale the inverse
            # path optimizes (parallel/train._forward's density_scale).
            from blackhole_simulation_tpu.render.pipeline import (
                render_sample_scaled,
            )

            s = dataclasses.replace(base, march_cfg=fine_cfg)
            rgb = render_sample_scaled(
                s, density_scale=dens / base.disk.density
            )
            return jnp.sum(rgb.reshape(h, w, 3) * weights)

        self._param_gate(oracle_of, ad_loss_of, 0.7, 0.05, 0.2, w, h)

    def test_dpixel_dtheta_cam_matches_oracle_fd(self):
        """d/d(camera theta) at a = 0.999 — the camera axis of the inverse
        parameter vector."""
        w, h = 48, 32
        base = _gate_scene(0.999, w, h, disk=True)
        base = dataclasses.replace(
            base, disk=dataclasses.replace(base.disk, turbulence=0.0)
        )
        th0 = float(base.camera.theta)
        fine_cfg = dataclasses.replace(
            base.march_cfg, step_rate=0.03, max_steps=1024
        )

        def oracle_of(th):
            s = dataclasses.replace(
                base, camera=dataclasses.replace(
                    base.camera, theta=jnp.float64(float(th))
                )
            )
            return oracle_render(s)

        def ad_loss_of(th, weights):
            s = dataclasses.replace(
                base,
                camera=dataclasses.replace(base.camera, theta=th),
                march_cfg=fine_cfg,
            )
            return jnp.sum(render_radiance(s) * weights)

        self._param_gate(oracle_of, ad_loss_of, th0, 2e-3, 0.2, w, h)
