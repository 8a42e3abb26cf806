"""Temporal accumulation (TAA twin): color transforms, clamping, convergence."""

import jax.numpy as jnp
import numpy as np

from blackhole_simulation_tpu.render.accumulate import (
    TemporalAccumulator,
    rgb_to_ycocg,
    taa_resolve,
    ycocg_to_rgb,
)


class TestColorSpace:
    def test_ycocg_round_trip(self):
        rng = np.random.default_rng(0)
        rgb = jnp.asarray(rng.random((5, 7, 3)), jnp.float32)
        back = ycocg_to_rgb(rgb_to_ycocg(rgb))
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-6)

    def test_luma_weights(self):
        white = rgb_to_ycocg(jnp.ones((1, 1, 3)))
        np.testing.assert_allclose(np.asarray(white[..., 0]), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(white[..., 1:]), 0.0, atol=1e-6)


class TestResolve:
    def test_static_scene_converges(self):
        """Noisy samples of a constant scene converge toward the mean."""
        rng = np.random.default_rng(1)
        truth = np.full((8, 8, 3), 0.5, np.float32)
        acc = TemporalAccumulator(feedback=0.9)
        frame = None
        for _ in range(60):
            noisy = truth + rng.normal(0, 0.05, truth.shape).astype(np.float32)
            frame = np.asarray(acc.resolve(jnp.asarray(noisy)))
        err_taa = np.abs(frame - truth).mean()
        err_one = 0.05 * np.sqrt(2 / np.pi)  # single-frame expected |err|
        assert err_taa < err_one / 2

    def test_moving_resets_history(self):
        acc = TemporalAccumulator()
        a = jnp.zeros((4, 4, 3))
        b = jnp.ones((4, 4, 3))
        acc.resolve(a)
        out = np.asarray(acc.resolve(b, moving=True))
        np.testing.assert_allclose(out, 1.0)

    def test_clamp_rejects_stale_history(self):
        """History far outside the current neighborhood gets clamped in —
        no ghosting (the mu +- k sigma AABB)."""
        hist = jnp.full((6, 6, 3), 10.0)
        cur = jnp.full((6, 6, 3), 0.2)
        out = np.asarray(taa_resolve(hist, cur, jnp.asarray(False), 0.9))
        # flat neighborhood -> sigma 0 -> history clamps exactly to current
        np.testing.assert_allclose(out, 0.2, atol=1e-5)

    def test_shape_change_resets(self):
        acc = TemporalAccumulator()
        acc.resolve(jnp.zeros((4, 4, 3)))
        out = acc.resolve(jnp.ones((8, 8, 3)))
        np.testing.assert_allclose(np.asarray(out), 1.0)

    def test_jitter_index_advances(self):
        acc = TemporalAccumulator()
        acc.resolve(jnp.zeros((4, 4, 3)))
        i0 = acc.jitter_index
        acc.resolve(jnp.zeros((4, 4, 3)))
        assert acc.jitter_index == i0 + 1


class TestReprojection:
    """Motion reprojection (ataa.wgsl.ts heuristic-depth warp)."""

    def _cam(self, r=30.0, theta=1.3, phi=0.0, fov=0.4, roll=0.0):
        return (r, theta, phi, fov, roll)

    def test_identity_reprojection(self):
        from blackhole_simulation_tpu.render.accumulate import reproject_uv

        h, w = 12, 20
        cam = self._cam()
        py, px, valid = reproject_uv(cam, cam, h, w)
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        np.testing.assert_allclose(np.asarray(py), yy, atol=1e-3)
        np.testing.assert_allclose(np.asarray(px), xx, atol=1e-3)
        assert bool(np.asarray(valid).all())

    def test_orbit_matches_independent_projection(self):
        """A world point at the heuristic depth along a current pixel ray
        must land on the pixel an independent numpy projector assigns it in
        the previous camera — including roll and a theta change."""
        from blackhole_simulation_tpu.render.accumulate import reproject_uv

        h, w = 32, 48
        cur = self._cam(r=25.0, theta=1.2, phi=0.30, roll=0.1)
        prv = self._cam(r=25.0, theta=1.25, phi=0.25, roll=0.0)

        def basis(c):
            r, th, ph, fov, roll = c
            e_r = np.array([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph),
                            np.cos(th)])
            e_th = np.array([np.cos(th) * np.cos(ph), np.cos(th) * np.sin(ph),
                             -np.sin(th)])
            e_ph = np.array([-np.sin(ph), np.cos(ph), 0.0])
            return r * e_r, e_r, e_th, e_ph

        def project(c, wpt):
            r, th, ph, fov, roll = c
            pos, e_r, e_th, e_ph = basis(c)
            v = wpt - pos
            a_r, a_th, a_ph = v @ e_r, v @ e_th, v @ e_ph
            cx, cy = a_ph / a_r, a_th / a_r
            cx, cy = (cx * np.cos(roll) + cy * np.sin(roll),
                      -cx * np.sin(roll) + cy * np.cos(roll))
            k2 = np.tan(fov / 2)
            k1 = k2 * w / h
            return ((1.0 - cy / k2) * 0.5 * h - 0.5,
                    (cx / k1 + 1.0) * 0.5 * w - 0.5)

        # Build the world point for a few pixels of the CURRENT camera.
        pos0, e_r0, e_th0, e_ph0 = basis(cur)
        k2 = np.tan(cur[3] / 2)
        k1 = k2 * w / h
        py, px, valid = reproject_uv(prv, cur, h, w)
        py, px, valid = np.asarray(py), np.asarray(px), np.asarray(valid)
        for (iy, ix) in [(5, 7), (16, 24), (28, 40), (0, 0)]:
            nx = (ix + 0.5) / w * 2 - 1
            ny = 1 - (iy + 0.5) / h * 2
            cx, cy = nx * k1, ny * k2
            rc, rs = np.cos(cur[4]), np.sin(cur[4])
            cx, cy = cx * rc - cy * rs, cx * rs + cy * rc
            d = -e_r0 - cx * e_ph0 - cy * e_th0
            d = d / np.linalg.norm(d)
            wpt = pos0 + cur[0] * d  # heuristic depth = camera r
            ref_y, ref_x = project(prv, wpt)
            if (iy, ix) != (0, 0):
                # (0, 0) legitimately reprojects off-screen for this delta.
                assert valid[iy, ix]
            np.testing.assert_allclose(py[iy, ix], ref_y, atol=1e-2)
            np.testing.assert_allclose(px[iy, ix], ref_x, atol=1e-2)

    def test_behind_camera_invalid(self):
        from blackhole_simulation_tpu.render.accumulate import reproject_uv

        # World points at radius ~20 on the shared view axis sit BEHIND a
        # previous camera at r=5 looking inward: center pixels must be
        # flagged invalid (disocclusion fallback), not warped.
        cur = self._cam(r=30.0)
        prv = self._cam(r=5.0)
        _, _, valid = reproject_uv(prv, cur, 9, 9, depth=10.0)
        assert not bool(np.asarray(valid)[4, 4])

    def test_orbit_keeps_accumulation(self):
        """VERDICT r4 item 9 'done' criterion, synthetic form: an orbiting
        camera over a world-anchored pattern with per-frame noise keeps
        >= 50% of its effective accumulation (error well below the
        single-frame noise floor), while the reset path stays AT the floor."""
        rng = np.random.default_rng(7)
        h, w = 24, 36
        sigma = 0.08
        r0, fov = 30.0, 0.3

        def basis(th, ph):
            e_r = np.array([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph),
                            np.cos(th)])
            e_th = np.array([np.cos(th) * np.cos(ph), np.cos(th) * np.sin(ph),
                             -np.sin(th)])
            e_ph = np.array([-np.sin(ph), np.cos(ph), 0.0])
            return r0 * e_r, e_r, e_th, e_ph

        def clean_frame(phi):
            # Pattern anchored to world points at the heuristic depth plane.
            pos, e_r, e_th, e_ph = basis(1.3, phi)
            ys = (np.arange(h) + 0.5) / h
            xs = (np.arange(w) + 0.5) / w
            nx, ny = np.meshgrid(xs * 2 - 1, 1 - ys * 2, indexing="xy")
            k2 = np.tan(fov / 2)
            k1 = k2 * w / h
            cx, cy = nx * k1, ny * k2
            d = (-e_r[:, None, None] - cx[None] * e_ph[:, None, None]
                 - cy[None] * e_th[:, None, None])
            d /= np.linalg.norm(d, axis=0, keepdims=True)
            wpt = pos[:, None, None] + r0 * d
            g = (np.sin(1.3 * wpt[0]) * np.sin(1.1 * wpt[1])
                 + 0.3 * np.sin(2.1 * wpt[2]))
            img = 0.5 + 0.25 * g
            return np.repeat(img[:, :, None], 3, axis=2).astype(np.float32)

        def run(use_camera):
            acc = TemporalAccumulator(feedback=0.85)
            phi = 0.0
            out = clean = None
            for k in range(40):
                phi += 0.004
                clean = clean_frame(phi)
                noisy = clean + rng.normal(0, sigma, clean.shape).astype(
                    np.float32)
                cam = (r0, 1.3, phi, fov, 0.0) if use_camera else None
                out = np.asarray(acc.resolve(jnp.asarray(noisy), moving=True,
                                             camera=cam))
            # Interior error (borders disocclude by construction).
            e = np.abs(out - clean)[3:-3, 3:-3]
            return e.mean()

        err_reproj = run(True)
        err_reset = run(False)
        floor = sigma * np.sqrt(2 / np.pi)  # E|N(0, sigma)|
        assert err_reproj < 0.55 * floor, (err_reproj, floor)
        assert err_reset > 0.8 * floor, (err_reset, floor)
