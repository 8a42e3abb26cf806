"""Shadow pre-cull (render/precull.py) vs the actual march outcome.

The cull claims "provably captured": its one hard correctness property is
ZERO false culls — no culled ray may escape in the real march. Effectiveness
(it must kill most of the shadow interior) is what makes it a perf lever.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
from blackhole_simulation_tpu.render import Camera, MarchConfig, camera_rays, march
from blackhole_simulation_tpu.render.march import HIT_ESCAPE, HIT_HORIZON
from blackhole_simulation_tpu.render.precull import capture_mask, photon_orbit_radii


def _setup(a, width=48, height=32, r=30.0, theta=jnp.pi / 2 - 0.25):
    bh = Kerr(
        mass=jnp.asarray(1.0, jnp.float32), spin=jnp.asarray(a, jnp.float32), chart=KS
    )
    cam = Camera.create(r=r, theta=theta, fov=0.5, width=width, height=height)
    return bh, camera_rays(cam, bh)


def _exactly_captured_f64(a, y):
    """Ground-truth capture test for one ray: exact f64 (lam, eta) against
    the f64-bisected Bardeen critical curve (shadow.rs:81-183 physics)."""
    from blackhole_simulation_tpu.render.precull import _eta_c, _lam_c

    y = np.asarray(y, np.float64)
    pt, pth, pph = y[4], y[6], y[7]
    th = y[2]
    lam = -pph / pt
    eta = (
        pth**2 + np.cos(th) ** 2 * (pph**2 / np.sin(th) ** 2 - a**2 * pt**2)
    ) / pt**2
    m64 = jnp.float64(1.0)
    a64 = jnp.float64(abs(a) if abs(a) > 1e-3 else 1e-3)
    lam_eff = lam if a >= 0 else -lam
    s_pro, s_ret = photon_orbit_radii(m64, a64)
    lo, hi = float(s_pro), float(s_ret)
    if not (float(_lam_c(m64, a64, jnp.float64(hi))) < lam_eff
            < float(_lam_c(m64, a64, jnp.float64(lo)))):
        return False
    for _ in range(80):
        mid = 0.5 * (lo + hi)
        if float(_lam_c(m64, a64, jnp.float64(mid))) > lam_eff:
            lo = mid
        else:
            hi = mid
    eta_crit = float(_eta_c(m64, a64, jnp.float64(0.5 * (lo + hi))))
    return 0.0 <= eta < eta_crit


@pytest.mark.parametrize("a", [0.0, 0.6, 0.9, 0.999, -0.9])
def test_no_false_culls(a):
    """Every culled ray must actually be captured. Ground truth is the
    uncalled f32 march, arbitrated by exact f64 physics: near the critical
    curve the finite-step f32 march itself can eject a truly-captured ray
    (observed: a ray with 7.6% f64 eta margin "escaped" after 96 steps at
    a = 0.999), so a culled-but-march-escaped ray only counts as a FALSE
    cull if the exact f64 critical-curve test also says it escapes."""
    bh, rays = _setup(a)
    dead = np.asarray(capture_mask(bh.mass, bh.spin, rays))
    res = march(rays, bh, MarchConfig())  # no cull: the (approximate) truth
    hit = np.asarray(res.hit)
    suspects = np.where(dead & (hit == HIT_ESCAPE))[0]
    rays_np = np.asarray(rays)
    false_culls = [
        int(i) for i in suspects if not _exactly_captured_f64(a, rays_np[i])
    ]
    assert not false_culls, f"false culls at a={a}: rays {false_culls}"
    # The march/mask disagreement set must stay a thin critical-band sliver.
    assert suspects.size <= max(2, 0.001 * rays_np.shape[0]), suspects


@pytest.mark.parametrize("a", [0.0, 0.999])
def test_cull_covers_most_of_shadow(a):
    """The cull must kill the bulk of the captured set (the margin keeps a
    thin ring near the critical curve marching)."""
    bh, rays = _setup(a)
    dead = np.asarray(capture_mask(bh.mass, bh.spin, rays))
    res = march(rays, bh, MarchConfig())
    captured = np.asarray(res.hit) == HIT_HORIZON
    assert captured.sum() > 0
    assert dead.sum() >= 0.6 * captured.sum(), (
        f"cull kills only {dead.sum()}/{captured.sum()} captured rays at a={a}"
    )


def test_march_with_precull_matches_plain_on_uncalled_rays():
    """Rays the cull leaves alone must march identically. With
    precull_keep_disk (default) culled rays stop at the ISCO with their
    foreground crossings intact; with it off they die at step 0."""
    bh, rays = _setup(0.9)
    dead = np.asarray(capture_mask(bh.mass, bh.spin, rays))
    res_plain = march(rays, bh, MarchConfig())
    res_cull = march(rays, bh, MarchConfig(shadow_precull=True))
    keep = ~dead
    np.testing.assert_array_equal(
        np.asarray(res_plain.hit)[keep], np.asarray(res_cull.hit)[keep]
    )
    np.testing.assert_allclose(
        np.asarray(res_plain.state)[keep],
        np.asarray(res_cull.state)[keep],
        atol=1e-5,
    )
    assert np.all(np.asarray(res_cull.hit)[dead] == HIT_HORIZON)
    # Culled rays stop earlier than the plain march (at the ISCO) but still
    # record every crossing outside it.
    assert np.all(
        np.asarray(res_cull.steps)[dead] <= np.asarray(res_plain.steps)[dead]
    )
    # Visible crossings (r_c > ISCO, the only ones the disk shades) must be
    # identical; sub-ISCO records may differ (the culled ray stops there).
    isco = float(bh.isco())
    ncp = np.asarray(res_plain.cross_r)
    ncc = np.asarray(res_cull.cross_r)
    np.testing.assert_allclose(
        (ncc * (ncc > isco))[dead], (ncp * (ncp > isco))[dead], atol=1e-4
    )

    res_fast = march(
        rays, bh, MarchConfig(shadow_precull=True, precull_keep_disk=False)
    )
    assert np.all(np.asarray(res_fast.hit)[dead] == HIT_HORIZON)
    assert np.all(np.asarray(res_fast.steps)[dead] == 0)


def test_precull_image_close_to_plain():
    """Full-pipeline image with the cull on must match the plain render:
    culled rays are captured, captured rays shade black (horizon blackout),
    so the cull is invisible — any visible difference is a false cull or a
    shading path that leaks captured-ray state."""
    from blackhole_simulation_tpu.render import Scene, render_radiance

    cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.3, fov=0.5, width=48, height=32)
    scene = Scene.create(mass=1.0, spin=0.9, camera=cam)
    img = np.asarray(render_radiance(scene))
    scene_c = dataclasses.replace(scene, march_cfg=MarchConfig(shadow_precull=True))
    img_c = np.asarray(render_radiance(scene_c))
    np.testing.assert_allclose(img_c, img, atol=1e-5)


def test_inward_guard_inside_photon_shell():
    """A camera inside the photon shell firing outward rays must not cull
    them (they escape): the dr/dlam < 0 guard."""
    bh = Kerr(
        mass=jnp.asarray(1.0, jnp.float32), spin=jnp.asarray(0.9, jnp.float32), chart=KS
    )
    _, s_retro = photon_orbit_radii(bh.mass, jnp.abs(bh.spin))
    # Outward radial ray at r just outside the horizon: p_r > 0 via an
    # outward-pointing camera is awkward to build; flip the inward ray's
    # spatial momentum instead and renormalize is unnecessary for the mask.
    cam = Camera.create(r=float(s_retro) * 0.9, theta=jnp.pi / 2, fov=0.3,
                       width=8, height=8)
    rays = camera_rays(cam, bh)
    flipped = rays.at[:, 5].mul(-1.0)  # p_r sign flip -> outward-ish
    dead = np.asarray(capture_mask(bh.mass, bh.spin, flipped))
    # dr/dlam = (2Mr p_t + Delta p_r + a p_phi)/Sigma; with p_r flipped
    # positive most rays move outward -> must not be culled.
    r0 = np.asarray(flipped[:, 1])
    m, a = float(bh.mass), float(bh.spin)
    delta = r0 * r0 - 2 * m * r0 + a * a
    sig = r0**2 + a**2 * np.cos(np.asarray(flipped[:, 2])) ** 2
    drdl = (
        2 * m * r0 * np.asarray(flipped[:, 4])
        + delta * np.asarray(flipped[:, 5])
        + a * np.asarray(flipped[:, 7])
    ) / sig
    assert not np.any(dead & (drdl >= 0))


class TestPoleMetric:
    """Closed-form minimum sin^2(theta) from conserved (lam, eta)."""

    def test_equatorial_ray_never_leaves_plane(self):
        from blackhole_simulation_tpu.render.precull import pole_w_min_values

        # lam > a, eta = 0: theta-potential has no room — w_min = 1.
        w = pole_w_min_values(1.0, jnp.float32(0.9), jnp.float32(3.0),
                              jnp.float32(0.0))
        np.testing.assert_allclose(float(w), 1.0, atol=1e-6)

    def test_axial_ray_reaches_pole(self):
        from blackhole_simulation_tpu.render.precull import pole_w_min_values

        # lam = 0, eta > 0: the ray crosses the axis — w_min = 0.
        w = pole_w_min_values(1.0, jnp.float32(0.9), jnp.float32(0.0),
                              jnp.float32(4.0))
        np.testing.assert_allclose(float(w), 0.0, atol=1e-6)

    def test_w_min_matches_marched_minimum(self):
        """The closed form must match the actual marched minimum of
        w = 1 - u^2 for escaping rays (fine march, a = 0.9)."""
        from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
        from blackhole_simulation_tpu.render import Camera, MarchConfig
        from blackhole_simulation_tpu.render.camera import camera_rays_u
        from blackhole_simulation_tpu.render.march import HIT_ESCAPE
        from blackhole_simulation_tpu.render.precull import pole_w_min_values

        cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.4, fov=0.9,
                            width=24, height=24)
        bh = Kerr(mass=jnp.float32(1.0), spin=jnp.float32(0.9), chart=KS)
        rays = camera_rays_u(cam, bh)
        lam = rays[7]
        w0 = 1.0 - rays[2] ** 2
        eta = (rays[6] ** 2 * w0
               + rays[2] ** 2 * (rays[7] ** 2 / jnp.maximum(w0, 1e-12)
                                 - bh.spin ** 2))
        w_pred = np.asarray(pole_w_min_values(1.0, bh.spin, lam, eta))

        # march with a per-step u record via the fine jnp path
        import dataclasses as dc

        from blackhole_simulation_tpu.render.march import march_rows

        cfg = MarchConfig(max_steps=2048, step_rate=0.02, max_step=0.5,
                          midpoint_iters=2, remat_every=0)
        rows = march_rows(rays, bh, cfg)
        # track min w along the path by re-marching with small steps and
        # comparing only the FINAL u bound: w_min_pred must lower-bound
        # the final w for escaped rays (the true min over the path is <=
        # any sample of it)
        esc = np.asarray(rows.hit) == HIT_ESCAPE
        w_fin = np.asarray(1.0 - rows.state_u[2] ** 2)
        assert (w_pred[esc] <= w_fin[esc] + 5e-2).all()
        # and the prediction is attained somewhere: for a few polar-ish
        # rays the bound should be informative (< 0.9)
        assert (w_pred[esc] < 0.9).any()
