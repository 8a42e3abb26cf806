"""Pallas march kernel vs jnp march: must agree exactly (interpret mode).

The kernel-vs-reference pattern of SURVEY.md §4, at the Pallas level."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
from blackhole_simulation_tpu.render import Camera, MarchConfig, camera_rays, march


@pytest.mark.parametrize("a", [0.0, 0.9, 0.999])
def test_pallas_march_matches_jnp(a):
    bh = Kerr(mass=jnp.asarray(1.0, jnp.float32), spin=jnp.asarray(a, jnp.float32), chart=KS)
    cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.25, fov=0.5, width=48, height=32)
    rays = camera_rays(cam, bh)
    res_j = march(rays, bh, MarchConfig())
    res_p = march(rays, bh, MarchConfig(use_pallas=True))
    np.testing.assert_array_equal(np.asarray(res_j.hit), np.asarray(res_p.hit))
    np.testing.assert_array_equal(np.asarray(res_j.steps), np.asarray(res_p.steps))
    np.testing.assert_array_equal(
        np.asarray(res_j.n_crossings), np.asarray(res_p.n_crossings)
    )
    np.testing.assert_allclose(
        np.asarray(res_j.state), np.asarray(res_p.state), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(res_j.cross_r), np.asarray(res_p.cross_r), atol=1e-6
    )


def test_pallas_march_matches_jnp_polar_rays():
    """Rays aimed near the spin axis exercise the pole throttle (w_floor):
    the kernel and the jnp path must use the SAME floor or dlam diverges for
    |u| -> 1 (ADVICE r1: kernel had 1e-12 vs path 1e-6 in f32)."""
    bh = Kerr(
        mass=jnp.asarray(1.0, jnp.float32), spin=jnp.asarray(0.9, jnp.float32), chart=KS
    )
    # Camera nearly on the spin axis: the central rays pass within ~1e-3 rad
    # of the pole, where w = 1 - u^2 reaches its floor.
    cam = Camera.create(r=30.0, theta=1e-4, fov=0.3, width=16, height=8)
    rays = camera_rays(cam, bh)
    res_j = march(rays, bh, MarchConfig())
    res_p = march(rays, bh, MarchConfig(use_pallas=True))
    np.testing.assert_array_equal(np.asarray(res_j.hit), np.asarray(res_p.hit))
    np.testing.assert_array_equal(np.asarray(res_j.steps), np.asarray(res_p.steps))
    np.testing.assert_allclose(
        np.asarray(res_j.state), np.asarray(res_p.state), atol=1e-6
    )


def test_block_order_round_trip():
    """from_block_order(to_block_order(x)) == x for non-multiple (H, W),
    including the edge-padding path (ADVICE r1: no coverage — a regression
    would silently scramble the pixel-to-ray mapping)."""
    from blackhole_simulation_tpu.ops.pallas_march import (
        _block_dims,
        from_block_order,
        to_block_order,
        TILE,
    )

    for h, w in [(96, 96), (11, 30), (1, 7), (1080, 1920), (64, 64), (3, 4000)]:
        x = jnp.arange(h * w, dtype=jnp.float32).reshape(h * w)
        rt = from_block_order(to_block_order(x, h, w), h, w)
        np.testing.assert_array_equal(np.asarray(rt), np.asarray(x))
        # and with a trailing feature axis, as the march state uses
        x2 = jnp.stack([x, -x], axis=-1)
        rt2 = from_block_order(to_block_order(x2, h, w), h, w)
        np.testing.assert_array_equal(np.asarray(rt2), np.asarray(x2))
        bh, bw = _block_dims(h, w)
        assert bh * bw == TILE


def test_block_dims_adapt_to_small_frames():
    """A 96x96 frame must not pad to 128x128 (+78%); the adaptive block
    picker bounds padding overhead by choosing a fitting rectangle."""
    from blackhole_simulation_tpu.ops.pallas_march import _padded_dims

    hp, wp = _padded_dims(96, 96)
    assert hp * wp <= int(1.5 * 96 * 96), (hp, wp)


def test_render_use_pallas_matches_jnp_image():
    """Full-pipeline image parity on a non-square, non-TILE-multiple frame:
    covers the block reorder inside render_sample (test_pallas_march_* calls
    march() directly and bypasses it)."""
    import dataclasses as dc

    from blackhole_simulation_tpu.render import Scene, render_radiance

    cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.3, fov=0.5, width=50, height=34)
    scene = Scene.create(
        mass=1.0, spin=0.9, camera=cam, march_cfg=MarchConfig(max_steps=64)
    )
    img_j = render_radiance(scene)
    scene_p = dc.replace(scene, march_cfg=MarchConfig(max_steps=64, use_pallas=True))
    img_p = render_radiance(scene_p)
    np.testing.assert_allclose(np.asarray(img_j), np.asarray(img_p), atol=1e-5)


def test_pallas_handles_nondivisible_batch():
    """Ray counts that don't divide the tile size pad internally."""
    bh = Kerr(mass=jnp.asarray(1.0, jnp.float32), spin=jnp.asarray(0.9, jnp.float32), chart=KS)
    cam = Camera.create(width=30, height=11)  # 330 rays, not / 512
    rays = camera_rays(cam, bh)
    res = march(rays, bh, MarchConfig(use_pallas=True))
    assert res.hit.shape == (330,)
    assert np.all(np.isfinite(np.asarray(res.state)))
