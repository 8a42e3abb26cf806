"""Pallas march kernel vs jnp march parity (interpret mode on CPU).

The kernel-vs-reference pattern of SURVEY.md §4, at the Pallas level.

Parity contract — two tiers, because the march is CHAOTIC near the photon
sphere (positive Lyapunov exponent): the two paths share one expression DAG
(ops/ks_kernel.ks_symplectic_step_rows) but are separately compiled
programs, and XLA's fusion/FMA-contraction choices differ at the ulp level.
Over a short horizon that ulp never surfaces; over 256 steps a 1-ulp
difference on a near-critical ray e-folds into O(1) state differences and
can even flip capture/escape for the measure-zero set of rays that graze
the photon sphere. So:

 1. SHORT horizon (one renormalization period): bitwise-level agreement —
    any genuine logic divergence (step size, renorm cadence, masking,
    crossing records) shows up here deterministically.
 2. FULL horizon (256 steps): statistical agreement — discrete outcomes
    (hit, steps, n_crossings) identical on >= 99.5% of rays, and on those
    "clean" rays the state matches to a 99th-quantile relative tolerance.
    Only chaotic photon-ring rays may disagree, and never many of them.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
from blackhole_simulation_tpu.render import Camera, MarchConfig, camera_rays, march


def _march_pair(a, cfg, cam=None):
    bh = Kerr(
        mass=jnp.asarray(1.0, jnp.float32), spin=jnp.asarray(a, jnp.float32), chart=KS
    )
    if cam is None:
        cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.25, fov=0.5, width=48, height=32)
    rays = camera_rays(cam, bh)
    res_j = march(rays, bh, cfg)
    res_p = march(rays, bh, dataclasses.replace(cfg, use_pallas=True))
    return res_j, res_p


def _assert_statistical_parity(res_j, res_p, min_clean=0.995, q99_rel=1e-3,
                               outlier_rel=1e-1, max_outlier_frac=0.005):
    hj, hp = np.asarray(res_j.hit), np.asarray(res_p.hit)
    stj, stp = np.asarray(res_j.steps), np.asarray(res_p.steps)
    ncj, ncp = np.asarray(res_j.n_crossings), np.asarray(res_p.n_crossings)
    clean = (hj == hp) & (stj == stp) & (ncj == ncp)
    assert clean.mean() >= min_clean, (
        f"only {clean.mean():.4f} of rays agree on (hit, steps, n_crossings)"
    )
    sj, sp = np.asarray(res_j.state), np.asarray(res_p.state)
    rel = (np.abs(sj - sp) / (np.abs(sj) + 1.0))[clean]
    assert np.quantile(rel, 0.99) <= q99_rel, (
        f"state q99 rel diff {np.quantile(rel, 0.99):.2e} on clean rays"
    )
    # Outlier-fraction bound on ALL clean rays (ADVICE r2): the q99 alone
    # leaves the worst 1% unbounded; a bug corrupting ~1.5% of rays must not
    # hide inside the quantile + discrete-mismatch allowances.
    assert (rel > outlier_rel).mean() <= max_outlier_frac, (
        f"{(rel > outlier_rel).mean():.4f} of clean-ray state entries exceed "
        f"rel {outlier_rel}"
    )
    # Same two-tier check on every crossing record (ADVICE r2: cross_phi /
    # cross_t interpolation bugs were only covered at the 16-step horizon).
    for name in ("cross_r", "cross_phi", "cross_t"):
        cj = np.asarray(getattr(res_j, name))
        cp_ = np.asarray(getattr(res_p, name))
        crel = (np.abs(cj - cp_) / (np.abs(cj) + 1.0))[clean]
        assert np.quantile(crel, 0.99) <= q99_rel, (
            f"{name} q99 rel diff {np.quantile(crel, 0.99):.2e} on clean rays"
        )
        assert (crel > outlier_rel).mean() <= max_outlier_frac, (
            f"{name}: {(crel > outlier_rel).mean():.4f} outlier fraction"
        )


@pytest.mark.parametrize("a", [0.0, 0.9, 0.999])
def test_pallas_march_matches_jnp_short_horizon(a):
    """One full renormalization period: both paths must agree to float
    round-off (atol 1e-4 absorbs few-ulp FMA-contraction noise between the
    two compilations; a real logic divergence — wrong dlam, missed renorm,
    bad masking — produces >= 1e-3 within a handful of steps). Chaos has
    had no time to amplify ulps, so discrete outputs must be identical."""
    res_j, res_p = _march_pair(a, MarchConfig(max_steps=16))
    np.testing.assert_array_equal(np.asarray(res_j.hit), np.asarray(res_p.hit))
    np.testing.assert_array_equal(np.asarray(res_j.steps), np.asarray(res_p.steps))
    np.testing.assert_array_equal(
        np.asarray(res_j.n_crossings), np.asarray(res_p.n_crossings)
    )
    np.testing.assert_allclose(
        np.asarray(res_j.state), np.asarray(res_p.state), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res_j.cross_r), np.asarray(res_p.cross_r), atol=1e-4
    )


@pytest.mark.parametrize("a", [0.0, 0.9, 0.999])
def test_pallas_march_matches_jnp_full_horizon(a):
    """256 steps: statistical parity (see module docstring)."""
    res_j, res_p = _march_pair(a, MarchConfig())
    _assert_statistical_parity(res_j, res_p)


def test_pallas_march_matches_jnp_polar_rays():
    """Rays aimed near the spin axis exercise the pole throttle (w_floor):
    the kernel and the jnp path must use the SAME floor or dlam diverges for
    |u| -> 1 (ADVICE r1: kernel had 1e-12 vs path 1e-6 in f32)."""
    cam = Camera.create(r=30.0, theta=1e-4, fov=0.3, width=16, height=8)
    res_j, res_p = _march_pair(0.9, MarchConfig(max_steps=16), cam=cam)
    np.testing.assert_array_equal(np.asarray(res_j.hit), np.asarray(res_p.hit))
    np.testing.assert_array_equal(np.asarray(res_j.steps), np.asarray(res_p.steps))
    np.testing.assert_allclose(
        np.asarray(res_j.state), np.asarray(res_p.state), atol=1e-6
    )
    res_j, res_p = _march_pair(0.9, MarchConfig(), cam=cam)
    _assert_statistical_parity(res_j, res_p)


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
    march() directly and bypasses it). Statistical: a near-critical pixel
    may flip between compilations (see module docstring), so assert the
    mean error is at round-off scale and outliers are rare, rather than a
    hard allclose."""
    import dataclasses as dc

    from blackhole_simulation_tpu.render import Scene, render_radiance

    cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.3, fov=0.5, width=50, height=34)
    scene = Scene.create(
        mass=1.0, spin=0.9, camera=cam, march_cfg=MarchConfig(max_steps=64)
    )
    img_j = np.asarray(render_radiance(scene))
    scene_p = dc.replace(scene, march_cfg=MarchConfig(max_steps=64, use_pallas=True))
    img_p = np.asarray(render_radiance(scene_p))
    d = np.abs(img_j - img_p)
    scale = np.abs(img_j).mean() + 1e-8
    assert d.mean() / scale < 1e-4, f"mean image diff {d.mean() / scale:.2e}"
    assert (d / scale > 1e-2).mean() < 0.005, "too many outlier pixels"


def test_pallas_handles_nondivisible_batch():
    """Ray counts that don't divide the tile size pad internally."""
    bh = Kerr(mass=jnp.asarray(1.0, jnp.float32), spin=jnp.asarray(0.9, jnp.float32), chart=KS)
    cam = Camera.create(width=30, height=11)  # 330 rays, not / 512
    rays = camera_rays(cam, bh)
    res = march(rays, bh, MarchConfig(use_pallas=True))
    assert res.hit.shape == (330,)
    assert np.all(np.isfinite(np.asarray(res.state)))
