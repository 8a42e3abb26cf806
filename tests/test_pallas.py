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


def test_pallas_handles_nondivisible_batch():
    """Ray counts that don't divide the tile size pad internally."""
    bh = Kerr(mass=jnp.asarray(1.0, jnp.float32), spin=jnp.asarray(0.9, jnp.float32), chart=KS)
    cam = Camera.create(width=30, height=11)  # 330 rays, not / 512
    rays = camera_rays(cam, bh)
    res = march(rays, bh, MarchConfig(use_pallas=True))
    assert res.hit.shape == (330,)
    assert np.all(np.isfinite(np.asarray(res.state)))
