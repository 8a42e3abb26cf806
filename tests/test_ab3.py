"""Experimental AB3 multistep march (ops/pallas_march.march_tile_ab3).

A measured negative result on TPU (see the march_tile_ab3 docstring): kept
flag-gated with this accuracy/consistency gate so the option doesn't rot.
"""

import dataclasses as dc

import jax.numpy as jnp
import numpy as np
import pytest

from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
from blackhole_simulation_tpu.render import Camera, MarchConfig, Scene, render_radiance
from blackhole_simulation_tpu.render.camera import camera_rays_u
from blackhole_simulation_tpu.render.march import HIT_ESCAPE, march_rows
from blackhole_simulation_tpu.render.shading import escape_direction_u_rows

pytestmark = pytest.mark.slow


def test_ab3_accuracy_matches_midpoint_budget():
    """Escape-direction error at the production step rate stays within the
    oracle ladder's production bound (< 2e-2 median) and near the midpoint
    step's error."""
    bh = Kerr(mass=jnp.float32(1.0), spin=jnp.float32(0.9), chart=KS)
    cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.25, fov=0.5,
                        width=48, height=32)
    rays = camera_rays_u(cam, bh, dtype=jnp.float32)
    fine = march_rows(rays, bh, MarchConfig(max_steps=1024, step_rate=0.05,
                                            midpoint_iters=2))
    hf = np.asarray(fine.hit)
    df = np.stack([np.asarray(v) for v in escape_direction_u_rows(
        tuple(fine.state_u[i] for i in range(8)), bh)])

    cfg = MarchConfig(max_steps=256, step_rate=0.2, multistep=True,
                      use_pallas=True)
    rows = march_rows(rays, bh, cfg)  # kernel path, interpret on CPU
    h = np.asarray(rows.hit)
    d = np.stack([np.asarray(v) for v in escape_direction_u_rows(
        tuple(rows.state_u[i] for i in range(8)), bh)])
    both = (h == HIT_ESCAPE) & (hf == HIT_ESCAPE)
    ang = np.arccos(np.clip((d[:, both] * df[:, both]).sum(0), -1, 1))
    assert np.median(ang) < 2e-2, np.median(ang)
    assert (h == hf).mean() > 0.9


def test_ab3_render_finite_and_structurally_close():
    cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.25, fov=0.5,
                        width=64, height=32)
    cfg = MarchConfig(max_steps=96, use_pallas=True, fused=True,
                      multistep=True)
    sA = Scene.create(mass=1.0, spin=0.9, camera=cam, march_cfg=cfg)
    sB = Scene.create(mass=1.0, spin=0.9, camera=cam,
                      march_cfg=dc.replace(cfg, multistep=False))
    ia = np.asarray(render_radiance(sA))
    ib = np.asarray(render_radiance(sB))
    assert np.isfinite(ia).all()
    d = np.abs(ia - ib)
    # same scene at the two integrators' own truncation errors
    assert np.median(d) < 5e-3
    assert (d < 0.3).mean() > 0.95
