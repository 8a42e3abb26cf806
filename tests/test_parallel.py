"""Multi-device tests on the 8-virtual-device CPU mesh (conftest).

The TPU analogue of the reference's mock-GL backend tests: validate that the
sharded programs compile, run, and agree bit-for-bit (or allclose) with the
single-device path — SURVEY.md §4 "multi-node without a cluster".
"""

import jax
import jax.numpy as jnp
import numpy as np

from blackhole_simulation_tpu.parallel import (
    InverseParams,
    inverse_render,
    make_inverse_step,
    make_mesh,
    render_sharded,
)
from blackhole_simulation_tpu.render import Camera, Features, Scene, render


def small_scene(width=32, height=16, spin=0.9):
    cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.25, fov=0.5, width=width, height=height)
    return Scene.create(mass=1.0, spin=spin, camera=cam)


class TestShardedRender:
    def test_eight_devices_available(self):
        assert jax.device_count() >= 8

    def test_sharded_matches_single_device(self):
        scene = small_scene()
        mesh = make_mesh(8)
        img_sharded = np.asarray(render_sharded(scene, mesh))
        img_single = np.asarray(render(scene, n_samples=1))
        # fp32: XLA fuses/schedules the sharded program differently. Near the
        # photon ring a last-ulp difference can flip a disk crossing in/out
        # (the march is chaotic there), so compare robustly: bulk must match
        # tightly, a handful of critical-curve pixels may differ visibly.
        diff = np.abs(img_sharded - img_single).max(axis=2)
        assert (diff < 5e-4).mean() > 0.995
        assert diff.max() < 5e-2

    def test_nondivisible_pixel_count_pads(self):
        scene = small_scene(width=30, height=11)  # 330 pixels, not / 8
        mesh = make_mesh(8)
        img = np.asarray(render_sharded(scene, mesh))
        assert img.shape == (11, 30, 3)
        assert np.all(np.isfinite(img))

    def test_sharded_supersampling_matches_single_device(self):
        """Feature parity (VERDICT r2 item 8): n_samples accumulates inside
        the sharded program and matches the single-device supersampled
        render within the fp32 reduction tolerance."""
        scene = small_scene()
        mesh = make_mesh(8)
        img_sharded = np.asarray(render_sharded(scene, mesh, n_samples=3))
        img_single = np.asarray(render(scene, n_samples=3))
        diff = np.abs(img_sharded - img_single).max(axis=2)
        assert (diff < 5e-4).mean() > 0.995
        assert diff.max() < 5e-2

    def test_sharded_pallas_path_runs(self):
        """The Pallas kernel (interpret mode on CPU) inside shard_map:
        whole tiles per shard, block order restored after the gather."""
        import dataclasses as dc

        from blackhole_simulation_tpu.render import MarchConfig

        scene = small_scene(width=16, height=8)
        scene = dc.replace(
            scene, march_cfg=MarchConfig(max_steps=24, use_pallas=True)
        )
        scene_j = dc.replace(scene, march_cfg=MarchConfig(max_steps=24))
        mesh = make_mesh(8)
        img_p = np.asarray(render_sharded(scene, mesh))
        img_j = np.asarray(render_sharded(scene_j, mesh))
        assert np.all(np.isfinite(img_p))
        diff = np.abs(img_p - img_j).max(axis=2)
        assert (diff < 5e-4).mean() > 0.99


class TestInverseStep:
    def test_sharded_step_matches_unsharded(self):
        scene = small_scene(width=32, height=16, spin=0.8)
        target = jnp.zeros((16, 32, 3), jnp.float32)
        mesh = make_mesh(8)
        p0 = InverseParams.init(spin=0.5, dtype=jnp.float32)
        step_1 = make_inverse_step(scene, None)
        step_8 = make_inverse_step(scene, mesh)
        (p1, _), l1 = step_1(p0, target)
        (p8, _), l8 = step_8(p0, target)
        # fp32 psum reduction order differs from the single-device sum.
        np.testing.assert_allclose(float(l1), float(l8), rtol=1e-4)
        np.testing.assert_allclose(float(p1.spin), float(p8.spin), atol=5e-5)

    def test_inverse_recovers_spin(self):
        """Recover the spin from a target image rendered at a different spin —
        BASELINE configs[3] in miniature."""
        scene_true = small_scene(width=24, height=16, spin=0.85)
        from blackhole_simulation_tpu.render import render_radiance

        target = render_radiance(scene_true)
        scene_guess = small_scene(width=24, height=16, spin=0.85)
        params, losses = inverse_render(
            scene_guess,
            target,
            n_steps=80,
            init=InverseParams.init(spin=0.55, theta_cam=float(scene_true.camera.theta)),
            lr=0.02,
        )
        # Adam oscillates near the chaotic photon-ring pixels; assert on the
        # best loss reached and the spin moving toward the truth.
        assert min(losses) < losses[0] * 0.4
        assert abs(float(params.spin) - 0.85) < abs(0.55 - 0.85) - 0.05
