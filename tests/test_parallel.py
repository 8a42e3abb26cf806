"""Multi-device tests on the 8-virtual-device CPU mesh (conftest).

The TPU analogue of the reference's mock-GL backend tests: validate that the
sharded programs compile, run, and agree bit-for-bit (or allclose) with the
single-device path — SURVEY.md §4 "multi-node without a cluster".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


class TestFDInverseStep:
    def test_fd_sharded_losses_match_unsharded(self):
        """The FD step's 9-point loss vector is identical (up to psum
        reduction order) whether rays are sharded over the mesh or not."""
        from blackhole_simulation_tpu.parallel import make_fd_inverse_step

        scene = small_scene(width=32, height=16, spin=0.8)
        target = jnp.zeros((16, 32, 3), jnp.float32)
        mesh = make_mesh(8)
        p0 = InverseParams.init(spin=0.5, theta_cam=float(scene.camera.theta))
        from blackhole_simulation_tpu.parallel.train import _params_to_vec

        vec0 = _params_to_vec(p0).astype(jnp.float32)
        state0 = (vec0, (jnp.zeros(4), jnp.zeros(4), jnp.zeros((), jnp.int32)))
        step_1 = make_fd_inverse_step(scene, None)
        step_8 = make_fd_inverse_step(scene, mesh)
        (v1, _), l1 = step_1(state0, target)
        (v8, _), l8 = step_8(state0, target)
        np.testing.assert_allclose(float(l1), float(l8), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v8), atol=5e-4)


class TestCotangentClip:
    def test_forward_identity_and_bounded_backward(self):
        """cotangent_clip leaves the forward pass bit-identical and keeps
        the backward pass finite (MarchConfig.cotangent_clip rationale)."""
        import dataclasses as dc

        from blackhole_simulation_tpu.render import MarchConfig, render_radiance

        base = small_scene(width=24, height=16, spin=0.92)
        s_off = dc.replace(base, march_cfg=MarchConfig(max_steps=96))
        s_on = dc.replace(
            base, march_cfg=MarchConfig(max_steps=96, cotangent_clip=1.0)
        )
        img_off = np.asarray(render_radiance(s_off))
        img_on = np.asarray(render_radiance(s_on))
        np.testing.assert_array_equal(img_off, img_on)

        def loss(scene, spin):
            s = dc.replace(scene, bh=dc.replace(scene.bh, spin=spin))
            return jnp.mean(render_radiance(s) ** 2)

        g = jax.grad(lambda a: loss(s_on, a))(jnp.float32(0.92))
        assert np.isfinite(float(g))


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
        BASELINE configs[3] in miniature, at the full 64x64 / ±0.02 bar.

        Uses the FD driver explicitly: RAW reverse-mode AD through the
        chaotic march returns garbage gradients on long horizons (measured
        d(loss)/d(spin) = -4.3e5, wrong sign, where the loss itself is a
        smooth basin). The production default is now the AD curriculum
        (test_ad_inverse_recovers_spin below); FD stays the fallback and
        this test pins it. Assertions are on the FINAL loss and the
        recovered spin — not best-of-trajectory."""
        from blackhole_simulation_tpu.render import MarchConfig, render_radiance
        import dataclasses as dc

        scene_true = small_scene(width=64, height=64, spin=0.85)
        scene_true = dc.replace(scene_true, march_cfg=MarchConfig(max_steps=160))
        target = render_radiance(scene_true)
        params, losses = inverse_render(
            scene_true,
            target,
            n_steps=48,
            init=InverseParams.init(
                spin=0.55, theta_cam=float(scene_true.camera.theta)
            ),
            lr=0.04,
            method="fd",
        )
        assert losses[-1] < losses[0] * 0.2
        assert abs(float(params.spin) - 0.85) < 0.02


class TestHostChipMesh:
    def test_host_chip_mesh_renders(self):
        """The 2-D hosts x chips mesh (single process: 1 x 8) drives the
        sharded render and matches the flat 1-D mesh (VERDICT r2 item 7:
        make_host_chip_mesh must have a real consumer)."""
        from blackhole_simulation_tpu.parallel import make_host_chip_mesh

        scene = small_scene()
        mesh2d = make_host_chip_mesh()
        assert mesh2d.devices.shape == (1, jax.device_count())
        img2 = np.asarray(render_sharded(scene, mesh2d))
        img1 = np.asarray(render_sharded(scene, make_mesh(8)))
        np.testing.assert_allclose(img2, img1, atol=5e-5)

    def test_gather_image_single_process_identity(self):
        from blackhole_simulation_tpu.parallel import gather_image

        x = jnp.arange(12.0).reshape(2, 2, 3)
        np.testing.assert_array_equal(np.asarray(gather_image(x)), np.asarray(x))


class TestScalingEfficiency:
    def test_sharding_overhead_efficiency(self):
        """BASELINE scaling gate, controllable part (tools/bench_scaling.py):
        on one host, n virtual devices do the same total work as 1, so any
        best-time slowdown of the sharded program is partition/padding/
        collective overhead. Gate: >= 95% (best-of-7 timings to shed CI
        scheduler noise)."""
        import time

        # Big enough that per-kernel dispatch overhead amortizes: with
        # tiny shards the fixed per-device cost dominates and the test
        # measures scheduler noise, not sharding overhead.
        scene = small_scene(width=256, height=96)

        mesh1 = make_mesh(1)
        mesh8 = make_mesh(8)
        f1 = lambda: jax.block_until_ready(render_sharded(scene, mesh1))
        f8 = lambda: jax.block_until_ready(render_sharded(scene, mesh8))
        f1(), f8()  # compile
        # Interleave the samples so background load hits both configs
        # equally; best-of-9 sheds scheduler noise.
        t1s, t8s = [], []
        for _ in range(9):
            t0 = time.perf_counter(); f1(); t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); f8(); t8s.append(time.perf_counter() - t0)
        eff = min(t1s) / min(t8s)
        assert eff > 0.95, f"sharding overhead efficiency {eff:.3f} < 0.95"


class TestADInverse:
    """AD-driven inverse rendering (VERDICT r4 item 2): pixel gradients
    through the march — the short-horizon pooled curriculum — are the
    production method."""

    @pytest.fixture(autouse=True)
    def _fresh_caches(self):
        # These tests compile the largest programs in the suite
        # (shard_map(value_and_grad(march)) over 8 virtual devices); with
        # ~200 tests' worth of live executables already cached, the XLA
        # CPU compiler has been observed to SEGFAULT here (reproducibly in
        # the full suite, never standalone). Dropping the accumulated
        # executable cache first keeps the process inside the compiler's
        # comfort zone.
        jax.clear_caches()
        yield

    def test_ad_step_gradient_points_into_basin(self):
        """One curriculum-stage Adam step must move spin TOWARD the target
        from both sides (the raw long-horizon AD step fails this with a
        wrong-sign gradient — see the chaos rationale in train.py)."""
        from blackhole_simulation_tpu.parallel.train import (
            make_ad_inverse_step,
        )
        from blackhole_simulation_tpu.render import MarchConfig, render_radiance
        import dataclasses as dc

        scene = small_scene(width=48, height=48, spin=0.85)
        scene = dc.replace(
            scene,
            march_cfg=MarchConfig(max_steps=96, step_rate=0.12,
                                  midpoint_iters=1, remat_every=32),
        )
        target = render_radiance(scene)
        step = make_ad_inverse_step(scene, pool=8, march_steps=48, lr=2e-2)
        for a0 in (0.7, 0.95):
            p0 = InverseParams.init(
                spin=a0, theta_cam=float(scene.camera.theta)
            )
            (p1, _), _ = step(p0, target)
            moved = float(p1.spin) - a0
            assert np.sign(moved) == np.sign(0.85 - a0), (a0, float(p1.spin))

    def test_ad_sharded_step_matches_unsharded(self):
        from blackhole_simulation_tpu.parallel.train import (
            make_ad_inverse_step,
        )
        from blackhole_simulation_tpu.render import MarchConfig, render_radiance
        import dataclasses as dc

        scene = small_scene(width=32, height=32, spin=0.8)
        scene = dc.replace(
            scene, march_cfg=MarchConfig(max_steps=48, midpoint_iters=1)
        )
        target = jnp.zeros((32, 32, 3), jnp.float32)
        p0 = InverseParams.init(spin=0.5)
        step1 = make_ad_inverse_step(scene, None, pool=4, march_steps=48)
        step8 = make_ad_inverse_step(scene, make_mesh(8), pool=4,
                                     march_steps=48)
        (p1, _), l1 = step1(p0, target)
        (p8, _), l8 = step8(p0, target)
        np.testing.assert_allclose(float(l1), float(l8), rtol=1e-4)
        np.testing.assert_allclose(float(p1.spin), float(p8.spin), atol=5e-5)

    def test_ad_inverse_recovers_spin_256(self):
        """VERDICT r4 item 2 'done' criterion: inverse_render(method='ad')
        recovers spin to |da| < 1e-2 from a rendered target at 256^2 —
        pixel gradients only, no finite differences anywhere."""
        from blackhole_simulation_tpu.render import MarchConfig, render_radiance
        import dataclasses as dc

        cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.25, fov=0.5,
                            width=256, height=256)
        scene = Scene.create(
            mass=1.0, spin=0.85, camera=cam,
            march_cfg=MarchConfig(max_steps=256, step_rate=0.12,
                                  far_step_cap_rate=0.4,
                                  far_boost_radius=20.0, midpoint_iters=1,
                                  remat_every=32),
        )
        target = render_radiance(scene)
        # two curriculum stages keep the (CPU) runtime in slow-tier bounds;
        # the third stage only polishes below the 1e-2 bar
        params, losses = inverse_render(
            scene, target, n_steps=36, method="ad",
            ad_stages=((64, 8), (96, 4)),
            init=InverseParams.init(spin=0.5,
                                    theta_cam=float(cam.theta)),
        )
        assert losses[-1] < losses[0] * 0.1
        assert abs(float(params.spin) - 0.85) < 1e-2, float(params.spin)
