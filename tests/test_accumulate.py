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
