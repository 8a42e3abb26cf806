"""Checkpoint/resume (orbax or npz fallback) + adaptive resolution controller."""

import jax.numpy as jnp
import numpy as np

from blackhole_simulation_tpu.parallel.checkpoint import (
    CheckpointManager,
    load_checkpoint,
    save_checkpoint,
)
from blackhole_simulation_tpu.parallel.train import InverseParams, init_opt_state
from blackhole_simulation_tpu.perf.adaptive_resolution import (
    AdaptiveResolutionController,
)


class TestCheckpoint:
    def test_round_trip_pytree(self, tmp_path):
        tree = {
            "a": jnp.arange(6.0).reshape(2, 3),
            "nested": (jnp.zeros(4), jnp.asarray(3)),
        }
        path = save_checkpoint(str(tmp_path / "ck"), tree)
        like = {"a": jnp.zeros((2, 3)), "nested": (jnp.zeros(4), jnp.asarray(0))}
        back = load_checkpoint(path, like)
        np.testing.assert_allclose(np.asarray(back["a"]), np.asarray(tree["a"]))
        np.testing.assert_allclose(np.asarray(back["nested"][0]), 0.0)

    def test_inverse_state_round_trip(self, tmp_path):
        params = InverseParams.init(spin=0.7)
        state = (params, init_opt_state(params))
        path = save_checkpoint(str(tmp_path / "inv"), state)
        back = load_checkpoint(path, state)
        np.testing.assert_allclose(float(back[0].spin), 0.7, rtol=1e-6)

    def test_manager_latest_and_retention(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "run"), keep=2)
        tree = {"x": jnp.zeros(3)}
        for step in (10, 20, 30):
            mgr.save(step, {"x": jnp.full(3, float(step))})
        assert mgr.steps() == [20, 30]  # step 10 evicted by retention
        step, restored = mgr.restore_latest(tree)
        assert step == 30
        np.testing.assert_allclose(np.asarray(restored["x"]), 30.0)

    def test_manager_empty(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "empty"))
        assert mgr.restore_latest({"x": jnp.zeros(1)}) == (None, None)


class TestAdaptiveResolution:
    def test_downscale_after_sustained_low(self):
        ctl = AdaptiveResolutionController()
        t = 0.0
        for _ in range(50):
            ctl.update(45.0, t)
            t += 0.1
        assert ctl.target_scale < 1.0

    def test_no_step_on_transient_dip(self):
        ctl = AdaptiveResolutionController()
        ctl.update(45.0, 0.0)
        ctl.update(45.0, 1.0)   # only 1 s below -> no step yet
        ctl.update(70.0, 1.5)   # recovered (deadband) -> window resets
        ctl.update(45.0, 2.0)
        ctl.update(45.0, 3.5)
        assert ctl.target_scale == 1.0

    def test_upscale_after_sustained_high(self):
        ctl = AdaptiveResolutionController()
        t = 0.0
        for _ in range(60):      # drive down first
            ctl.update(40.0, t)
            t += 0.1
        low = ctl.target_scale
        for _ in range(120):     # then sustained high
            ctl.update(90.0, t)
            t += 0.1
        assert ctl.target_scale > low

    def test_clamped_bounds(self):
        ctl = AdaptiveResolutionController()
        t = 0.0
        for _ in range(500):
            ctl.update(10.0, t)
            t += 0.1
        assert ctl.target_scale == 0.5
        assert ctl.scale >= 0.5

    def test_scaled_dims_aligned(self):
        ctl = AdaptiveResolutionController()
        ctl.scale = 0.62
        w, h = ctl.scaled_dims(1920, 1080)
        assert w % 8 == 0 and h % 8 == 0
        assert abs(w / 1920 - 0.62) < 0.05
