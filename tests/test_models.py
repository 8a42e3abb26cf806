"""NRS surrogate + march-telemetry tests."""

import jax.numpy as jnp
import numpy as np

from blackhole_simulation_tpu.models import (
    generate_training_data,
    nrs_apply,
    nrs_flat_weights,
    nrs_from_flat,
    nrs_init,
    train_nrs,
)
from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
from blackhole_simulation_tpu.perf import march_telemetry
from blackhole_simulation_tpu.render import Camera, MarchConfig, camera_rays, march


class TestNRS:
    def test_flat_roundtrip(self):
        params = nrs_init(3)
        flat = nrs_flat_weights(params)
        # 4-layer 16-wide MLP: 3*16+16 + 2*(16*16+16) + 16*3+3 = 659 weights.
        assert flat.shape == (659,)
        back = nrs_from_flat(flat)
        x = jnp.ones((5, 3))
        np.testing.assert_allclose(
            np.asarray(nrs_apply(params, x)), np.asarray(nrs_apply(back, x)), rtol=1e-6
        )

    def test_dataset_physical(self):
        x, y = generate_training_data(n=24, b_range=(6.0, 30.0), seed=1)
        assert x.shape == (24, 3) and y.shape == (24, 3)
        defl, esc = np.asarray(y[:, 0]), np.asarray(y[:, 2])
        # Large-b escaped rays deflect by roughly 4M/b (positive, small).
        big_b = np.asarray(x[:, 0]) > 0.5  # b > 15M
        assert esc[big_b].min() == 1.0
        assert np.all(defl[big_b & (esc > 0)] > 0.0)
        assert np.all(defl[big_b & (esc > 0)] < 1.0)

    def test_training_reduces_loss_and_predicts(self):
        x, y = generate_training_data(n=48, b_range=(6.0, 30.0), seed=2)
        params, losses = train_nrs(x, y, n_steps=400, lr=1e-2)
        assert losses[-1] < losses[0] * 0.25
        pred = np.asarray(nrs_apply(params, x))
        # Deflection channel: a 16-wide surrogate can't nail the near-critical
        # spike, but the bulk must sit well under the signal scale.
        err = np.abs(pred[:, 0] - np.asarray(y[:, 0]))
        assert np.median(err) < 0.2 * np.abs(np.asarray(y[:, 0])).max()


class TestTelemetry:
    def test_march_telemetry_fields(self):
        bh = Kerr(mass=jnp.asarray(1.0, jnp.float32), spin=jnp.asarray(0.9, jnp.float32), chart=KS)
        cam = Camera.create(width=24, height=16)
        res = march(camera_rays(cam, bh), bh, MarchConfig(max_steps=128))
        t = march_telemetry(res, bh)
        assert t["n_rays"] == 24 * 16
        assert abs(t["frac_escape"] + t["frac_horizon"] - 1.0) < 1e-9
        assert t["h_drift_p99"] < 1e-2  # fp32 null-constraint canary
        assert len(t["steps_hist"]["counts"]) == 8
