"""Config-schema and performance-subsystem tests (deterministic fake clocks,
mirroring the reference's fake FPS streams, SURVEY.md §4)."""

import dataclasses
import math

import numpy as np

from blackhole_simulation_tpu.configs import (
    PARAMETER_SCHEMA,
    PRESETS,
    QUALITY_RAY_STEPS,
    SimulationParams,
    apply_preset,
    clamp_params,
    detect_preset,
    scene_from_params,
)
from blackhole_simulation_tpu.perf import (
    BenchmarkController,
    FrameRingBuffer,
    PIDController,
    PerformanceMonitor,
    PerformanceValidator,
)


class FakeClock:
    """Deterministic clock advancing a fixed dt per render call."""

    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def advance(self, dt):
        self.t += dt


class TestConfigSchema:
    def test_defaults_in_range(self):
        p = SimulationParams()
        for name, spec in PARAMETER_SCHEMA.items():
            v = getattr(p, name)
            assert spec.min <= v <= spec.max, name

    def test_clamp_nan_falls_back_to_default(self):
        p = dataclasses.replace(SimulationParams(), spin=math.nan, mass=1e9)
        c = clamp_params(p)
        assert c.spin == PARAMETER_SCHEMA["spin"].default
        assert c.mass == PARAMETER_SCHEMA["mass"].max

    def test_apply_and_detect_preset(self):
        p = apply_preset(SimulationParams(), "balanced")
        assert p.quality == "medium"
        assert detect_preset(p) == "balanced"

    def test_all_presets_valid(self):
        for name in PRESETS:
            p = apply_preset(SimulationParams(), name)
            assert p.quality in QUALITY_RAY_STEPS

    def test_scene_from_params_respects_scale_and_quality(self):
        p = dataclasses.replace(
            SimulationParams(), render_scale=0.5, quality="low", enable_bloom=False
        )
        scene = scene_from_params(p, width=128, height=64)
        assert scene.camera.width == 64
        assert scene.camera.height == 32
        assert scene.march_cfg.max_steps == 32
        assert not scene.post.bloom_enabled


class TestRingBuffer:
    def test_wraps_and_stats(self):
        rb = FrameRingBuffer(capacity=4)
        for v in (10, 20, 30, 40, 50):
            rb.push(v)
        assert len(rb) == 4
        assert rb.mean() == 35.0
        assert rb.minimum() == 20.0
        assert rb.maximum() == 50.0


class TestPID:
    def test_slow_frames_lower_scale(self):
        pid = PIDController()
        scale = 1.0
        for i in range(20):
            scale = pid.update(33.0, now=float(i))  # 30 FPS vs 15.8 ms target
        assert scale < 1.0

    def test_deadzone_holds_scale(self):
        pid = PIDController()
        for i in range(10):
            scale = pid.update(pid.setpoint * 1.01, now=float(i))
        assert scale == 1.0

    def test_cooldown_rate_limits(self):
        pid = PIDController(cooldown_s=10.0)
        s1 = pid.update(40.0, now=0.0)
        s2 = pid.update(40.0, now=1.0)  # within cooldown
        assert s1 == s2

    def test_scale_clamped(self):
        pid = PIDController()
        for i in range(500):
            pid.update(200.0, now=float(i))
        assert pid.scale >= pid.clamp[0]


class TestMonitor:
    def test_metrics_and_warnings(self):
        clk = FakeClock()
        mon = PerformanceMonitor(clock=clk)
        for _ in range(10):
            t0 = mon.begin_frame()
            clk.advance(0.040)  # 25 FPS
            mon.end_frame(t0, n_rays=1000)
        m = mon.get_metrics()
        assert abs(m["fps"] - 25.0) < 1e-6
        assert any("30 FPS" in w for w in m["warnings"])
        np.testing.assert_allclose(m["rays_per_s"], 1000 / 0.040)

    def test_calibrate_demotes_below_30fps(self):
        # 20 FPS stress -> below minStableFPS=30 -> high demotes to medium
        # and becomes the promotion cap (monitor.ts:235-246).
        clk = FakeClock()
        mon = PerformanceMonitor(clock=clk)
        q = mon.calibrate(lambda: clk.advance(0.050), quality="high")
        assert q == "medium"
        assert mon.max_allowed_quality == "medium"
        assert abs(mon.calibrated_fps - 20.0) < 1e-6

    def test_calibrate_keeps_quality_when_fast(self):
        clk = FakeClock()
        mon = PerformanceMonitor(clock=clk)
        q = mon.calibrate(lambda: clk.advance(0.010), quality="ultra")
        assert q == "ultra"
        assert mon.max_allowed_quality == "ultra"
        assert abs(mon.calibrated_fps - 100.0) < 1e-6

    def test_calibrate_runs_for_duration(self):
        # 0.5 s per stress frame against the 3 s window -> exactly 6 frames
        # of the injected clock (duration-bounded, not frame-bounded).
        clk = FakeClock()
        mon = PerformanceMonitor(clock=clk)
        calls = []
        mon.calibrate(lambda: (calls.append(1), clk.advance(0.5)),
                      quality="low")
        assert len(calls) == 6
        # "low" has no lower tier: demotion saturates.
        assert mon.max_allowed_quality == "low"


class TestBenchmark:
    def _controller(self, fps_by_preset):
        clk = FakeClock()

        def render(params):
            from blackhole_simulation_tpu.configs import detect_preset as dp

            name = dp(params) or "minimal"
            clk.advance(1.0 / fps_by_preset[name])

        return BenchmarkController(render, clock=clk, seconds_per_preset=0.5)

    def test_sweep_and_recommend_top_tier(self):
        ctrl = self._controller(
            {"minimal": 200.0, "balanced": 150.0, "quality": 90.0, "cinematic": 70.0}
        )
        results = ctrl.run()
        assert [r.preset for r in results] == [
            "minimal", "balanced", "quality", "cinematic",
        ]
        np.testing.assert_allclose(results[0].fps_avg, 200.0, rtol=1e-6)
        assert BenchmarkController.recommend(results) == "cinematic"

    def test_recommend_falls_back(self):
        ctrl = self._controller(
            {"minimal": 40.0, "balanced": 30.0, "quality": 20.0, "cinematic": 10.0}
        )
        results = ctrl.run()
        # Nothing clears 60 FPS; only "minimal" (40 FPS) clears the 35 tier.
        assert BenchmarkController.recommend(results) == "minimal"


class TestValidator:
    def test_feature_costs_and_report(self):
        clk = FakeClock()
        costs = {
            "enable_disk": 0.004,
            "enable_starfield": 0.001,
            "enable_photon_ring": 0.0005,
            "enable_bloom": 0.002,
        }

        def render(params):
            dt = 0.005  # baseline 5 ms
            for feat, c in costs.items():
                if getattr(params, feat):
                    dt += c
            clk.advance(dt)

        val = PerformanceValidator(render, clock=clk, warmup_s=0.05, measure_s=0.3)
        report = val.run()
        assert abs(report["baseline"]["frame_ms_avg"] - 5.0) < 0.1
        by_feat = {f["feature"]: f for f in report["features"]}
        assert abs(by_feat["enable_disk"]["cost_ms"] - 4.0) < 0.2
        assert report["targets_met"]["baseline"]  # 200 FPS > 75
        assert isinstance(report["recommendations"], list)
