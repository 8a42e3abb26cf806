"""Host utils: validation, error ring, cache/debounce/idle, device detection."""

import numpy as np

from blackhole_simulation_tpu.utils import (
    Debouncer,
    ErrorTracker,
    IdleDetector,
    PhysicsCache,
    clamp_and_validate,
    detect_device,
    is_finite_state,
    recommend_preset,
)
from blackhole_simulation_tpu.utils.validate import clamp_array


class TestValidate:
    def test_clamp_basics(self):
        assert clamp_and_validate(5.0, 0.0, 1.0) == 1.0
        assert clamp_and_validate(-5.0, 0.0, 1.0) == 0.0
        assert clamp_and_validate(0.5, 0.0, 1.0) == 0.5

    def test_nan_fallback(self):
        assert clamp_and_validate(float("nan"), 0.0, 1.0, default=0.25) == 0.25
        assert clamp_and_validate(float("inf"), 0.0, 2.0) == 1.0  # midpoint
        assert clamp_and_validate("junk", 0.0, 2.0, default=0.1) == 0.1

    def test_clamp_array(self):
        out = clamp_array([0.5, np.nan, 9.0, -np.inf], 0.0, 1.0, default=0.3)
        np.testing.assert_allclose(out, [0.5, 0.3, 1.0, 0.3])

    def test_finite_state(self):
        assert is_finite_state([1.0, 2.0])
        assert not is_finite_state([1.0, float("nan")])


class TestErrorTracker:
    def test_ring_capacity(self):
        t = ErrorTracker(capacity=3)
        for i in range(5):
            t.record("error", f"e{i}")
        recent = t.recent()
        assert len(recent) == 3
        assert recent[-1].message == "e4"

    def test_severity_filter_and_counts(self):
        t = ErrorTracker()
        t.record("warning", "w")
        try:
            raise ValueError("boom")
        except ValueError as e:
            t.record("fatal", "f", context="test", exc=e)
        assert t.counts() == {"warning": 1, "fatal": 1}
        fatal = t.recent(severity="fatal")
        assert "boom" in fatal[0].trace


class TestCache:
    def test_hit_miss(self):
        cache = PhysicsCache()
        calls = []

        def fn(x):
            calls.append(x)
            return x * 2

        assert cache.get_or_compute(fn, 3) == 6
        assert cache.get_or_compute(fn, 3) == 6
        assert calls == [3]
        assert (cache.hits, cache.misses) == (1, 1)

    def test_lru_eviction(self):
        cache = PhysicsCache(capacity=2)
        fn = lambda x: x  # noqa: E731
        cache.get_or_compute(fn, 1)
        cache.get_or_compute(fn, 2)
        cache.get_or_compute(fn, 3)
        cache.get_or_compute(fn, 1)  # 1 was evicted -> miss again
        assert cache.misses == 4


class TestDebounceIdle:
    def test_debounce_trailing_edge(self):
        t = {"now": 0.0}
        fired = []
        d = Debouncer(fired.append, delay_s=0.1, clock=lambda: t["now"])
        d.push(1)
        t["now"] = 0.05
        d.push(2)
        assert not d.poll()
        t["now"] = 0.16
        assert d.poll()
        assert fired == [2]
        assert not d.poll()  # disarmed

    def test_idle_detector(self):
        t = {"now": 0.0}
        idle = IdleDetector(threshold_s=3.0, clock=lambda: t["now"])
        assert not idle.idle
        t["now"] = 4.0
        assert idle.idle
        idle.activity()
        assert not idle.idle


class TestDevice:
    def test_detect_and_recommend(self):
        info = detect_device()
        assert info.platform in ("tpu", "gpu", "cpu")
        assert info.n_devices >= 1
        assert recommend_preset(info) in ("cinematic", "balanced", "minimal")
