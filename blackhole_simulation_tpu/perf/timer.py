"""Device timing — the GPUTimer analogue.

Capability parity with reference src/performance/gpu-timer.ts:27-165 (async
GPU elapsed-time queries). On TPU the equivalent split is host-dispatch vs
device-execute: we time a dispatch without blocking, then resolve when the
result is ready — same shape as the reference's 1-3-frame-latency query
pool, without stalling the pipeline each frame.
"""

from __future__ import annotations

import time

import jax


class DeviceTimer:
    """Measure device execution by bracketing block_until_ready.

    begin() -> token; end(token, arrays) blocks on the arrays and returns
    (total_s, dispatch_s): dispatch_s is the host-side call time already
    spent, total - dispatch approximates device execution.
    """

    def __init__(self):
        self.last_total_ms = 0.0
        self.last_device_ms = 0.0

    def begin(self) -> float:
        return time.perf_counter()

    def mark_dispatched(self, t0: float) -> float:
        return time.perf_counter() - t0

    def end(self, t0: float, arrays, dispatch_s: float | None = None):
        jax.block_until_ready(arrays)
        total = time.perf_counter() - t0
        self.last_total_ms = total * 1e3
        if dispatch_s is not None:
            self.last_device_ms = max(total - dispatch_s, 0.0) * 1e3
        else:
            self.last_device_ms = self.last_total_ms
        return self.last_total_ms, self.last_device_ms


def time_jitted(fn, *args, iters: int = 5, warmup: int = 1):
    """min/mean wall time of a jitted call, compile excluded. Returns dict."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return {
        "best_s": min(times),
        "mean_s": sum(times) / len(times),
        "iters": iters,
    }
