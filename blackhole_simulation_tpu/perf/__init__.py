"""Performance/observability: monitor, PID resolution control, benchmark,
validation, march telemetry.

Capability parity with reference src/performance/ (monitor.ts, benchmark.ts,
validation.ts, gpu-timer.ts) re-targeted at TPU metrics: rays/s/chip,
step-count histograms, Hamiltonian-drift audits, scaling efficiency.
"""

from blackhole_simulation_tpu.perf.monitor import (
    FrameRingBuffer,
    PIDController,
    PerformanceMonitor,
)
from blackhole_simulation_tpu.perf.benchmark import BenchmarkController, BenchmarkResult
from blackhole_simulation_tpu.perf.validator import PerformanceValidator
from blackhole_simulation_tpu.perf.telemetry import march_telemetry
from blackhole_simulation_tpu.perf.timer import DeviceTimer

__all__ = [
    "FrameRingBuffer",
    "PIDController",
    "PerformanceMonitor",
    "BenchmarkController",
    "BenchmarkResult",
    "PerformanceValidator",
    "march_telemetry",
    "DeviceTimer",
]
