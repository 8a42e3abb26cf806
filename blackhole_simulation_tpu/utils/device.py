"""Accelerator detection + preset recommendation.

Twin of src/utils/device-detection.ts (mobile/integrated-GPU probing via
WEBGL_debug_renderer_info) re-keyed to JAX backends: inspect the platform
and device kind, estimate a hardware tier, and recommend a preset /
initial render scale (useMobileOptimization's balanced-preset fallback).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class DeviceInfo:
    platform: str          # "tpu" | "gpu" | "cpu"
    device_kind: str       # e.g. "TPU v5 lite"
    n_devices: int
    tier: str              # "high" | "medium" | "low"


def detect_device() -> DeviceInfo:
    try:
        import jax

        devs = jax.devices()
        platform = jax.default_backend()
        kind = devs[0].device_kind if devs else "unknown"
        n = len(devs)
    except Exception:
        return DeviceInfo("cpu", "unknown", 1, "low")
    if platform == "tpu":
        tier = "high"
    elif platform == "gpu":
        tier = "high"
    else:
        tier = "low"
    return DeviceInfo(platform, kind, n, tier)


def recommend_preset(info: DeviceInfo | None = None) -> str:
    """Tier -> preset (benchmark.ts:298-336 recommendation ladder without
    running the benchmark; BenchmarkController measures the real one)."""
    info = info or detect_device()
    return {"high": "cinematic", "medium": "balanced", "low": "minimal"}[info.tier]
