"""Engine facade + native state bridge.

Capability parity with the reference's FFI/runtime tier:
 - ``PhysicsEngine`` (facade.py) — the gravitas-wasm PhysicsEngine API
   surface (compute_*, generate_*_lut, meshes, fields, tick,
   integrate_ray_relativistic; lib.rs:42-465),
 - ``NativeBridge`` (native.py) — ctypes binding to the C++ seqlock state
   block + camera kinematic filter + heartbeat (native/bridge.cpp), the
   SAB/worker/Atomics replacement. Falls back to a pure-Python twin when no
   C++ toolchain is available.
"""

from blackhole_simulation_tpu.engine.native import (
    CAMERA_OFFSET,
    CONTROL_OFFSET,
    LUTS_OFFSET,
    PHYSICS_OFFSET,
    TELEMETRY_OFFSET,
    NativeBridge,
    PyBridge,
    load_bridge,
)
from blackhole_simulation_tpu.engine.facade import PhysicsEngine

__all__ = [
    "CAMERA_OFFSET",
    "CONTROL_OFFSET",
    "LUTS_OFFSET",
    "PHYSICS_OFFSET",
    "TELEMETRY_OFFSET",
    "NativeBridge",
    "PyBridge",
    "load_bridge",
    "PhysicsEngine",
]
