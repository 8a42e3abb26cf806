"""ctypes binding to the native seqlock engine (native/bridge.cpp).

The host-runtime replacement for the reference's SharedArrayBuffer +
Atomics + Web Worker stack (physics-bridge.ts:148-201, physics.worker.ts):
a C++ engine owns a 2 MB float32 state block written under a seqlock while
a heartbeat thread integrates camera kinematics; Python reads torn-free
snapshots. Builds the .so on demand with g++ (cached); a pure-Python twin
(`PyBridge`) keeps everything working without a toolchain.

Block offsets (float32 indices) mirror sab.rs:18-22.
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
import threading
import time

import numpy as np

CONTROL_OFFSET = 0
CAMERA_OFFSET = 64
PHYSICS_OFFSET = 128
TELEMETRY_OFFSET = 256
LUTS_OFFSET = 2048
N_SHADOW_POINTS = 64

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libbridge.so"))
_SRC_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "bridge.cpp"))


def _build_native() -> str | None:
    """Compile bridge.cpp -> libbridge.so if needed. Returns path or None."""
    try:
        if os.path.exists(_SO_PATH) and os.path.getmtime(_SO_PATH) >= os.path.getmtime(
            _SRC_PATH
        ):
            return _SO_PATH
        subprocess.run(
            [
                "g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-Wall",
                "-o", _SO_PATH, _SRC_PATH, "-lpthread",
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _SO_PATH
    except Exception:
        return None


class NativeBridge:
    """The C++ engine, bound via ctypes."""

    def __init__(self, mass: float = 1.0, spin: float = 0.9, so_path: str | None = None):
        path = so_path or _build_native()
        if path is None:
            raise RuntimeError("native bridge unavailable (g++ build failed)")
        lib = ctypes.CDLL(path)
        lib.engine_create.restype = ctypes.c_void_p
        lib.engine_create.argtypes = [ctypes.c_double, ctypes.c_double]
        lib.engine_destroy.argtypes = [ctypes.c_void_p]
        lib.engine_set_params.argtypes = [ctypes.c_void_p, ctypes.c_double, ctypes.c_double]
        lib.engine_set_auto_spin.argtypes = [ctypes.c_void_p, ctypes.c_double]
        lib.engine_input.argtypes = [ctypes.c_void_p] + [ctypes.c_double] * 3
        lib.engine_tick.argtypes = [ctypes.c_void_p, ctypes.c_double]
        lib.engine_start.argtypes = [ctypes.c_void_p, ctypes.c_double]
        lib.engine_stop.argtypes = [ctypes.c_void_p]
        lib.engine_read.restype = ctypes.c_uint32
        lib.engine_read.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ]
        lib.engine_ticks.restype = ctypes.c_uint64
        lib.engine_ticks.argtypes = [ctypes.c_void_p]
        self._lib = lib
        self._h = lib.engine_create(mass, spin)
        self._last_good: dict[str, np.ndarray] = {}

    # -- control --------------------------------------------------------------
    def set_params(self, mass: float, spin: float) -> None:
        self._lib.engine_set_params(self._h, mass, spin)

    def set_auto_spin(self, rate: float) -> None:
        self._lib.engine_set_auto_spin(self._h, rate)

    def input(self, dx: float = 0.0, dy: float = 0.0, zoom: float = 0.0) -> None:
        self._lib.engine_input(self._h, dx, dy, zoom)

    def tick(self, dt: float) -> None:
        self._lib.engine_tick(self._h, dt)

    def start(self, hz: float = 75.0) -> None:
        self._lib.engine_start(self._h, hz)

    def stop(self) -> None:
        self._lib.engine_stop(self._h)

    @property
    def ticks(self) -> int:
        return int(self._lib.engine_ticks(self._h))

    # -- seqlock reads ---------------------------------------------------------
    def _read(self, offset: int, count: int, key: str) -> np.ndarray:
        buf = (ctypes.c_float * count)()
        seq = self._lib.engine_read(self._h, buf, offset, count)
        arr = np.ctypeslib.as_array(buf).copy()
        if seq == 0 or not np.all(np.isfinite(arr)):
            # Torn read or NaN: last-good snapshot (physics-bridge.ts:156-186).
            return self._last_good.get(key, arr)
        self._last_good[key] = arr
        return arr

    def camera(self) -> dict:
        c = self._read(CAMERA_OFFSET, 6, "camera")
        return {
            "r": float(c[0]), "theta": float(c[1]), "phi": float(c[2]),
            "yaw_vel": float(c[3]), "pitch_vel": float(c[4]),
            "auto_spin": float(c[5]),
        }

    def physics(self) -> dict:
        p = self._read(PHYSICS_OFFSET, 8, "physics")
        return {
            "mass": float(p[0]), "spin": float(p[1]), "horizon": float(p[2]),
            "isco": float(p[3]), "photon_sphere": float(p[4]),
            "time_dilation": float(p[5]), "ergosphere_eq": float(p[6]),
            "surface_gravity": float(p[7]),
        }

    def shadow_curve(self) -> tuple[np.ndarray, np.ndarray]:
        data = self._read(LUTS_OFFSET, 2 * N_SHADOW_POINTS + 4, "shadow")
        pts = data[: 2 * N_SHADOW_POINTS].reshape(N_SHADOW_POINTS, 2)
        return pts, data[2 * N_SHADOW_POINTS :]

    def close(self) -> None:
        if self._h:
            self._lib.engine_destroy(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class PyBridge:
    """Pure-Python twin of the native engine (toolchain-free fallback).

    Same tick semantics: friction exp(-5 dt), auto-spin 0.15 rad/s,
    multiplicative zoom, NaN rollback; thread-safe via a lock instead of the
    seqlock (Python has no torn float reads under the GIL).
    """

    FRICTION = 5.0
    AUTO_SPIN = 0.15
    MOUSE_GAIN = 0.005
    ZOOM_GAIN = 1.1

    def __init__(self, mass: float = 1.0, spin: float = 0.9):
        self.mass, self.spin = mass, spin
        self.auto_spin = self.AUTO_SPIN
        self.r, self.theta, self.phi = 30.0, math.pi / 2 - 0.25, 0.0
        self.yaw_vel = self.pitch_vel = 0.0
        self._pending = [0.0, 0.0, 0.0]
        self._last_good = (self.r, self.theta, self.phi, 0.0, 0.0)
        self._lock = threading.Lock()
        self._thread = None
        self._running = False
        self.ticks = 0

    def set_params(self, mass, spin):
        self.mass, self.spin = mass, spin

    def set_auto_spin(self, rate):
        self.auto_spin = rate

    def input(self, dx=0.0, dy=0.0, zoom=0.0):
        with self._lock:
            self._pending[0] += dx
            self._pending[1] += dy
            self._pending[2] += zoom

    def tick(self, dt: float) -> None:
        dt = min(max(dt, 0.0), 0.033)
        with self._lock:
            dx, dy, dz = self._pending
            self._pending = [0.0, 0.0, 0.0]
            self.yaw_vel += dx * self.MOUSE_GAIN
            self.pitch_vel += dy * self.MOUSE_GAIN
            damp = math.exp(-self.FRICTION * dt)
            self.yaw_vel *= damp
            self.pitch_vel *= damp
            self.phi += (self.yaw_vel + self.auto_spin) * dt
            self.theta = min(max(self.theta + self.pitch_vel * dt, 0.05), math.pi - 0.05)
            if dz:
                self.r = min(max(self.r * self.ZOOM_GAIN ** (-dz), 4.0), 200.0)
            state = (self.r, self.theta, self.phi, self.yaw_vel, self.pitch_vel)
            if all(math.isfinite(v) for v in state):
                self._last_good = state
            elif self._last_good:
                (self.r, self.theta, self.phi, self.yaw_vel, self.pitch_vel) = self._last_good
            self.ticks += 1

    def start(self, hz: float = 75.0) -> None:
        if self._running:
            return
        self._running = True

        def loop():
            prev = time.perf_counter()
            while self._running:
                now = time.perf_counter()
                self.tick(now - prev)
                prev = now
                time.sleep(1.0 / hz)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread:
            self._thread.join()
            self._thread = None

    def camera(self) -> dict:
        with self._lock:
            return {
                "r": self.r, "theta": self.theta, "phi": self.phi,
                "yaw_vel": self.yaw_vel, "pitch_vel": self.pitch_vel,
                "auto_spin": self.auto_spin,
            }

    def physics(self) -> dict:
        from blackhole_simulation_tpu.geometry.radii import (
            event_horizon, isco, photon_sphere, time_dilation,
        )

        return {
            "mass": self.mass,
            "spin": self.spin,
            "horizon": float(event_horizon(self.mass, self.spin)),
            "isco": float(isco(self.mass, self.spin)),
            "photon_sphere": float(photon_sphere(self.mass, self.spin)),
            "time_dilation": float(time_dilation(self.mass, self.spin, self.r, self.theta)),
        }

    def shadow_curve(self):
        from blackhole_simulation_tpu.physics.shadow import bardeen_shadow

        a, b, _ = bardeen_shadow(self.mass, self.spin, self.theta, n=N_SHADOW_POINTS // 2)
        pts = np.stack([np.asarray(a), np.asarray(b)], axis=-1).astype(np.float32)
        ext = np.array([a.min(), a.max(), b.min(), b.max()], np.float32)
        return pts, ext

    def close(self) -> None:
        self.stop()


def load_bridge(mass: float = 1.0, spin: float = 0.9, prefer_native: bool = True):
    """NativeBridge when the toolchain is available, else PyBridge —
    the worker-unavailable fallback path (physics-bridge.ts:82-91)."""
    if prefer_native:
        try:
            return NativeBridge(mass, spin)
        except RuntimeError:
            pass
    return PyBridge(mass, spin)
