"""Live interactive session: the reference's real-time loop, closed.

The reference's product is input events -> camera filter -> physics tick ->
frame at 60 FPS (src/hooks/useAnimation.ts:202-523, useKeyboard.ts,
app/page.tsx:66-240). This module is that loop for the TPU build:

  keyboard/scripted input -> native C++ seqlock engine heartbeat
  (engine/native.py, the wasm PhysicsEngine + worker twin) -> camera
  state -> fused-kernel render at the PID-controlled adaptive resolution
  (perf/adaptive_resolution.py, the reference's -10%/2s +10%/5s law) ->
  terminal truecolor half-block display (or a PNG stream).

Resolution scaling is snapped to a fixed ladder so each rung is one jit
cache entry (a continuous scale would recompile every frame — the TPU
analogue of the reference's shader-variant cache keying).

Input: when stdin is a TTY, raw-mode keyboard (arrows orbit, +/- zoom,
space toggles auto-spin, q quits); otherwise --script drives a canned
input stream so the loop runs headless (CI, this sandbox).
"""

from __future__ import annotations

import dataclasses
import os
import select
import sys
import time

import numpy as np

SCALE_LADDER = (0.5, 0.65, 0.8, 1.0)


def _pick_scale(raw: float) -> float:
    for s in SCALE_LADDER:
        if raw <= s + 1e-6:
            return s
    return SCALE_LADDER[-1]


class _Keyboard:
    """Raw-mode nonblocking keyboard (the useKeyboard.ts bindings)."""

    def __init__(self):
        import termios
        import tty

        self._termios = termios
        self._fd = sys.stdin.fileno()
        self._saved = termios.tcgetattr(self._fd)
        tty.setcbreak(self._fd)

    def poll(self):
        events = []
        while select.select([sys.stdin], [], [], 0)[0]:
            ch = sys.stdin.read(1)
            if ch == "\x1b":  # arrow escape sequence
                seq = sys.stdin.read(2)
                events.append({"A": "up", "B": "down", "C": "right",
                               "D": "left"}.get(seq[-1:], None))
            else:
                events.append(ch)
        return [e for e in events if e]

    def close(self):
        self._termios.tcsetattr(self._fd, self._termios.TCSADRAIN, self._saved)


class _Script:
    """Canned input stream: named gestures per frame (headless driver)."""

    def __init__(self, name: str, n_frames: int):
        self.name = name
        self.n = n_frames
        self.i = 0

    def poll(self):
        i = self.i
        self.i += 1
        if self.name == "orbit":
            return [("drag", 18.0, 3.0 * np.sin(i * 0.05), 0.0)]
        if self.name == "dive":
            return [("drag", 6.0, 0.0, -0.012)]
        if self.name == "shake":
            return [("drag", 40.0 * np.sin(i * 0.3), 10.0 * np.cos(i * 0.2),
                     0.005 * np.sin(i * 0.1))]
        return []

    def close(self):
        pass


def _ansi_frame(img: np.ndarray) -> str:
    """(rows*2, cols, 3) uint8 -> truecolor half-block string."""
    top = img[0::2]
    bot = img[1::2]
    lines = []
    for yr in range(top.shape[0]):
        parts = []
        for x in range(top.shape[1]):
            tr, tg, tb = top[yr, x]
            br, bg, bb = bot[yr, x]
            parts.append(
                f"\x1b[38;2;{tr};{tg};{tb}m\x1b[48;2;{br};{bg};{bb}m▀"
            )
        lines.append("".join(parts) + "\x1b[0m")
    return "\n".join(lines)


def run_live(width=1280, height=720, mass=1.0, spin=0.9, frames=0,
             script=None, out_dir=None, term_cols=120, quality="high",
             use_pallas=None, calibrate=True, taa=True, pipelined=True):
    """Run the live session; returns a stats dict (fps, frames, scales)."""
    import jax
    import jax.numpy as jnp

    from blackhole_simulation_tpu.configs.simulation import QUALITY_RAY_STEPS
    from blackhole_simulation_tpu.engine.native import NativeBridge, PyBridge
    from blackhole_simulation_tpu.perf.adaptive_resolution import (
        AdaptiveResolutionController,
    )
    from blackhole_simulation_tpu.perf.monitor import PerformanceMonitor
    from blackhole_simulation_tpu.render import (
        Camera,
        MarchConfig,
        Scene,
        render,
    )

    on_tpu = jax.default_backend() == "tpu"
    if use_pallas is None:
        use_pallas = on_tpu

    def cfg_for(q: str) -> MarchConfig:
        return MarchConfig(
            max_steps=QUALITY_RAY_STEPS.get(q, 128) or 128,
            use_pallas=use_pallas,
            fused=use_pallas,
            shadow_precull=True,
            step_rate=0.2,
            far_step_cap_rate=0.4,
            far_boost_radius=20.0,
            approx_recip=use_pallas,
            midpoint_iters=1,
        )

    cfg = cfg_for(quality)

    # Native C++ seqlock engine with heartbeat; pure-Python twin fallback.
    try:
        engine = NativeBridge(mass=mass, spin=spin)
    except Exception:
        engine = PyBridge(mass=mass, spin=spin)
    engine.start(hz=75.0)
    engine.set_auto_spin(0.15)

    interactive = script is None and sys.stdin.isatty()
    inp = _Keyboard() if interactive else _Script(script or "orbit",
                                                  frames or 300)
    monitor = PerformanceMonitor()
    ctrl = AdaptiveResolutionController()
    scale = 1.0 if not on_tpu else _pick_scale(
        ctrl.update(60.0, time.monotonic())
    )

    term_rows = max(2, (term_cols * height // width) // 2) * 2

    # One jitted display program per ladder rung: render -> on-device
    # downsample to terminal size -> uint8 (fetch ~40 KB, not the frame).
    progs = {}

    # Motion-reprojected temporal accumulation (accumulate.py, the ATAA
    # warp): history lives ON DEVICE and threads through the jitted frame
    # program; the orbit no longer resets it. hist_state: (history, prev_cam,
    # have_history) per ladder rung.
    hist_state = {}

    def frame_fn(s):
        w = int(width * s) // 128 * 128 or 128
        h = int(height * s) // 32 * 32 or 32
        if s not in progs:
            def run(cam_vec, hist, prev_cam, have_hist):
                # one packed (4,) upload per frame: separate scalar args
                # each cost a tunnel transfer (measured ~10 ms/frame of
                # host overhead at 720p)
                r, theta, phi, spin_now = (cam_vec[0], cam_vec[1],
                                           cam_vec[2], cam_vec[3])
                cam = Camera.create(r=r, theta=theta, phi=phi, fov=0.5,
                                    width=w, height=h)
                scene = Scene.create(mass=mass, spin=spin_now, camera=cam,
                                     march_cfg=cfg)
                img = render(scene, n_samples=1)
                cam_now = jnp.stack(
                    [r, theta, phi, jnp.float32(0.5), jnp.float32(0.0)]
                )
                small = jax.image.resize(
                    img, (term_rows, term_cols, 3), method="linear"
                )
                if taa:
                    # Accumulate AT DISPLAY RESOLUTION: the session only
                    # ever shows the downsampled frame, and the full-res
                    # reprojection gather measured ~30 ms at 720p on TPU
                    # (arbitrary-index loads) vs ~free at terminal size.
                    from blackhole_simulation_tpu.render.accumulate import (
                        taa_resolve_reprojected,
                    )

                    resolved = taa_resolve_reprojected(
                        hist, small, prev_cam, cam_now, 0.8, 1.5
                    )
                    resolved = jnp.where(have_hist, resolved, small)
                else:
                    resolved = small
                disp = jnp.clip(resolved * 255.0, 0, 255).astype(jnp.uint8)
                return disp, resolved, cam_now

            progs[s] = jax.jit(run)

        def call(r, theta, phi, spin_now):
            st = hist_state.get(s)
            if st is None:
                zero = jnp.zeros((term_rows, term_cols, 3), jnp.float32)
                st = (zero, jnp.zeros((5,), jnp.float32),
                      jnp.asarray(False))
            cam_vec = jnp.asarray([r, theta, phi, spin_now], jnp.float32)
            disp, hist, cam_now = progs[s](cam_vec, *st[:2], st[2])
            hist_state[s] = (hist, cam_now, jnp.asarray(True))
            if hasattr(disp, "copy_to_host_async"):
                disp.copy_to_host_async()  # overlap D2H with later frames
            return disp

        return call

    # Startup calibration stress test (monitor.ts:79-86): ~3 s of frames at
    # the requested quality; below 30 FPS the session demotes one tier (and
    # rebuilds the march config — one extra warm jit entry), matching the
    # reference's finalizeCalibration quality cap.
    spin_now = spin

    STRESS_BATCH = 4

    def _stress():
        # Sustained-throughput stress (bench.py protocol): queue a batch,
        # fetch once — per-frame round trips would measure the tunnel.
        fn = frame_fn(scale)
        outs = [fn(jnp.float32(8.0), jnp.float32(1.3), jnp.float32(0.0),
                   jnp.float32(spin_now)) for _ in range(STRESS_BATCH)]
        np.asarray(outs[-1])

    if calibrate:
        _stress()  # compile outside the timed stress window
        new_quality = monitor.calibrate(_stress, quality=quality,
                                        frames_per_call=STRESS_BATCH)
        if new_quality != quality:
            quality = new_quality
            cfg = cfg_for(quality)
            progs.clear()
            hist_state.clear()

    stats = {"frames": 0, "scales": [], "fps": [],
             "quality": quality, "calibrated_fps": monitor.calibrated_fps}
    auto = True
    last = time.monotonic()
    inflight = []  # (device display array, t0, camera, frame index)
    try:
        n = 0
        while True:
            if frames and n >= frames:
                break
            events = inp.poll()
            dx = dy = zoom = 0.0
            for e in events:
                if e == "q":
                    raise KeyboardInterrupt
                if isinstance(e, tuple) and e[0] == "drag":
                    dx += e[1]
                    dy += e[2]
                    zoom += e[3]
                elif e == "left":
                    dx -= 30.0
                elif e == "right":
                    dx += 30.0
                elif e == "up":
                    dy -= 20.0
                elif e == "down":
                    dy += 20.0
                elif e in ("+", "="):
                    zoom -= 0.05
                elif e == "-":
                    zoom += 0.05
                elif e == " ":
                    auto = not auto
                    engine.set_auto_spin(0.15 if auto else 0.0)
            if isinstance(inp, _Script) and inp.i >= inp.n:
                break
            engine.input(dx=dx, dy=dy, zoom=zoom)

            cam_state = engine.camera()
            t0 = monitor.begin_frame()
            fn = frame_fn(scale)
            # Dispatch is asynchronous: the device array comes back
            # immediately; np.asarray() is the (tunnel-RTT-bound) fetch.
            disp = fn(
                jnp.float32(cam_state["r"]),
                jnp.float32(cam_state["theta"]),
                jnp.float32(cam_state["phi"]),
                jnp.float32(spin_now),
            )
            inflight.append((disp, t0, cam_state, n))
            depth = int(pipelined) * (2 if pipelined is True else pipelined)
            if len(inflight) <= depth:
                # Keep one frame in flight (VERDICT r4 item 10): the
                # ~25 ms host<->device round trip of this environment's
                # tunnel then overlaps the NEXT frame's render instead of
                # serializing with it — display lags by one frame, the
                # same latency the reference's TAA history carries.
                n += 1
                continue
            disp_p, t0_p, cam_p, idx_p = inflight.pop(0)
            img = np.asarray(disp_p)  # fetch (forces the oldest frame)
            monitor.end_frame(t0_p)
            now = time.monotonic()
            dt_frame = now - last
            last = now
            fps = 1.0 / max(dt_frame, 1e-6)
            new_scale = _pick_scale(ctrl.update(fps, now))
            if new_scale != scale:
                scale = new_scale
                inflight.clear()  # old-rung frames: drop, not display

            if out_dir:
                os.makedirs(out_dir, exist_ok=True)
                from blackhole_simulation_tpu.app.screenshot import save_png

                save_png(img.astype(np.float32) / 255.0,
                         os.path.join(out_dir, f"live_{idx_p:04d}.png"))
            elif sys.stdout.isatty():
                sys.stdout.write("\x1b[H\x1b[2J" if n == 0 else "\x1b[H")
                sys.stdout.write(_ansi_frame(img))
                sys.stdout.write(
                    f"\n\x1b[0m fps {fps:5.1f}  scale {scale:.2f}  "
                    f"r {cam_p['r']:.1f}  theta {cam_p['theta']:.2f} "
                    f" phi {cam_p['phi']:.2f}  [arrows orbit, +/- zoom, "
                    f"space auto-spin, q quit]\n"
                )
                sys.stdout.flush()

            stats["frames"] += 1
            stats["scales"].append(scale)
            stats["fps"].append(fps)
            n += 1
        # drain the pipeline so every dispatched frame is accounted for
        for disp_p, t0_p, cam_p, idx_p in inflight:
            img = np.asarray(disp_p)
            monitor.end_frame(t0_p)
            stats["frames"] += 1
    except KeyboardInterrupt:
        pass
    finally:
        inp.close()
        engine.stop()
        engine.close()
    stats["monitor"] = monitor.get_metrics()
    return stats
