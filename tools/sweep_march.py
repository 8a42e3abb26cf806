"""March-config sweep on real TPU: Mrays/s (batched protocol) + accuracy
proxy (median escape-direction angle vs a fine-step f32 reference, computed
at a reduced probe resolution so the sweep stays cheap).

The CPU f64 oracle gate (tests/test_oracle_gate.py) remains the
certification; this sweep only ranks configs by speed at bounded proxy
error. Run with JAX_COMPILATION_CACHE_DIR=/root/repo/.jit_cache so repeat
points are warm.

Usage: python tools/sweep_march.py [--points NAME ...]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

POINTS = {
    "base": {},
    "sr16": {"step_rate": 0.16},
    "sr20": {"step_rate": 0.20},
    "sr16x4": {"step_rate": 0.16, "exit_check_every": 4},
    "sr20x4": {"step_rate": 0.20, "exit_check_every": 4},
    "sr24x4": {"step_rate": 0.24, "exit_check_every": 4},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", nargs="*", default=list(POINTS))
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()

    from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
    from blackhole_simulation_tpu.render import Camera, MarchConfig, Scene, render
    from blackhole_simulation_tpu.render.camera import camera_rays
    from blackhole_simulation_tpu.render.march import HIT_ESCAPE, march
    from blackhole_simulation_tpu.render.shading import escape_direction

    w, h = args.width, args.height
    flag = dict(
        max_steps=256, use_pallas=True, shadow_precull=True,
        far_step_cap_rate=0.4, far_boost_radius=20.0, approx_recip=True,
        midpoint_iters=1,
    )
    cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.25, fov=0.5, width=w, height=h)
    K = args.frames
    reduce_k = jax.jit(lambda xs: jnp.stack(xs).sum())
    float(reduce_k([jnp.float32(0.0)] * K))

    # Accuracy probe: small frame, jnp march (no pallas — same math), f32.
    pw, ph = 192, 108
    pcam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.25, fov=0.5,
                         width=pw, height=ph)
    bh32 = Kerr(mass=jnp.float32(1.0), spin=jnp.float32(0.999), chart=KS)
    rays = camera_rays(pcam, bh32, dtype=jnp.float32)
    fine_cfg = MarchConfig(max_steps=2048, step_rate=0.03, midpoint_iters=2)
    rf = march(rays, bh32, fine_cfg)
    hf = np.asarray(rf.hit)
    df = np.asarray(escape_direction(rf.state, bh32))

    for name in args.points:
        over = POINTS[name]
        cfg = MarchConfig(**{**flag, **over})
        scene = Scene.create(mass=1.0, spin=0.999, camera=cam, march_cfg=cfg)

        @jax.jit
        def frame(scene=scene):
            return jnp.sum(render(scene, n_samples=1))

        t0 = time.perf_counter()
        float(frame())
        compile_s = time.perf_counter() - t0
        float(reduce_k([frame() for _ in range(K)]))
        t0 = time.perf_counter()
        float(reduce_k([frame() for _ in range(K)]))
        per = (time.perf_counter() - t0) / K
        mrays = w * h / per / 1e6

        # accuracy proxy (jnp march shares the step math with the kernel)
        acfg = dataclasses.replace(
            cfg, use_pallas=False, shadow_precull=False, approx_recip=False
        )
        ra = march(rays, bh32, acfg)
        ha = np.asarray(ra.hit)
        both = (ha == HIT_ESCAPE) & (hf == HIT_ESCAPE)
        da = np.asarray(escape_direction(ra.state, bh32))[both]
        ang = np.arccos(np.clip((da * df[both]).sum(axis=1), -1, 1))
        hit_agree = float((ha == hf).mean())
        print(
            f"{name:8s} {per*1e3:6.2f} ms  {mrays:6.1f} Mrays/s  "
            f"compile {compile_s:6.1f}s  med_err {np.median(ang)*1e3:5.2f} mrad  "
            f"p90_err {np.percentile(ang,90)*1e3:6.2f} mrad  hit_agree {hit_agree:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
