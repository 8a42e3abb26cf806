"""Dissect compile + run time of the 1080p render: march kernel alone vs
full pipeline, under different march configs. Usage:

  python tools/probe_compile.py kernel [--iters 2] [--steps 256] [--exit-every 16]
  python tools/probe_compile.py render [--no-pallas]
  python tools/probe_compile.py shade
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("what", choices=["kernel", "render", "shade"])
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--renorm-every", type=int, default=16)
    ap.add_argument("--exit-every", type=int, default=8)
    ap.add_argument("--approx-recip", action="store_true")
    ap.add_argument("--far-cap", type=float, default=0.0)
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--precull", action="store_true")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=5)
    args = ap.parse_args()

    from blackhole_simulation_tpu.render import Camera, MarchConfig, Scene, render
    from blackhole_simulation_tpu.render.camera import camera_rays
    from blackhole_simulation_tpu.geometry.metrics import KS, Kerr

    w, h = args.width, args.height
    cfg = MarchConfig(
        max_steps=args.steps,
        midpoint_iters=args.iters,
        renormalize_every=args.renorm_every,
        exit_check_every=args.exit_every,
        approx_recip=args.approx_recip,
        far_step_cap_rate=args.far_cap,
        use_pallas=not args.no_pallas,
        shadow_precull=args.precull,
    )
    cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.25, fov=0.5, width=w, height=h)
    scene = Scene.create(mass=1.0, spin=0.999, camera=cam, march_cfg=cfg)
    bh = Kerr(mass=jnp.float32(1.0), spin=jnp.float32(0.999), chart=KS)

    def bench(fn):
        t0 = time.perf_counter()
        out = fn()
        s = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(args.frames):
            t0 = time.perf_counter()
            out = fn()
            float(jnp.sum(out[0] if isinstance(out, tuple) else out))
            times.append(time.perf_counter() - t0)
        print(f"compile+first: {compile_s:.1f}s  best: {min(times)*1e3:.1f}ms  "
              f"({w*h/min(times)/1e6:.1f} Mrays/s)  checksum {s:.1f}")

    if args.what == "kernel":
        from blackhole_simulation_tpu.ops.pallas_march import pallas_march_u, to_block_order
        from blackhole_simulation_tpu.ops.ks_kernel import ks_renormalize_u, theta_state_to_u

        rays = camera_rays(cam, bh, dtype=jnp.float32)
        rays = to_block_order(rays, h, w)
        yt0 = ks_renormalize_u(bh.mass, bh.spin, theta_state_to_u(rays.T))
        yt0 = jax.block_until_ready(yt0)
        r_h = bh.event_horizon().astype(jnp.float32)
        r_ph = bh.photon_sphere().astype(jnp.float32)
        thr = jnp.full((yt0.shape[1],), 1.01 * r_h, jnp.float32)

        def fn():
            outs = pallas_march_u(yt0, thr, bh.mass, bh.spin, r_h, r_ph, cfg)
            return outs[0]

        bench(fn)
    elif args.what == "render":
        bench(lambda: render(scene, n_samples=1))
    else:  # shade: full render with pallas replaced by nothing — march 1 step
        cfg1 = MarchConfig(max_steps=1, use_pallas=False)
        scene1 = Scene.create(mass=1.0, spin=0.999, camera=cam, march_cfg=cfg1)
        bench(lambda: render(scene1, n_samples=1))


if __name__ == "__main__":
    main()
