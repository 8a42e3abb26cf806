"""Scaling harness: rays/s and parallel efficiency across mesh sizes.

BASELINE's scaling gate is ">= 95% linear rays/s scaling to >= 2 hosts".
Real multi-chip hardware is not available in this environment (one TPU
chip over a tunnel), so this harness measures what CAN be measured and
records it honestly:

 - on the real TPU: single-chip flagship rays/s (the 1-chip anchor);
 - on a virtual CPU mesh (xla_force_host_platform_device_count): the
   *sharding overhead efficiency* t(1 dev) / t(n dev) of the SPMD render
   and inverse-step programs. On one host every virtual device shares the
   same cores, so total work is constant and any efficiency below 1.0 is
   partition/padding/collective overhead added by the sharded program —
   the controllable part of the scaling gate. ICI bandwidth effects need
   real chips.

Writes SCALING_rNN.json (one JSON object) and prints it.

Usage:
  python tools/bench_scaling.py [--out SCALING.json] [--width W] [--height H]
  # virtual mesh run (the default when not on TPU):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/bench_scaling.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _best_time(fn, repeats=5):
    fn()  # compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--height", type=int, default=108)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax

    # Site customization pins jax_platforms to the sandbox TPU tunnel even
    # when JAX_PLATFORMS is set; honor the env var explicitly (the same
    # dance as tests/conftest.py).
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from blackhole_simulation_tpu.parallel import (
        InverseParams,
        make_inverse_step,
        make_mesh,
        render_sharded,
    )
    from blackhole_simulation_tpu.render import Camera, MarchConfig, Scene

    platform = jax.default_backend()
    n_devices = jax.device_count()
    w, h = args.width, args.height
    n_pix = w * h

    cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.25, fov=0.5, width=w, height=h)
    scene = Scene.create(
        mass=1.0, spin=0.999, camera=cam, march_cfg=MarchConfig(max_steps=args.steps)
    )

    sizes = [n for n in (1, 2, 4, 8) if n <= n_devices]
    render_times = {}
    inverse_times = {}
    for n in sizes:
        mesh = make_mesh(n)

        def frame(mesh=mesh):
            img = render_sharded(scene, mesh)
            return float(jnp.sum(img))

        render_times[n] = _best_time(frame, args.repeats)

        step = make_inverse_step(scene, mesh if n > 1 else None)
        params = InverseParams.init(theta_cam=float(cam.theta))
        target = jnp.zeros((h, w, 3), jnp.float32)

        def inv_step(step=step, params=params, target=target):
            (_, _), loss = step(params, target)
            return float(loss)

        inverse_times[n] = _best_time(inv_step, args.repeats)

    t1r = render_times[sizes[0]]
    t1i = inverse_times[sizes[0]]
    report = {
        "platform": platform,
        "device_kind": str(jax.devices()[0].device_kind),
        "n_devices": n_devices,
        "frame": f"{w}x{h}x{args.steps}steps",
        "render": {
            str(n): {
                "seconds": round(render_times[n], 4),
                "mrays_per_s": round(n_pix / render_times[n] / 1e6, 3),
                "overhead_efficiency": round(t1r / render_times[n], 4),
            }
            for n in sizes
        },
        "inverse_step": {
            str(n): {
                "seconds": round(inverse_times[n], 4),
                "overhead_efficiency": round(t1i / inverse_times[n], 4),
            }
            for n in sizes
        },
        "note": (
            "virtual-mesh overhead efficiency: t(1 dev)/t(n dev) on one host "
            "(same total work; <1.0 = sharding overhead). Real ICI scaling "
            "needs multi-chip hardware."
        ),
    }
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
