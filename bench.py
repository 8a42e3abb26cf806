"""Benchmark: Mrays/s/chip on the flagship render (1080p, Kerr a = 0.999).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against the reference's real-time envelope — 60 FPS at
1080p (docs/PERFORMANCE.md:3, the only throughput the reference commits to),
i.e. 1920*1080*60 = 124.4 Mrays/s on a desktop GPU. Note the comparison
favors the reference: its GPU march caps at <=500 Verlet steps of a
pseudo-Newtonian force, while this build integrates the exact Kerr-Schild
Hamiltonian with symplectic steps.

Usage: python bench.py [--ci] [--width W] [--height H] [--steps N] [--frames K]
  --ci  shrink to a smoke-test size (used on CPU / in tests).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ci", action="store_true", help="tiny smoke-test size")
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--frames", type=int, default=5)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/bh_tpu_jit_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass  # cache flags unavailable on some jax versions

    platform = jax.default_backend()
    if args.ci and platform == "cpu":
        width, height = 192, 108
    else:
        width, height = 1920, 1080
    if args.width:
        width = args.width
    if args.height:
        height = args.height

    import jax.numpy as jnp

    from blackhole_simulation_tpu.render import Camera, MarchConfig, Scene, render

    cam = Camera.create(
        r=30.0, theta=jnp.pi / 2 - 0.25, fov=0.5, width=width, height=height
    )
    scene = Scene.create(
        mass=1.0,
        spin=0.999,
        camera=cam,
        march_cfg=MarchConfig(
            max_steps=args.steps,
            # Tile-resident Pallas march on TPU (forward render only).
            use_pallas=(platform == "tpu"),
        ),
    )

    print(
        f"bench: {width}x{height} Kerr a=0.999, {args.steps}-step march on "
        f"{platform} ({jax.devices()[0].device_kind})",
        file=sys.stderr,
    )

    def frame():
        # Reduce to a scalar ON DEVICE and fetch it: block_until_ready is not
        # trustworthy on experimental backends (axon), but a host fetch
        # cannot complete before the computation has.
        img = render(scene, n_samples=1)
        return float(jnp.sum(img))

    # Warmup / compile.
    t0 = time.perf_counter()
    checksum = frame()
    print(
        f"bench: compile+first frame {time.perf_counter() - t0:.1f}s "
        f"(checksum {checksum:.1f})",
        file=sys.stderr,
    )

    times = []
    for _ in range(args.frames):
        t0 = time.perf_counter()
        frame()
        times.append(time.perf_counter() - t0)

    best = min(times)
    rays_per_s = width * height / best
    mrays = rays_per_s / 1e6
    baseline_mrays = 1920 * 1080 * 60 / 1e6  # reference 60 FPS @ 1080p envelope

    print(
        json.dumps(
            {
                "metric": "Mrays/s/chip 1080p Kerr a=0.999 full render",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / baseline_mrays, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
