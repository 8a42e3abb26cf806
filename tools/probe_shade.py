"""Dissect the non-march frame cost at 1080p: ray gen, block reorder,
starfield, disk shading, tonemap — each timed as its own jitted program.

Usage: python tools/probe_shade.py [--width 1920 --height 1080]
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
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=5)
    args = ap.parse_args()
    w, h = args.width, args.height
    n = w * h

    from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
    from blackhole_simulation_tpu.render import Camera, MarchConfig, Scene
    from blackhole_simulation_tpu.render.camera import camera_rays
    from blackhole_simulation_tpu.render.march import MarchResult, march
    from blackhole_simulation_tpu.render.pipeline import shade_sample
    from blackhole_simulation_tpu.render.post import tonemap
    from blackhole_simulation_tpu.render.shading import starfield
    from blackhole_simulation_tpu.ops.pallas_march import (
        from_block_order,
        to_block_order,
    )

    cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.25, fov=0.5, width=w, height=h)
    scene = Scene.create(mass=1.0, spin=0.999, camera=cam)
    bh = Kerr(mass=jnp.float32(1.0), spin=jnp.float32(0.999), chart=KS)

    def timeit(name, fn, *xs):
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        out = jfn(*xs)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(args.frames):
            t0 = time.perf_counter()
            jax.block_until_ready(jfn(*xs))
            times.append(time.perf_counter() - t0)
        print(f"{name:28s} compile {compile_s:6.1f}s   best {min(times)*1e3:7.2f}ms")
        return out

    rays = timeit("camera_rays", lambda: camera_rays(cam, bh, dtype=jnp.float32))
    timeit("to+from_block_order", lambda x: from_block_order(
        to_block_order(x, h, w), h, w), rays)

    # A real small march (8 steps) to get a structurally-true MarchResult.
    result = march(rays, bh, MarchConfig(max_steps=8))
    result = jax.block_until_ready(result)

    dirs = jnp.stack(
        [jnp.ones(n), jnp.zeros(n), jnp.zeros(n)], axis=-1
    ).astype(jnp.float32)
    timeit("starfield", lambda d: starfield(d, scene.stars), dirs)
    timeit(
        "shade_sample (full)",
        lambda res, y0: shade_sample(res, bh, scene, jnp.float32, y0),
        result, rays,
    )
    img = jnp.zeros((h, w, 3), jnp.float32)
    timeit("tonemap+post", lambda x: tonemap(x, scene.post), img)


if __name__ == "__main__":
    main()
