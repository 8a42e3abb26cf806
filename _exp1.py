"""Batched perf experiments: frame decomposition + march variants + accuracy."""
import dataclasses
import json
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/bh_tpu_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from blackhole_simulation_tpu.render import Camera, MarchConfig, Scene, render
from blackhole_simulation_tpu.render.pipeline import render_radiance, shade_sample
from blackhole_simulation_tpu.render.camera import camera_rays
from blackhole_simulation_tpu.render.march import march
from blackhole_simulation_tpu.render.shading import (
    shade_disk_crossings, escape_direction, starfield,
)
from blackhole_simulation_tpu.render.post import tonemap, PostParams
from blackhole_simulation_tpu.ops.pallas_march import to_block_order, from_block_order

W, H = 1920, 1080
ON_TPU = jax.default_backend() == "tpu"


def timeit(fn, n=4):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3  # ms


def scene_with(**kw):
    cam = Camera.create(r=30.0, theta=jnp.pi/2 - 0.25, fov=0.5, width=W, height=H)
    return Scene.create(mass=1.0, spin=0.999, camera=cam,
                        march_cfg=MarchConfig(max_steps=256, use_pallas=ON_TPU, **kw))


print("== Part A: frame decomposition ==", flush=True)
scene0 = scene_with()
bh = scene0.bh

t_full = timeit(lambda: float(jnp.sum(render(scene0, n_samples=1))))
print(f"A full render           {t_full:7.1f} ms  ({W*H/t_full/1e3:.1f} Mrays/s)", flush=True)
t_rad = timeit(lambda: float(jnp.sum(render_radiance(scene0))))
print(f"A render_radiance       {t_rad:7.1f} ms", flush=True)

rays_fn = jax.jit(lambda: camera_rays(scene0.camera, bh, dtype=jnp.float32))
t_rays = timeit(lambda: jax.block_until_ready(rays_fn()))
print(f"A camera_rays           {t_rays:7.1f} ms", flush=True)

y0 = rays_fn()
y0b = to_block_order(y0, H, W)

@jax.jit
def march_fn(y0b):
    r = march(y0b, bh, scene0.march_cfg)
    return jax.tree.map(jnp.sum, (r.state, r.hit))

t_march = timeit(lambda: jax.block_until_ready(march_fn(y0b)[1]))
print(f"A march (block order)   {t_march:7.1f} ms", flush=True)

@jax.jit
def march_result(y0b):
    r = march(y0b, bh, scene0.march_cfg)
    return jax.tree.map(lambda x: from_block_order(x, H, W), r)

result = jax.block_until_ready(march_result(y0b))

shade_fn = jax.jit(lambda res, rays: jnp.sum(
    shade_sample(res, bh, scene0, jnp.float32, rays)))
t_shade = timeit(lambda: float(shade_fn(result, y0)))
print(f"A shade_sample          {t_shade:7.1f} ms", flush=True)

disk_fn = jax.jit(lambda res, rays: jax.tree.map(jnp.sum, shade_disk_crossings(
    res, bh, scene0.disk, rays, jnp.float32)))
t_disk = timeit(lambda: jax.block_until_ready(disk_fn(result, y0)))
print(f"A   disk crossings      {t_disk:7.1f} ms", flush=True)

star_fn = jax.jit(lambda res: jnp.sum(starfield(
    escape_direction(res.state, bh), scene0.stars)))
t_star = timeit(lambda: float(star_fn(result)))
print(f"A   starfield           {t_star:7.1f} ms", flush=True)

img = jnp.abs(jnp.asarray(np.random.default_rng(0).random((H, W, 3), np.float32)))
post_fn = jax.jit(lambda im: jnp.sum(tonemap(im, scene0.post)))
t_post = timeit(lambda: float(post_fn(img)))
print(f"A   tonemap+bloom       {t_post:7.1f} ms", flush=True)

reorder_fn = jax.jit(lambda y: jnp.sum(from_block_order(to_block_order(y, H, W), H, W)))
t_reorder = timeit(lambda: float(reorder_fn(y0)))
print(f"A   reorder round trip  {t_reorder:7.1f} ms", flush=True)

print("== Part B: march variants (1080p, march only) ==", flush=True)
VARIANTS = {
    "base":        {},
    "it1":         dict(midpoint_iters=1),
    "far15":       dict(far_step_cap_rate=0.15),
    "far25":       dict(far_step_cap_rate=0.25),
    "sr16":        dict(step_rate=0.16),
    "sr20":        dict(step_rate=0.20),
    "recip":       dict(approx_recip=True),
    "it1far":      dict(midpoint_iters=1, far_step_cap_rate=0.15),
    "it1farsr":    dict(midpoint_iters=1, far_step_cap_rate=0.15, step_rate=0.16),
    "it1farrecip": dict(midpoint_iters=1, far_step_cap_rate=0.15, approx_recip=True),
}
march_ms = {}
for name, kw in VARIANTS.items():
    try:
        sc = scene_with(**kw)

        @jax.jit
        def mfn(y0b, cfg=sc.march_cfg):
            r = march(y0b, bh, cfg)
            return jnp.sum(r.steps), jnp.sum(r.state)

        ms = timeit(lambda: jax.block_until_ready(mfn(y0b)[0]))
        march_ms[name] = ms
        print(f"B {name:12s} march {ms:7.1f} ms", flush=True)
    except Exception:
        print(f"B {name} FAILED\n{traceback.format_exc()}", flush=True)

print("== Part C: accuracy at 480x270 vs f64 truth ==", flush=True)
Wc, Hc = 480, 270
cam_c = Camera.create(r=30.0, theta=jnp.pi/2 - 0.25, fov=0.5, width=Wc, height=Hc)

def scene_c(dtype_cfg=None, **kw):
    return Scene.create(mass=1.0, spin=0.999, camera=cam_c,
                        march_cfg=MarchConfig(max_steps=256, use_pallas=ON_TPU, **kw))

truth_scene = Scene.create(
    mass=1.0, spin=0.999, camera=cam_c,
    march_cfg=MarchConfig(max_steps=1024, step_rate=0.04, midpoint_iters=3,
                          use_pallas=False))
truth = np.asarray(render_radiance(truth_scene, dtype=jnp.float64))
lum = truth.mean()
print(f"C truth mean radiance {lum:.4f}", flush=True)

for name, kw in VARIANTS.items():
    try:
        sc = scene_c(**kw)
        img_v = np.asarray(render_radiance(sc))
        d = np.abs(img_v - truth)
        print(f"C {name:12s} mean|d|/lum {d.mean()/lum:8.5f}  p99.9 {np.percentile(d, 99.9)/lum:8.4f}  max {d.max()/lum:8.3f}", flush=True)
    except Exception:
        print(f"C {name} FAILED\n{traceback.format_exc()}", flush=True)

print("DONE", flush=True)
