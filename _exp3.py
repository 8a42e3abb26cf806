"""Round 2b: camera fix + march variants + frame decomposition on TPU."""
import time
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/bh_tpu_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from blackhole_simulation_tpu.render import Camera, MarchConfig, Scene, render
from blackhole_simulation_tpu.render.pipeline import render_radiance
from blackhole_simulation_tpu.render.camera import camera_rays
from blackhole_simulation_tpu.render.march import march
from blackhole_simulation_tpu.ops.pallas_march import to_block_order

W, H = 1920, 1080
ON_TPU = jax.default_backend() == "tpu"

def timeit(fn, n=5):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3

def scene_with(**kw):
    cam = Camera.create(r=30.0, theta=jnp.pi/2 - 0.25, fov=0.5, width=W, height=H)
    return Scene.create(mass=1.0, spin=0.999, camera=cam,
                        march_cfg=MarchConfig(max_steps=256, use_pallas=ON_TPU, **kw))

scene0 = scene_with()
bh = scene0.bh

rays_fn = jax.jit(lambda: camera_rays(scene0.camera, bh, dtype=jnp.float32))
t = timeit(lambda: jax.block_until_ready(rays_fn()))
print(f"camera_rays (f32 fix)    {t:7.1f} ms", flush=True)

t = timeit(lambda: float(jnp.sum(render(scene0, n_samples=1))))
print(f"full render base         {t:7.1f} ms  ({W*H/t/1e3:.1f} Mrays/s)", flush=True)

y0b = to_block_order(rays_fn(), H, W)
for name, kw in {
    "base": {},
    "it1farsr": dict(midpoint_iters=1, far_step_cap_rate=0.15, step_rate=0.16),
    "it1farsr+recip": dict(midpoint_iters=1, far_step_cap_rate=0.15,
                           step_rate=0.16, approx_recip=True),
}.items():
    sc = scene_with(**kw)

    @jax.jit
    def mfn(y0b, cfg=sc.march_cfg):
        r = march(y0b, bh, cfg)
        return jnp.sum(r.steps), jnp.sum(r.state), jnp.sum(r.hit)

    t = timeit(lambda: jax.block_until_ready(mfn(y0b)[0]))
    s, _, hsum = mfn(y0b)
    print(f"march {name:16s} {t:7.1f} ms  (mean steps {float(s)/(W*H):.1f})", flush=True)
    tf = timeit(lambda: float(jnp.sum(render(sc, n_samples=1))))
    print(f"  full render {name:12s} {tf:7.1f} ms  ({W*H/tf/1e3:.1f} Mrays/s)", flush=True)
print("DONE", flush=True)
