"""Bisect camera_rays cost on TPU."""
import time
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/bh_tpu_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from blackhole_simulation_tpu.render import Camera, Scene
from blackhole_simulation_tpu.render.camera import (
    camera_rays, pixel_grid, zamo_tetrad, bl_to_ks_momentum,
)
from blackhole_simulation_tpu.geometry.metrics import kerr_cov_bl

W, H = 1920, 1080

def timeit(fn, n=5):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3

cam = Camera.create(r=30.0, theta=jnp.pi/2 - 0.25, fov=0.5, width=W, height=H)
scene = Scene.create(mass=1.0, spin=0.999, camera=cam)
bh = scene.bh

f = jax.jit(lambda: camera_rays(cam, bh, dtype=jnp.float32))
print(f"camera_rays (N,8)        {timeit(lambda: jax.block_until_ready(f())):7.1f} ms", flush=True)

def rays_t(camera, bh, dtype=jnp.float32):
    nx, ny = pixel_grid(camera.width, camera.height, None, dtype)
    nx, ny = nx.reshape(-1), ny.reshape(-1)
    m, a = bh.mass, bh.spin
    r0, th0, ph0 = camera.r, camera.theta, camera.phi
    aspect = jnp.asarray(camera.width / camera.height, dtype)
    half = jnp.tan(camera.fov / 2.0).astype(dtype)
    cx = nx * (half * aspect)
    cy = ny * half
    inv_norm = jnp.asarray(1.0, dtype) / jnp.sqrt(1.0 + cx * cx + cy * cy)
    n_r = -inv_norm
    n_th = -cy * inv_norm
    n_ph = -cx * inv_norm
    u, e_r, e_th, e_ph = zamo_tetrad(m, a, r0, th0)
    g_bl = kerr_cov_bl(m, a, r0, th0)
    coeffs = [g_bl @ v for v in (u, e_r, e_th, e_ph)]
    coeffs = [bl_to_ks_momentum(m, a, r0, c).astype(dtype) for c in coeffs]
    c0, c_r, c_th, c_ph = coeffs
    p = [c0[j] + n_r * c_r[j] + n_th * c_th[j] + n_ph * c_ph[j] for j in range(4)]
    zero = jnp.zeros_like(nx)
    return jnp.stack([
        zero,
        jnp.full_like(nx, r0.astype(dtype)),
        jnp.full_like(nx, th0.astype(dtype)),
        jnp.full_like(nx, ph0.astype(dtype)),
        p[0], p[1], p[2], p[3],
    ], axis=0)

g = jax.jit(lambda: rays_t(cam, bh, jnp.float32))
print(f"camera_rays_t (8,N)      {timeit(lambda: jax.block_until_ready(g())):7.1f} ms", flush=True)

# just the p math, summed (no layout materialization)
def rays_sum(camera, bh, dtype=jnp.float32):
    y = rays_t(camera, bh, dtype)
    return jnp.sum(y)
h2 = jax.jit(lambda: rays_sum(cam, bh, jnp.float32))
print(f"rays math + sum          {timeit(lambda: float(h2())):7.1f} ms", flush=True)

# (N, 8) via transpose of (8, N)
t8 = jax.jit(lambda: rays_t(cam, bh, jnp.float32).T)
print(f"rays_t then .T (N,8)     {timeit(lambda: jax.block_until_ready(t8())):7.1f} ms", flush=True)
print("DONE", flush=True)
