"""Diagnose jnp vs pallas(interpret) march divergence step-by-step."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_enable_x64", True)

from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
from blackhole_simulation_tpu.render.camera import Camera, camera_rays
from blackhole_simulation_tpu.render.march import march, MarchConfig
import dataclasses

bh = Kerr(mass=jnp.asarray(1.0, jnp.float32), spin=jnp.asarray(0.0, jnp.float32), chart=KS)
cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.25, fov=0.5, width=48, height=32)
rays = camera_rays(cam, bh)

lo, hi = 1, 256
first_bad = None
for ms in [1, 2, 4, 8, 16, 17, 32, 64, 128, 256]:
    cfg = MarchConfig(max_steps=ms)
    rj = march(rays, bh, cfg)
    rp = march(rays, bh, dataclasses.replace(cfg, use_pallas=True))
    sj, sp = np.asarray(rj.state), np.asarray(rp.state)
    diff = np.abs(sj - sp)
    nbad = int((diff > 1e-6).sum())
    print(f"ms={ms:4d} nbad={nbad:5d} maxdiff={diff.max():.3e}", flush=True)
    if nbad and first_bad is None:
        first_bad = ms
        # which rays/rows
        idx = np.argwhere(diff > 1e-6)
        rows = sorted(set(idx[:, 1].tolist()))
        raysbad = sorted(set(idx[:, 0].tolist()))
        print("  bad rows:", rows, " n rays:", len(raysbad), " sample rays:", raysbad[:5])
        i = raysbad[0]
        print("  jnp:", sj[i], "\n  plp:", sp[i])
        break
