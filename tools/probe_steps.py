"""Step-count telemetry for the flagship frame (VERDICT r3 item 1).

Prints the per-ray step histogram, per-tile max-step stats (the Pallas
kernel's cost driver: a tile marches until its LAST ray terminates, rounded
up to exit_check_every), and batched-protocol timings of march vs full
render (one host fetch per K frames so the ~25 ms tunnel round trip never
lands in the timed region).

Usage: python tools/probe_steps.py [--steps 256] [--frames 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--sub", type=int, default=None)
    ap.add_argument("--step-rate", type=float, default=0.12)
    ap.add_argument("--exit-every", type=int, default=8)
    args = ap.parse_args()
    if args.sub is not None:
        os.environ["BH_PALLAS_SUB"] = str(args.sub)

    from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
    from blackhole_simulation_tpu.ops.ks_kernel import (
        ks_renormalize_u,
        theta_state_to_u,
    )
    from blackhole_simulation_tpu.ops.pallas_march import (
        SUB,
        TILE,
        pallas_march_u,
        to_block_order,
    )
    from blackhole_simulation_tpu.render import Camera, MarchConfig, Scene, render
    from blackhole_simulation_tpu.render.camera import camera_rays
    from blackhole_simulation_tpu.render.precull import capture_mask

    w, h = args.width, args.height
    cfg = MarchConfig(
        max_steps=args.steps,
        use_pallas=True,
        shadow_precull=True,
        far_step_cap_rate=0.4,
        far_boost_radius=20.0,
        approx_recip=True,
        midpoint_iters=1,
        step_rate=args.step_rate,
        exit_check_every=args.exit_every,
    )
    cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.25, fov=0.5, width=w, height=h)
    scene = Scene.create(mass=1.0, spin=0.999, camera=cam, march_cfg=cfg)
    bh = Kerr(mass=jnp.float32(1.0), spin=jnp.float32(0.999), chart=KS)
    r_h = bh.event_horizon().astype(jnp.float32)
    r_ph = bh.photon_sphere().astype(jnp.float32)

    rays = camera_rays(cam, bh, dtype=jnp.float32)
    rays_b = to_block_order(rays, h, w)
    dead = capture_mask(bh.mass.astype(jnp.float32), bh.spin.astype(jnp.float32), rays_b)
    stop_r = jnp.maximum(jnp.maximum(bh.isco().astype(jnp.float32), cfg.record_r_min),
                         cfg.horizon_factor * r_h)
    thr = jnp.where(dead, stop_r, cfg.horizon_factor * r_h)
    yt0 = ks_renormalize_u(bh.mass.astype(jnp.float32), bh.spin.astype(jnp.float32),
                           theta_state_to_u(rays_b.T))
    yt0 = jax.block_until_ready(yt0)

    @jax.jit
    def march_sum():
        outs = pallas_march_u(yt0, thr, bh.mass.astype(jnp.float32),
                              bh.spin.astype(jnp.float32), r_h, r_ph, cfg)
        return jnp.sum(outs[0][1])  # sum of final r

    outs = pallas_march_u(yt0, thr, bh.mass.astype(jnp.float32),
                          bh.spin.astype(jnp.float32), r_h, r_ph, cfg)
    steps = np.asarray(outs[2])
    hit = np.asarray(outs[1])
    n = steps.shape[0]
    ee = cfg.exit_check_every
    # Per-tile cost: ceil(max_steps_in_tile / exit_every) * exit_every
    n_tiles = n // TILE
    tile_max = steps[: n_tiles * TILE].reshape(n_tiles, TILE).max(axis=1)
    tile_cost = np.ceil(np.maximum(tile_max, 1) / ee) * ee
    print(f"rays={n} tiles={n_tiles} SUB={SUB} TILE={TILE} exit_every={ee}")
    print(f"per-ray steps: mean={steps.mean():.1f} p50={np.percentile(steps,50):.0f} "
          f"p90={np.percentile(steps,90):.0f} p99={np.percentile(steps,99):.0f} "
          f"max={steps.max()}")
    print(f"hit: horizon={np.mean(hit==1):.3f} escape={np.mean(hit==2):.3f}")
    hist, edges = np.histogram(steps, bins=[0, 8, 16, 32, 64, 96, 128, 192, 255, 257])
    print("step hist:", {f"{edges[i]}-{edges[i+1]}": int(hist[i]) for i in range(len(hist))})
    print(f"per-tile max: mean={tile_max.mean():.1f} p50={np.percentile(tile_max,50):.0f} "
          f"p90={np.percentile(tile_max,90):.0f} max={tile_max.max()}")
    print(f"tile-work (sum tile_cost*TILE) = {tile_cost.sum()*TILE/1e6:.0f} Msteps; "
          f"ideal (sum steps) = {steps.sum()/1e6:.0f} Msteps; "
          f"waste = {tile_cost.sum()*TILE/max(steps.sum(),1):.2f}x")
    thist, _ = np.histogram(tile_max, bins=[0, 8, 16, 32, 64, 96, 128, 192, 255, 257])
    print("tile-max hist:", {f"{edges[i]}-{edges[i+1]}": int(thist[i]) for i in range(len(thist))})

    # Batched timing protocol: queue K, one fetch.
    K = args.frames
    reduce_k = jax.jit(lambda xs: jnp.stack(xs).sum())

    def timed(fn, label):
        float(reduce_k([fn() for _ in range(K)]))  # warm
        t0 = time.perf_counter()
        float(reduce_k([fn() for _ in range(K)]))
        dt = (time.perf_counter() - t0) / K
        print(f"{label}: {dt*1e3:.2f} ms/frame -> {w*h/dt/1e6:.1f} Mrays/s")
        return dt

    timed(march_sum, "march only (kernel+precull inputs prebuilt)")
    timed(lambda: jnp.sum(render(scene, n_samples=1)), "full render")


if __name__ == "__main__":
    main()
