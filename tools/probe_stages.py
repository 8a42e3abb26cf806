"""Per-stage timing breakdown of the flagship 1080p frame.

Times each pipeline stage as its own jitted scalar-returning program with
the batched single-fetch protocol (tunnel-latency-proof). Stage inputs are
device-resident outputs of the previous stage, so each measurement is the
stage alone.

Usage: python tools/probe_stages.py [--frames 20]
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
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--skip-march", action="store_true")
    args = ap.parse_args()

    from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
    from blackhole_simulation_tpu.ops.ks_kernel import (
        ks_renormalize_u,
        theta_state_to_u,
        u_state_to_theta,
    )
    from blackhole_simulation_tpu.ops.pallas_march import (
        from_block_order,
        pallas_march_u,
        to_block_order,
    )
    from blackhole_simulation_tpu.render import Camera, MarchConfig, Scene
    from blackhole_simulation_tpu.render.camera import camera_rays_indexed
    from blackhole_simulation_tpu.render.march import HIT_ESCAPE, MarchResult
    from blackhole_simulation_tpu.render.pipeline import shade_sample_rows
    from blackhole_simulation_tpu.render.post import tonemap
    from blackhole_simulation_tpu.render.precull import capture_mask
    from blackhole_simulation_tpu.render.shading import (
        escape_direction_rows,
        shade_disk_crossings,
        starfield_rows,
    )
    import dataclasses as dc

    w, h = args.width, args.height
    cfg = MarchConfig(
        max_steps=256, use_pallas=True, shadow_precull=True,
        far_step_cap_rate=0.4, far_boost_radius=20.0, approx_recip=True,
        midpoint_iters=1,
    )
    cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.25, fov=0.5, width=w, height=h)
    scene = Scene.create(mass=1.0, spin=0.999, camera=cam, march_cfg=cfg)
    bh = Kerr(mass=jnp.float32(1.0), spin=jnp.float32(0.999), chart=KS)
    r_h = bh.event_horizon().astype(jnp.float32)
    r_ph = bh.photon_sphere().astype(jnp.float32)
    dt = jnp.float32

    K = args.frames
    reduce_k = jax.jit(lambda xs: jnp.stack(xs).sum())
    float(reduce_k([jnp.float32(0.0)] * K))  # compile the reducer

    def timed(scalar_fn, label):
        float(scalar_fn())  # compile
        float(reduce_k([scalar_fn() for _ in range(K)]))  # warm queue path
        t0 = time.perf_counter()
        float(reduce_k([scalar_fn() for _ in range(K)]))
        ms = (time.perf_counter() - t0) / K * 1e3
        print(f"{label:46s} {ms:7.2f} ms", flush=True)

    ids = to_block_order(jnp.arange(h * w, dtype=jnp.int32), h, w)

    @jax.jit
    def gen_rays():
        return camera_rays_indexed(cam, bh, ids, jitter=None, dtype=dt)

    rays_b = jax.block_until_ready(gen_rays())
    timed(jax.jit(lambda: jnp.sum(gen_rays()[:, 1])), "camera_rays_indexed (block order)")

    @jax.jit
    def prep():
        dead = capture_mask(bh.mass.astype(dt), bh.spin.astype(dt), rays_b)
        stop_r = jnp.maximum(jnp.maximum(bh.isco().astype(dt), cfg.record_r_min),
                             cfg.horizon_factor * r_h)
        thr = jnp.where(dead, stop_r, cfg.horizon_factor * r_h)
        yt0 = ks_renormalize_u(bh.mass.astype(dt), bh.spin.astype(dt),
                               theta_state_to_u(rays_b.T))
        return yt0, thr

    yt0, thr = jax.block_until_ready(prep())
    timed(jax.jit(lambda: jnp.sum(prep()[0][1])), "precull + renormalize + u-transform")

    @jax.jit
    def kern():
        return pallas_march_u(yt0, thr, bh.mass.astype(dt), bh.spin.astype(dt),
                              r_h, r_ph, cfg)

    outs = jax.block_until_ready(kern())
    if not args.skip_march:
        timed(jax.jit(lambda: jnp.sum(kern()[0][1])), "pallas kernel march")

    yt_d, hit_d, steps_d, cr_d, cp_d, ct_d, nc_d, rmin_d = outs

    @jax.jit
    def build_result():
        return MarchResult(
            state=u_state_to_theta(yt_d).T, hit=hit_d, steps=steps_d,
            cross_r=cr_d.T, cross_phi=cp_d.T, cross_t=ct_d.T, n_crossings=nc_d,
            jet_radiance=jnp.zeros((hit_d.shape[0], 3), dt), r_min_ph=rmin_d,
        )

    result = jax.block_until_ready(build_result())

    @jax.jit
    def shade():
        rgb = shade_sample_rows(result, bh, scene, dt, rays_b)
        return jnp.stack(rgb, axis=-1)

    timed(jax.jit(lambda: jnp.sum(shade())), "shade_sample_rows (disk+stars+glow)")

    timed(
        jax.jit(lambda: sum(jnp.sum(c) for c in shade_disk_crossings(
            result, bh, scene.disk, rays_b, dt, 1.0, 1.0, spectral=False)[0])),
        "  shade_disk_crossings",
    )

    @jax.jit
    def stars_only():
        escaped = result.hit == HIT_ESCAPE
        dummy = (0.0, 100.0, 1.5707964, 0.0, -1.0, -1.0, 0.0, 0.0)
        st = result.state.T
        rows = tuple(jnp.where(escaped, st[i], jnp.asarray(dummy[i], dt))
                     for i in range(8))
        bg = starfield_rows(*escape_direction_rows(rows, bh), params=scene.stars)
        return sum(jnp.sum(b) for b in bg)

    timed(stars_only, "  starfield")

    rgb_b = jax.block_until_ready(shade())

    @jax.jit
    def reorder():
        return jnp.stack(
            [from_block_order(rgb_b[:, i], h, w) for i in range(3)], axis=-1
        )

    img_flat = jax.block_until_ready(reorder())
    timed(jax.jit(lambda: jnp.sum(reorder())), "from_block_order x3 rows")

    timed(
        jax.jit(lambda: jnp.sum(tonemap(img_flat.reshape(h, w, 3), scene.post))),
        "tonemap (bloom 2-pass + ACES + gamma)",
    )
    timed(
        jax.jit(lambda: jnp.sum(tonemap(
            img_flat.reshape(h, w, 3), dc.replace(scene.post, bloom_enabled=False)))),
        "  tonemap without bloom",
    )


if __name__ == "__main__":
    main()
