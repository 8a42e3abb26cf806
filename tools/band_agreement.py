"""Hit-classification agreement over the critical band (VERDICT r4 item 1).

The production march (step_rate 0.2) widens the chaotic capture/escape band
near the Bardeen critical curve: rays within a small conserved-space margin
of the curve can flip HORIZON <-> ESCAPE under step-size changes. This tool
measures, at the shipped resolution and spin:

  - hit classification of the production config, WITH and WITHOUT the
    critical-band refinement pass (MarchConfig.refine_band), vs
  - a fine reference march (step_rate 0.03, deep step budget — the same
    reference the r3/r4 convergence ladder pinned against),

reported as agreement fractions over the band and over the whole frame.
The r5 "done" gate: band agreement >= 0.99 at 1080p a = 0.999 with the
flagship throughput held (bench.py gate_band).

Usage: python tools/band_agreement.py [--width 1920] [--height 1080]
         [--spin 0.999] [--band 0.6] [--budget 65536] [--refine-rate 0.03]
         [--refine-steps 4096] [--fine-rate 0.03]
"""

from __future__ import annotations

import argparse
import dataclasses
import json


def measure(width=1920, height=1080, spin=0.999, band_width=0.6,
            budget=65536, refine_rate=0.03, refine_steps=4096,
            fine_rate=0.03, step_rate=0.2, max_steps=256, use_pallas=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
    from blackhole_simulation_tpu.render import Camera, MarchConfig
    from blackhole_simulation_tpu.render.camera import camera_rays_u
    from blackhole_simulation_tpu.render.march import (
        march_rows,
        refinement_config,
    )
    from blackhole_simulation_tpu.render.precull import critical_band_metric_u

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.25, fov=0.5,
                        width=width, height=height)
    bh = Kerr(mass=jnp.float32(1.0), spin=jnp.float32(spin), chart=KS)

    prod = MarchConfig(
        max_steps=max_steps, step_rate=step_rate, use_pallas=use_pallas,
        shadow_precull=True, far_step_cap_rate=0.4, far_boost_radius=20.0,
        approx_recip=use_pallas, midpoint_iters=1,
        refine_step_rate=refine_rate, refine_max_steps=refine_steps,
    )
    fine = dataclasses.replace(
        prod, step_rate=fine_rate, max_steps=4096, max_step=1.0,
        approx_recip=False, shadow_precull=False,
    )
    # EXACTLY the production refinement march (pipeline.refine_critical_band)
    refine = refinement_config(prod)

    @jax.jit
    def run():
        rays = camera_rays_u(cam, bh)
        bandm = critical_band_metric_u(bh.mass, bh.spin, rays)
        hit_prod = march_rows(rays, bh, prod).hit
        hit_fine = march_rows(rays, bh, fine).hit
        # refinement splice: re-march the band rays at the fine production
        # rate (exactly what render_sample's refine_critical_band does)
        n = bandm.shape[0]
        sel = jnp.nonzero(bandm < band_width, size=min(budget, n),
                          fill_value=n)[0]
        sel_c = jnp.minimum(sel, n - 1)
        rays_sel = camera_rays_u(cam, bh, pix_ids=sel_c)
        hit_ref = march_rows(rays_sel, bh, refine).hit
        hit_refined = hit_prod.at[sel].set(hit_ref, mode="drop")
        return bandm, hit_prod, hit_refined, hit_fine

    bandm, hit_prod, hit_refined, hit_fine = [np.asarray(x) for x in run()]
    in_band = bandm < band_width
    out = {
        "size": f"{width}x{height}",
        "spin": spin,
        "band_width": band_width,
        "band_px": int(in_band.sum()),
        "band_frac": round(float(in_band.mean()), 5),
        "budget": budget,
        "overflow": bool(in_band.sum() > budget),
        "agree_band_coarse": round(
            float((hit_prod == hit_fine)[in_band].mean()), 5),
        "agree_band_refined": round(
            float((hit_refined == hit_fine)[in_band].mean()), 5),
        "agree_all_coarse": round(float((hit_prod == hit_fine).mean()), 6),
        "agree_all_refined": round(
            float((hit_refined == hit_fine).mean()), 6),
        "refine_rate": refine_rate,
        "refine_steps": refine_steps,
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--spin", type=float, default=0.999)
    ap.add_argument("--band", type=float, default=0.6)
    ap.add_argument("--budget", type=int, default=65536)
    ap.add_argument("--refine-rate", type=float, default=0.03)
    ap.add_argument("--refine-steps", type=int, default=4096)
    ap.add_argument("--fine-rate", type=float, default=0.03)
    ap.add_argument("--step-rate", type=float, default=0.2)
    a = ap.parse_args()
    print(json.dumps(measure(
        a.width, a.height, a.spin, a.band, a.budget, a.refine_rate,
        a.refine_steps, a.fine_rate, a.step_rate,
    )))


if __name__ == "__main__":
    main()
