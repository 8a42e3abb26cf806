"""Backward-kernel tuning sweep (VERDICT r4 item 8): SUB x CKPT for
ops/pallas_grad.py at the bench backward protocol (1080p inverse step).

The forward kernel's SUB=32 finding does not transfer automatically — the
grad kernel's per-step VJP chains are longer and its VMEM footprint is
CKPT-dependent — so each (SUB, CKPT) runs in a FRESH process (the overrides
are import-time constants) and reports ms/step + fwd+bwd Mrays/s.

Usage: python tools/sweep_grad.py [--width 1920] [--height 1080]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_WORKER = r"""
import json, os, sys, time
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jit_cache") if False
                  else "/root/repo/.jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import dataclasses as dc
import jax.numpy as jnp
from blackhole_simulation_tpu.render import Camera, MarchConfig, Scene
from blackhole_simulation_tpu.render.pipeline import Features
from blackhole_simulation_tpu.parallel import InverseParams, make_inverse_step

w, h = int(sys.argv[1]), int(sys.argv[2])
on_tpu = jax.default_backend() == "tpu"
cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.25, fov=0.5, width=w, height=h)
cfg = MarchConfig(
    max_steps=256, use_pallas=on_tpu, fused=False, shadow_precull=True,
    step_rate=0.2, far_step_cap_rate=0.4, far_boost_radius=20.0,
    approx_recip=True, midpoint_iters=1,
    remat_every=0 if on_tpu else 1,
)
scene = Scene.create(mass=1.0, spin=0.999, camera=cam, march_cfg=cfg,
                     features=Features(spectral_lut=False))
step = make_inverse_step(scene, None)
params = InverseParams.init(spin=0.9, theta_cam=float(cam.theta))
target = jnp.zeros((h, w, 3), jnp.float32)
t0 = time.perf_counter()
_, loss = step(params, target)
loss = float(loss)
compile_s = time.perf_counter() - t0
n = 6
red = jax.jit(lambda xs: jnp.stack(xs).sum())
float(red([step(params, target)[1] for _ in range(n)]))
t0 = time.perf_counter()
float(red([step(params, target)[1] for _ in range(n)]))
per = (time.perf_counter() - t0) / n
print(json.dumps({
    "sub": os.environ.get("BH_PALLAS_SUB", "32"),
    "ckpt": os.environ.get("BH_PALLAS_CKPT", "32"),
    "compile_s": round(compile_s, 1),
    "ms_per_step": round(per * 1e3, 2),
    "mrays": round(w * h / per / 1e6, 2),
    "loss": loss,
}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--subs", default="16,32,64")
    ap.add_argument("--ckpts", default="16,32,64")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = []
    for sub in args.subs.split(","):
        for ckpt in args.ckpts.split(","):
            env = dict(os.environ, BH_PALLAS_SUB=sub, BH_PALLAS_CKPT=ckpt)
            p = subprocess.run(
                [sys.executable, "-c", _WORKER, str(args.width),
                 str(args.height)],
                env=env, cwd=root, capture_output=True, text=True,
                timeout=900,
            )
            line = (p.stdout.strip().splitlines() or ["{}"])[-1]
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                rec = {"sub": sub, "ckpt": ckpt, "error":
                       (p.stderr or p.stdout)[-300:]}
            print(json.dumps(rec), flush=True)
            results.append(rec)
    ok = [r for r in results if "mrays" in r]
    if ok:
        best = max(ok, key=lambda r: r["mrays"])
        print("BEST:", json.dumps(best))


if __name__ == "__main__":
    main()
