"""Scaling harness: rays/s and parallel efficiency across mesh sizes.

BASELINE's scaling gate is ">= 95% linear rays/s scaling to >= 2 hosts".
Real multi-chip hardware is not available in this environment (one TPU
chip over a tunnel), so this harness measures what CAN be measured and
records it honestly:

 - on the real TPU: single-chip flagship rays/s (the 1-chip anchor);
 - on a virtual CPU mesh (xla_force_host_platform_device_count): the
   *sharding overhead efficiency* t(1 dev) / t(n dev) of the SPMD render
   and inverse-step programs. On one host every virtual device shares the
   same cores, so total work is constant and any efficiency below 1.0 is
   partition/padding/collective overhead added by the sharded program —
   the controllable part of the scaling gate. ICI bandwidth effects need
   real chips.

Writes SCALING_rNN.json (one JSON object) and prints it.

Usage:
  python tools/bench_scaling.py [--out SCALING.json] [--width W] [--height H]
  # virtual mesh run (the default when not on TPU):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/bench_scaling.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stats(fn, repeats=12):
    """(median, iqr) over ``repeats`` timed calls after 2 warm calls.

    Medians + IQR error bars (VERDICT r4 item 5): a single best-of-5 on a
    shared CPU host produced unphysical efficiencies (1.97 on fixed work);
    the median is robust to scheduler noise and the IQR quantifies what
    remains so the gate can REJECT noise-dominated points instead of
    reporting them as wins.
    """
    for _ in range(3):
        fn()  # warm: compile + allocator steady state
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    times.sort()
    n = len(times)
    med = times[n // 2]
    iqr = times[(3 * n) // 4] - times[n // 4]
    return med, iqr


def _two_process_multihost_check():
    """Exercise initialize_multihost via jax.distributed with TWO local CPU
    processes (VERDICT r4 item 5: the DCN init path had never executed).
    Each process brings up the distributed runtime, builds the global CPU
    device view, and all-reduces a process-tagged scalar over DCN; the
    parent asserts the psum saw both processes. Returns a result dict."""
    import subprocess
    import sys as _sys

    worker = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
# Load parallel/mesh.py DIRECTLY (importlib): the package __init__ builds
# module-level jnp constants, which initializes the XLA backend — and
# jax.distributed.initialize must run before that.
import importlib.util
_spec = importlib.util.spec_from_file_location(
    "bh_mesh", os.path.join("blackhole_simulation_tpu", "parallel", "mesh.py"))
_mesh = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mesh)
initialize_multihost = _mesh.initialize_multihost
pid = int(sys.argv[1])
initialize_multihost("127.0.0.1:17923", num_processes=2, process_id=pid)
import jax.numpy as jnp
assert jax.process_count() == 2, jax.process_count()
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map
devs = jax.devices()  # global view across both processes
mesh = Mesh(devs, ("d",))
def body():
    return jax.lax.psum(jnp.float32(2.0 ** jax.process_index()), "d")
out = shard_map(lambda: body(), mesh=mesh, in_specs=(), out_specs=P(),
                check_vma=False)()
# each process owns 1 local device: psum(2^0 + 2^1) = 3
val = float(out.addressable_data(0).reshape(-1)[0])
print(f"proc {pid}: psum={val} procs={jax.process_count()}", flush=True)
assert val == 3.0, val
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    procs = [
        subprocess.Popen([_sys.executable, "-c", worker, str(pid)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
        for pid in (0, 1)
    ]
    outs = []
    ok = True
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            p.kill()
            out = b"TIMEOUT"
        outs.append(out.decode(errors="replace")[-500:])
        ok = ok and p.returncode == 0
    return {"ok": ok, "psum_expected": 3.0,
            "log": [o.strip().splitlines()[-1] if o.strip() else "" for o in outs]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--height", type=int, default=108)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=12)
    ap.add_argument("--no-multihost", action="store_true")
    args = ap.parse_args()

    import jax

    # Site customization pins jax_platforms to the sandbox TPU tunnel even
    # when JAX_PLATFORMS is set; honor the env var explicitly (the same
    # dance as tests/conftest.py).
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jit_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
    import jax.numpy as jnp

    from blackhole_simulation_tpu.parallel import (
        InverseParams,
        make_inverse_step,
        make_mesh,
        render_sharded,
    )
    from blackhole_simulation_tpu.render import Camera, MarchConfig, Scene

    platform = jax.default_backend()
    n_devices = jax.device_count()
    w, h = args.width, args.height
    n_pix = w * h

    cam = Camera.create(r=30.0, theta=jnp.pi / 2 - 0.25, fov=0.5, width=w, height=h)
    scene = Scene.create(
        mass=1.0, spin=0.999, camera=cam, march_cfg=MarchConfig(max_steps=args.steps)
    )

    sizes = [n for n in (1, 2, 4, 8) if n <= n_devices]
    render_times = {}
    inverse_times = {}
    for n in sizes:
        mesh = make_mesh(n)

        def frame(mesh=mesh):
            img = render_sharded(scene, mesh)
            return float(jnp.sum(img))

        render_times[n] = _stats(frame, args.repeats)

        step = make_inverse_step(scene, mesh if n > 1 else None)
        params = InverseParams.init(theta_cam=float(cam.theta))
        target = jnp.zeros((h, w, 3), jnp.float32)

        def inv_step(step=step, params=params, target=target):
            (_, _), loss = step(params, target)
            return float(loss)

        inverse_times[n] = _stats(inv_step, args.repeats)

    def table(times):
        t1, i1 = times[sizes[0]]
        out = {}
        for n in sizes:
            tn, iqr = times[n]
            eff = t1 / tn
            # combined relative noise of the ratio (IQR-based)
            rel = (iqr / tn) + (i1 / t1)
            if rel > 0.10:
                verdict = "inconclusive (noise)"
            elif eff < 0.95:
                verdict = "overhead"
            elif eff <= 1.05:
                verdict = "pass"
            else:
                # eff > 1.05 with tight bars is NOT super-linear scaling:
                # total work is fixed, so it means the 1-device baseline
                # under-uses the host's cores (XLA CPU thread-limits a
                # single-device program) while the sharded program gets a
                # thread per virtual device. Sharding overhead is still
                # bounded above by zero here — report the mechanism, do
                # not report a win.
                verdict = "pass (no overhead; 1-dev baseline thread-limited)"
            out[str(n)] = {
                "median_s": round(tn, 4),
                "iqr_s": round(iqr, 4),
                "overhead_efficiency": round(eff, 4),
                "rel_noise": round(rel, 4),
                "verdict": verdict,
            }
        return out

    report = {
        "platform": platform,
        "device_kind": str(jax.devices()[0].device_kind),
        "n_devices": n_devices,
        "frame": f"{w}x{h}x{args.steps}steps",
        "repeats": args.repeats,
        "render": table(render_times),
        "inverse_step": table(inverse_times),
        "note": (
            "virtual-mesh overhead efficiency: t(1 dev)/t(n dev) medians on "
            "one host (same total work; <1.0 = sharding overhead; >1.05 with "
            "tight bars = measurement failure, rejected). Real ICI scaling "
            "needs multi-chip hardware."
        ),
    }
    report["render"]["1"]["mrays_per_s"] = round(
        n_pix / render_times[sizes[0]][0] / 1e6, 3
    )
    if not args.no_multihost and platform == "cpu":
        # DCN bring-up path: jax.distributed over two local processes
        report["multihost_init"] = _two_process_multihost_check()
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
