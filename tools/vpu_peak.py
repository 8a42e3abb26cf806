"""Empirical VPU peak: a synthetic pure-FMA Pallas kernel.

The roofline (tools/roofline.py) divides by a DERIVED v5e VPU peak
(4096 lane-ops/cycle @ 1.5 GHz) with a 2x FMA-fusion uncertainty. This
kernel measures the achievable ceiling directly: 8 independent (8, 128)
f32 chains of fused multiply-adds per loop iteration — enough ILP to be
throughput-bound — timed with the bench.py protocol. The measured
lane-FMA/s (x2 FLOP/s) is the honest denominator for "fraction of peak".

Usage: python tools/vpu_peak.py [--iters 4096] [--grid 64] [--chains 8]
"""

from __future__ import annotations

import argparse
import functools
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4096)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--chains", type=int, default=8)
    ap.add_argument("--unroll", type=int, default=8)
    ap.add_argument("--reps", type=int, default=30)
    a = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jit_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, T, G, U = a.chains, a.iters, a.grid, a.unroll
    SUB, LANE = 8, 128

    def kernel(x_ref, o_ref):
        xs = [x_ref[0, c] for c in range(C)]
        k = jnp.float32(1.0000001)
        b = jnp.float32(1e-7)

        def body(i, xs):
            # C independent chains x U serial FMAs each per iteration:
            # C-way ILP hides latency, U amortizes the loop back-edge
            for _ in range(U):
                xs = tuple(x * k + b for x in xs)
            return xs

        xs = jax.lax.fori_loop(0, T, body, tuple(xs))
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[0] = acc

    x = jnp.ones((G, C, SUB, LANE), jnp.float32)
    spec_in = pl.BlockSpec((1, C, SUB, LANE), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    run = jax.jit(functools.partial(
        pl.pallas_call,
        grid=(G,),
        in_specs=[spec_in],
        out_specs=spec_out,
        out_shape=jax.ShapeDtypeStruct((G, SUB, LANE), jnp.float32),
    )(kernel))

    red = jax.jit(lambda xs: jnp.stack(xs).sum())
    fn = lambda: jnp.sum(run(x))
    float(red([fn() for _ in range(a.reps)]))  # warm with the timed shape
    t0 = time.perf_counter()
    float(red([fn() for _ in range(a.reps)]))
    per = (time.perf_counter() - t0) / a.reps
    fmas = G * C * T * U * SUB * LANE
    out = {
        "grid": G, "chains": C, "iters": T, "unroll": U,
        "seconds_per_call": round(per, 6),
        "lane_fma_per_s": round(fmas / per / 1e12, 3),
        "flop_per_s": round(2 * fmas / per / 1e12, 3),
        "unit": "T/s",
        "derived_peak_lane_ops": 6.144,
        "note": "lane_fma_per_s is the measured ceiling for the roofline's "
                "ops/s numerator (1 FMA = 1 fused lane-op = 2 FLOPs)",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
