"""Roofline / VPU-utilization accounting for the march kernel (VERDICT r4
item 3: "is 133 Mrays/s fast?" answered against hardware peak, not only
against the self-set target).

Method
------
1. Static op count: trace ONE march step (ops/pallas_march.diff_step_values
   — the exact step DAG the kernel runs) to a jaxpr and count vector ALU
   primitives. Every op in the kernel body is a full (SUB, LANE)-row VPU
   instruction, so ops/step x rows-stepped = issued vector lane-ops.
2. Dynamic work: the Pallas march executes whole TILES until the per-tile
   early exit fires, in exit_check_every blocks — so the executed work is
   sum over tiles of ceil(max_ray_steps / block) * block * TILE lanes,
   measured from a staged march's per-ray step counts regrouped to tiles
   (to_block_order).
3. Peak: TPU v5e = 1 TensorCore, 4 MXUs, 197 bf16 TFLOP/s => clock ~1.5 GHz
   (197e12 / (4 * 128*128 MACs * 2)). VPU = (8 sublanes x 128 lanes) x
   4 ALUs = 4096 lane-ops/cycle ~ 6.1e12 vector ops/s (12.3 TFLOP/s if
   every op were an FMA pair). We report utilization against the 6.1e12
   op/s figure; FMA fusion by Mosaic moves true utilization between 1x and
   2x of the reported number. These derivations are stated because the VPU
   peak is not a published figure.

The "mfu" field in BENCH_r05.json is vpu_util_ops from this module.
"""

from __future__ import annotations

import json

# Primitive -> lane-op weight. Structural/layout ops cost 0; transcendentals
# are expanded by Mosaic into polynomial sequences — weights approximate
# their expansion cost on TPU (conservative: utilization is UNDER-counted
# if the real expansion is longer).
_WEIGHTS = {
    "add": 1, "sub": 1, "mul": 1, "div": 1, "max": 1, "min": 1, "neg": 1,
    "abs": 1, "sign": 1, "floor": 1, "and": 1, "or": 1, "not": 1, "xor": 1,
    "select_n": 1, "eq": 1, "ne": 1, "lt": 1, "le": 1, "gt": 1, "ge": 1,
    "sqrt": 4, "rsqrt": 4, "integer_pow": 1, "is_finite": 1,
    "exp": 8, "log": 8, "sin": 8, "cos": 8, "tanh": 8, "logistic": 8,
    "convert_element_type": 0, "broadcast_in_dim": 0, "reshape": 0,
    "squeeze": 0, "concatenate": 0, "slice": 0, "transpose": 0,
    "reduce_max": 1, "reduce_min": 1, "reduce_sum": 1, "reduce_or": 1,
    "stop_gradient": 0, "copy": 0, "iota": 0, "clamp": 2, "rem": 2,
    "custom_jvp_call": 0, "custom_vjp_call": 0, "pjit": 0, "jit": 0,
}


def _count_jaxpr(jaxpr, counts):
    for eqn in jaxpr.eqns:
        for sub in eqn.params.values():
            # recurse into closed subjaxprs (pjit, custom_jvp, scan bodies)
            if hasattr(sub, "jaxpr"):
                _count_jaxpr(sub.jaxpr, counts)
            elif isinstance(sub, (list, tuple)):
                for s in sub:
                    if hasattr(s, "jaxpr"):
                        _count_jaxpr(s.jaxpr, counts)
        name = eqn.primitive.name
        counts[name] = counts.get(name, 0) + 1
    return counts


def step_op_count(cfg=None, include_epilogue=True):
    """Vector ALU lane-ops issued per march step per ray (static count).

    Traces diff_step_values (the shared step DAG) plus, when
    ``include_epilogue``, the crossing-record/sanity/advance selects that
    the kernel body runs every step (march_tile's masked epilogue,
    approximated by its op census: ~40 select/compare ops).
    """
    import jax
    import jax.numpy as jnp

    from blackhole_simulation_tpu.ops.pallas_march import diff_step_values
    from blackhole_simulation_tpu.render.march import MarchConfig

    cfg = cfg or MarchConfig(
        step_rate=0.2, far_step_cap_rate=0.4, far_boost_radius=20.0,
        midpoint_iters=1,
    )
    z = jnp.zeros((8, 128), jnp.float32)
    rows = (z, z + 10.0, z + 0.1, z, z - 1.0, z, z + 1.0)

    def step(rows):
        return diff_step_values(
            jnp.float32(1.0), jnp.float32(0.9), jnp.float32(1.4),
            jnp.float32(2.3), cfg, False, rows,
        )

    jaxpr = jax.make_jaxpr(step)(rows)
    counts = _count_jaxpr(jaxpr.jaxpr, {})
    unknown = {k: v for k, v in counts.items() if k not in _WEIGHTS}
    ops = sum(_WEIGHTS.get(k, 1) * v for k, v in counts.items())
    if include_epilogue:
        # march_tile per-step epilogue outside diff_step_values: crossing
        # mask/scatter over K slots (~6 ops x 4 slots), sanity checks (~10),
        # advance selects (~8), hit/threshold tests (~6), jet off.
        ops += 48
    return ops, counts, unknown


def tile_work(width, height, steps, exit_every=8, sub=None, lane=128):
    """Executed tile-work: lane-steps actually issued by the kernel.

    ``steps``: per-ray step counts (row-major flat array, from a staged
    march at the same config). Rays regroup to the fused kernel's
    SUB x LANE screen tiles; each tile executes to its slowest ray, rounded
    up to the exit-check block.
    """
    import numpy as np

    from blackhole_simulation_tpu.ops.pallas_march import SUB as KSUB

    sub = sub or KSUB
    s = np.asarray(steps).reshape(height, width)
    hp = -(-height // sub) * sub
    wp = -(-width // lane) * lane
    s = np.pad(s, ((0, hp - height), (0, wp - width)), mode="edge")
    tiles = s.reshape(hp // sub, sub, wp // lane, lane).max(axis=(1, 3))
    blocks = np.ceil(tiles / exit_every) * exit_every
    return float(blocks.sum() * sub * lane), tiles


# v5e peak derivation (see module docstring)
V5E_CLOCK_HZ = 1.5e9
V5E_VPU_LANE_OPS_PER_CYCLE = 8 * 128 * 4
V5E_VPU_PEAK_OPS = V5E_CLOCK_HZ * V5E_VPU_LANE_OPS_PER_CYCLE  # 6.1e12

# EMPIRICAL ceiling (tools/vpu_peak.py, r5): a synthetic pure-FMA Pallas
# kernel plateaus at ~2.15e12 lane-FMA/s on this chip across ILP widths
# (8-32 chains x 4-32 unroll) — the derived 6.1e12 figure is NOT
# achievable even by straight-line FMAs, so utilization is reported
# against both. The march's 2.6e12 COUNTED lane-ops/s (mul and add
# weighted separately) against a 2.15e12 issued-FMA roof means the kernel
# is at/near the real machine ceiling once any mul+add fusion is
# accounted for.
V5E_VPU_MEASURED_FMA_PER_S = 2.15e12


def mfu_report(width, height, steps, frame_seconds, cfg=None):
    """Assemble the roofline dict for the bench JSON."""
    ops_per_step, counts, unknown = step_op_count(cfg)
    work, tiles = tile_work(width, height, steps,
                            exit_every=(cfg.exit_check_every if cfg else 8))
    issued = ops_per_step * work
    achieved = issued / frame_seconds
    return {
        "ops_per_step_per_ray": ops_per_step,
        "tile_lane_steps": work,
        "achieved_vector_ops_per_s": round(achieved / 1e12, 3),
        "vpu_peak_ops_per_s_assumed": round(V5E_VPU_PEAK_OPS / 1e12, 3),
        "vpu_util": round(achieved / V5E_VPU_PEAK_OPS, 4),
        "vpu_measured_fma_per_s": round(V5E_VPU_MEASURED_FMA_PER_S / 1e12, 3),
        "util_vs_measured_roof": round(
            achieved / (2.0 * V5E_VPU_MEASURED_FMA_PER_S), 4
        ),
        "note": "vpu_util is vs the derived 6.1e12 lane-ops/s;"
                " util_vs_measured_roof treats every counted mul+add pair"
                " as fuseable against the EMPIRICAL 2.15e12 FMA/s ceiling"
                " (tools/vpu_peak.py) — the true figure lies between the"
                " two, i.e. the march is at 0.4-1.2x of what a pure-FMA"
                " kernel can sustain on this chip",
        "unknown_prims": unknown or None,
    }


if __name__ == "__main__":
    ops, counts, unknown = step_op_count()
    print("ops/step/ray:", ops)
    print("counts:", json.dumps(counts, indent=1, sort_keys=True))
    if unknown:
        print("UNKNOWN (weighted 1):", unknown)
