"""The fast batched ray march: fixed-bound masked loop in the KS chart.

This is the TPU re-design of the reference's per-pixel GPU marchers
(src/shaders/blackhole/fragment.glsl.ts:129-221 Velocity-Verlet march with
curvature-adaptive dt; src/shaders/compute.wgsl.ts:189-258 symplectic
Hamiltonian KS march with disk-crossing detection):

 - all rays advance together in ONE ``lax.fori_loop`` with per-ray active
   masks — the reference exits (horizon / escape) freeze rays in place,
 - the integrator is the sparse implicit-midpoint step on the exact
   Kerr-Schild Hamiltonian in (t, r, u=cos(theta), phi) coordinates
   (ops/ks_kernel.ks_rhs_u): the RHS is purely *rational* — zero sin/cos in
   the hot loop — and the polar axis weakens from a 1/sin^2 blow-up to a
   smooth du/dlam -> 0,
 - the loop carries state TRANSPOSED as (8, N): with (N, 8) the state slots
   sit in the 128-lane minor dimension at 8/128 utilization,
 - step size is curvature-adaptive (fragment.glsl.ts:141-159) with a
   pole-proximity throttle, and any ray whose state goes non-finite is
   frozen as captured (the reference's NaN-guard idea, camera.rs:36-38),
 - equatorial-plane crossings (u sign change) are *recorded* into K fixed
   slots per ray and shaded once after the march (render/shading.py),
 - optional optically-thin jet emission accumulates per step,
 - the whole march is differentiable; gradients freeze with the masks.

The march works in any float dtype: f32 for the fast path, f64 when used as
a reference. The separately-jitted f64 RKF45 oracle (geodesic.integrate) is
the ground truth it is validated against.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
from blackhole_simulation_tpu.ops.ks_kernel import (
    ks_renormalize_u,
    ks_symplectic_step_u,
    theta_state_to_u,
    u_state_to_theta,
)


@dataclasses.dataclass(frozen=True)
class MarchConfig:
    """Static march parameters (they fix the traced program).

    Defaults mirror the reference's tuning: max_steps quality budgets
    off/32/64/128/256 with hard cap 500 (simulation.config.ts:205-211),
    step-rate ~0.1 of (r - r_h), horizon threshold 1.01 r+, escape at the
    camera-distance scale. ``max_crossings`` fixes the number of recorded
    disk-plane intersections per ray (higher-order images: the photon ring
    needs >= 3). ``midpoint_iters`` is the fixed-point iteration count of
    the implicit-midpoint step (2 mirrors the reference WGSL; 1 trades a
    third of the RHS evaluations for slightly lower accuracy).
    """

    max_steps: int = 256
    step_rate: float = 0.12
    min_step: float = 5e-3
    max_step: float = 4.0
    # When > 0, the step cap grows with radius: cap = max(max_step,
    # far_step_cap_rate * r). Far-field spacetime is nearly flat, so escape
    # legs (turning point -> escape_radius) cost O(log r) steps instead of
    # O(r) — the r-dependent form of the reference's far-field boost
    # (fragment.glsl.ts:150-156).
    far_step_cap_rate: float = 0.0
    far_boost_radius: float = 30.0   # beyond this, steps grow linearly
    escape_radius: float = 120.0
    horizon_factor: float = 1.01
    renormalize_every: int = 16
    # Pallas kernel: steps between per-tile early-exit checks. Smaller =
    # tighter tile exits at one more reduce/branch per block.
    exit_check_every: int = 8
    # jnp path: steps per jax.checkpoint block (SURVEY §7.3-3, the
    # long-sequence backward treatment). Reverse-mode through the plain
    # fori_loop saves EVERY step's carry — ~170 MB/step at 1080p, an
    # instant OOM at 256 steps. With blocks of K, only max_steps/K block
    # boundaries are saved and the interior recomputes in the backward
    # sweep (one extra forward pass of compute). 0 disables (full history).
    remat_every: int = 32
    max_crossings: int = 4           # K recorded equator crossings per ray
    record_r_min: float = 1.0        # crossing radial window (disk extent)
    record_r_max: float = 30.0
    midpoint_iters: int = 2
    # Pallas kernel only: evaluate 1/S and 1/w with the TPU's approximate
    # reciprocal (pl.reciprocal(approx=True)). The periodic null
    # renormalization (exact math) absorbs the truncation.
    approx_recip: bool = False
    # Shadow-interior pre-cull (render/precull.py): provably-captured rays
    # (exact Bardeen critical-curve test on the conserved (lambda, eta), the
    # principled form of fragment.glsl.ts:118-127's b < 0.9 r_h cull) get a
    # raised per-ray termination radius instead of creeping to 1.01 r_h.
    shadow_precull: bool = False
    # With the disk on, culled rays still march (their foreground disk
    # crossings are real) but stop at the ISCO: a captured ray's r is
    # monotone decreasing (rootless radial potential), so no visible
    # crossing (needs r > ISCO) can follow. With it off, culled rays die at
    # step 0.
    precull_keep_disk: bool = True
    # Per-step reverse-mode cotangent clip (per-ray norm over the 6 evolving
    # state rows). Near-critical photon-ring rays are chaotic: their
    # state-to-state Jacobian grows ~e^{lam_L * n_steps}, so d(pixel)/d(spin)
    # through the full march reaches 1e5-1e6 with effectively random sign
    # (measured: d(loss)/d(spin) = -4.3e5 at a=0.921 against a target at
    # 0.85 — pointing AWAY from the basin — while the loss itself is smooth
    # and monotone). Clipping the carry's cotangent norm once per step (the
    # BPTT gradient-clipping trick) bounds every ray's contribution, so the
    # ~99% well-behaved pixels dominate the aggregate gradient. 0 = off
    # (exact VJP — the oracle gradient gate uses that path).
    cotangent_clip: float = 0.0
    # Tile-resident Pallas kernel (ops/pallas_march.py): ~VMEM-resident march
    # with per-tile early exit. Forward-only — the jnp path keeps the VJP —
    # and incompatible with in-loop jet accumulation.
    use_pallas: bool = False
    # Fused render megakernel (ops/pallas_render.py): ray birth, precull,
    # march AND shading in one Pallas program per pixel tile — zero
    # intermediate HBM traffic. Requires use_pallas; render_sample falls
    # back to the staged path when jets (per-step accumulation) are on.
    fused: bool = False
    # EXPERIMENTAL: variable-step Adams-Bashforth-3 march in the Pallas
    # kernels (ops/pallas_march.march_tile_ab3) — ONE RHS evaluation per
    # step instead of the midpoint's two, 3rd-order accurate, certified by
    # its own oracle ladder (tests/test_ab3.py). Kernel paths only (no
    # jets, no AD); the jnp path ignores it.
    multistep: bool = False
    # Blue-noise-decorrelated march start (fragment.glsl.ts:104-109):
    # advance each ray by a hashed fraction (0..start_jitter) of its first
    # adaptive step before marching, breaking the correlated stepping
    # bands of neighboring rays into broadband noise. 0 = off. Not applied
    # on the AD path (deterministic gradients).
    start_jitter: float = 0.0
    # Critical-band refinement pass (VERDICT r4 item 1, the principled form
    # of fragment.glsl.ts:141-159's photon-sphere proximity clamp): after
    # the main render, rays whose conserved (lambda, eta) lie within
    # ``refine_band`` (M^2 units, precull.band_metric_values) of the Bardeen
    # critical curve — the step-size-sensitive capture/escape boundary —
    # are RE-MARCHED as one compacted batch (the reference's tile-queue
    # compaction idea, _legacy_src/tiling.rs, applied to rays) at
    # ``refine_step_rate`` with a ``refine_max_steps`` budget, and their
    # radiance overwrites the coarse pixels. Cost is ~(band fraction) x
    # (rate ratio) of a frame; the band is <1% of pixels at 1080p. 0 = off.
    refine_band: float = 0.0
    # Static compaction budget: at most this many rays are refined per
    # sample (selection is threshold-first; an overflowing band leaves the
    # excess pixels at the coarse rate). Must be a multiple-friendly size
    # for the Pallas tile (rounded up internally).
    refine_budget: int = 16384
    # Refinement marches at VALIDATION grade so band pixels classify exactly
    # as the fine reference does (step_rate 0.03, tight far cap, exact
    # divides — the convergence-ladder reference config).
    refine_step_rate: float = 0.03
    refine_max_steps: int = 4096
    refine_max_step: float = 1.0
    # Optional second refinement selector: also re-march rays whose
    # closed-form minimum sin^2(theta) (precull.pole_w_min_values) is below
    # this — polar-passing rays are the other family the coarse rate
    # misclassifies (measured ~half of all out-of-band hit flips at 1080p
    # a=0.999). Off by default: it multiplies the refined pixel count
    # several-fold; enable for maximum-fidelity offline work.
    refine_pole_w: float = 0.0


def refinement_config(cfg: "MarchConfig") -> "MarchConfig":
    """The march config of the critical-band refinement pass: the
    validation-grade reference march (tests/test_oracle_gate.py ladder),
    shared by pipeline.refine_critical_band and the band-agreement gate
    (tools/band_agreement.py) so 'refined' and 'reference' are the same
    program by construction."""
    return dataclasses.replace(
        cfg,
        step_rate=cfg.refine_step_rate,
        max_steps=cfg.refine_max_steps,
        max_step=cfg.refine_max_step,
        approx_recip=False,
        refine_band=0.0,
        fused=False,
        multistep=False,
        shadow_precull=False,
    )


# Flags describing how each ray ended (mirrors TerminationReason).
HIT_NONE = 0
HIT_HORIZON = 1
HIT_ESCAPE = 2


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def clip_cotangent(x, limit: float):
    """Identity forward; reverse pass clips the per-ray cotangent norm.

    ``x``: (6, N) stacked evolving state rows. The backward pass rescales
    each ray's 6-component cotangent to norm <= limit — applied once per
    march step it prevents the exponential adjoint blowup of chaotic
    near-critical rays (see MarchConfig.cotangent_clip).
    """
    return x


def _clip_cot_fwd(x, limit: float):
    return x, None


def _clip_cot_bwd(limit: float, _res, g):
    norm = jnp.sqrt(jnp.sum(g * g, axis=0, keepdims=True))
    scale = jnp.minimum(1.0, limit / jnp.maximum(norm, 1e-30))
    return (g * scale,)


clip_cotangent.defvjp(_clip_cot_fwd, _clip_cot_bwd)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "state", "hit", "steps", "cross_r", "cross_phi", "cross_t",
        "n_crossings", "jet_radiance", "r_min_ph",
    ],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class MarchResult:
    state: jnp.ndarray        # (N, 8) final phase-space state (theta form)
    hit: jnp.ndarray          # (N,) HIT_* code
    steps: jnp.ndarray        # (N,) steps taken while active
    cross_r: jnp.ndarray      # (N, K) interpolated crossing radii (0 = empty)
    cross_phi: jnp.ndarray    # (N, K) crossing azimuths
    cross_t: jnp.ndarray      # (N, K) crossing coordinate times
    n_crossings: jnp.ndarray  # (N,) number of recorded crossings
    jet_radiance: jnp.ndarray # (N, 3) accumulated optically-thin jet emission
    r_min_ph: jnp.ndarray     # (N,) min |r - r_ph| reached during the march
                              # (the reference's photon-ring proximity,
                              # fragment.glsl.ts:198-200, recorded not guessed)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "state_u", "hit", "steps", "cross_r", "cross_phi", "cross_t",
        "n_crossings", "jet_radiance", "r_min_ph",
    ],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class MarchRows:
    """Row-native march result — the march's working layout, no transposes.

    The render pipeline consumes this directly: every relayout between the
    march's (8, N)/(K, N) rows and MarchResult's (N, 8)/(N, K) packing is a
    full-HBM copy at 1080p (~3 ms/frame of pure data movement in the r3
    profile), and shading immediately transposed the packed arrays back.
    """

    state_u: jnp.ndarray      # (8, N) final u-chart rows (t,r,u,ph,pt,pr,pu,pph)
    hit: jnp.ndarray          # (N,)
    steps: jnp.ndarray        # (N,)
    cross_r: jnp.ndarray      # (K, N)
    cross_phi: jnp.ndarray    # (K, N)
    cross_t: jnp.ndarray      # (K, N)
    n_crossings: jnp.ndarray  # (N,)
    jet_radiance: jnp.ndarray # (3, N)
    r_min_ph: jnp.ndarray     # (N,)


def adaptive_dlam(r, r_h, r_ph, cfg: MarchConfig, dtype):
    """Curvature-adaptive affine step (fragment.glsl.ts:141-159, vectorized):
    grows with (r - r_h), boosted in the far field, clamped down near the
    photon sphere where near-critical rays orbit (the reference's
    photon-sphere proximity clamp)."""
    base = (r - r_h) * cfg.step_rate
    far = jnp.maximum(r / cfg.far_boost_radius, 1.0)  # far-field boost
    # reciprocal-then-multiply, matching the Pallas kernel bit-for-bit
    prox = jnp.clip(jnp.abs(r - r_ph) * (1.0 / jnp.maximum(r_ph, 1e-3)), 0.25, 1.0)
    cap = (
        jnp.maximum(cfg.max_step, cfg.far_step_cap_rate * r)
        if cfg.far_step_cap_rate > 0.0
        else cfg.max_step
    )
    return jnp.clip(base * far * prox, cfg.min_step, cap).astype(dtype)


def precull_threshold(yt0: jnp.ndarray, bh: Kerr, cfg: MarchConfig):
    """(N,) per-ray termination radius from the u-chart rows: horizon_r
    normally; for pre-culled rays the ISCO (disk kept) or effectively-
    infinite (instant death)."""
    dtype = yt0.dtype
    horizon_r = cfg.horizon_factor * bh.event_horizon().astype(dtype)
    n = yt0.shape[1]
    if not cfg.shadow_precull:
        return jnp.broadcast_to(jnp.asarray(horizon_r, dtype), (n,))
    from blackhole_simulation_tpu.render.precull import capture_mask_u

    dead = capture_mask_u(bh.mass.astype(dtype), bh.spin.astype(dtype), yt0)
    if cfg.precull_keep_disk:
        stop_r = jnp.maximum(
            jnp.maximum(bh.isco().astype(dtype), cfg.record_r_min), horizon_r
        )
    else:
        stop_r = jnp.asarray(1e9, dtype)
    return jnp.where(dead, stop_r, horizon_r)


def march(
    y0: jnp.ndarray,
    bh: Kerr,
    cfg: MarchConfig = MarchConfig(),
    jets=None,
):
    """March a batch of KS-chart null rays to horizon/escape, recording
    equatorial-plane crossings. ``jets``: optional shading.JetParams — when
    set, optically-thin jet emission accumulates per step. Returns a
    MarchResult. Fully differentiable.

    Thin packing wrapper over march_rows (the row-native core the render
    pipeline calls directly).
    """
    dtype = y0.dtype
    n = y0.shape[0]
    yt0 = theta_state_to_u(y0.T)
    rows = march_rows(yt0, bh, cfg, jets=jets)
    return MarchResult(
        state=u_state_to_theta(rows.state_u).T,
        hit=rows.hit,
        steps=rows.steps,
        cross_r=rows.cross_r.T,
        cross_phi=rows.cross_phi.T,
        cross_t=rows.cross_t.T,
        n_crossings=rows.n_crossings,
        jet_radiance=rows.jet_radiance.T,
        r_min_ph=rows.r_min_ph,
    )


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def _march_kernel_diff(yt0, thr, m, a, r_h, r_ph, cfg):
    """Pallas march with a Pallas backward (ops/pallas_grad.py).

    Differentiable in (yt0, m, a, r_h, r_ph); thr is a termination radius
    (a.e. zero gradient). Returns the pallas_march_u output tuple.
    """
    from blackhole_simulation_tpu.ops.pallas_march import pallas_march_u

    interpret = jax.default_backend() != "tpu"
    return pallas_march_u(yt0, thr, m, a, r_h, r_ph, cfg, interpret=interpret)


def _march_kd_fwd(yt0, thr, m, a, r_h, r_ph, cfg):
    outs = _march_kernel_diff(yt0, thr, m, a, r_h, r_ph, cfg)
    rmin = outs[7]
    return outs, (yt0, thr, m, a, r_h, r_ph, rmin)


def _march_kd_bwd(cfg, res, cts):
    from blackhole_simulation_tpu.ops.pallas_grad import pallas_march_grad

    yt0, thr, m, a, r_h, r_ph, rmin = res
    ct_yt, _ct_hit, _ct_steps, ct_cr, ct_cp, ct_ct, _ct_nc, ct_rmin = cts
    interpret = jax.default_backend() != "tpu"
    ct_yt0, ct_m, ct_a, ct_rh, ct_rph = pallas_march_grad(
        yt0, thr, m, a, r_h, r_ph, cfg,
        ct_yt, ct_cr, ct_cp, ct_ct, ct_rmin, rmin,
        interpret=interpret,
    )
    return (
        ct_yt0,
        jnp.zeros_like(thr),
        ct_m.astype(m.dtype),
        ct_a.astype(a.dtype),
        ct_rh.astype(r_h.dtype),
        ct_rph.astype(r_ph.dtype),
    )


_march_kernel_diff.defvjp(_march_kd_fwd, _march_kd_bwd)


def march_rows_ad(
    yt0: jnp.ndarray,
    bh: Kerr,
    cfg: MarchConfig = MarchConfig(),
    thr: jnp.ndarray | None = None,
):
    """march_rows with BOTH sweeps as Pallas kernels: the forward tile
    march (ops/pallas_march.py) and a checkpoint/replay VMEM backward
    (ops/pallas_grad.py) — reverse-mode at kernel speed, SURVEY §5.7's
    long-sequence backward. No jets (per-step accumulation stays on the
    jnp AD path); gradients flow to rays, spin/mass and derived radii.
    """
    assert bh.chart == KS
    dtype = yt0.dtype
    n = yt0.shape[1]
    m_bh = bh.mass.astype(dtype)
    a_bh = bh.spin.astype(dtype)
    r_h = bh.event_horizon().astype(dtype)
    r_ph = bh.photon_sphere().astype(dtype)
    if thr is None:
        thr = jax.lax.stop_gradient(precull_threshold(yt0, bh, cfg))

    # Normalization + birth renorm in jnp (their VJPs via ordinary AD).
    inv_e = -1.0 / jnp.where(jnp.abs(yt0[4]) < 1e-12, -1.0, yt0[4])
    yt0 = jnp.concatenate(
        [yt0[:4], -jnp.ones_like(yt0[4:5]), yt0[5:8] * inv_e[None, :]],
        axis=0,
    )
    yt0 = ks_renormalize_u(m_bh, a_bh, yt0)

    yt, hit, steps, cr, cp, ct, ncross, rmin = _march_kernel_diff(
        yt0, thr, m_bh, a_bh, r_h, r_ph, cfg
    )
    return MarchRows(
        state_u=yt,
        hit=hit,
        steps=steps,
        cross_r=cr,
        cross_phi=cp,
        cross_t=ct,
        n_crossings=ncross,
        jet_radiance=jnp.zeros((3, n), dtype=dtype),
        r_min_ph=rmin,
    )


def march_rows(
    yt0: jnp.ndarray,
    bh: Kerr,
    cfg: MarchConfig = MarchConfig(),
    jets=None,
    thr: jnp.ndarray | None = None,
):
    """Row-native march core: (8, N) u-chart rows in, MarchRows out.

    ``yt0`` need not be null-renormalized (the march projects p_r onto
    H = 0 first). ``thr`` overrides the per-ray termination radius
    (precull_threshold is used when omitted)."""
    assert bh.chart == KS, "the fast march integrates in the Kerr-Schild chart"
    dtype = yt0.dtype
    n = yt0.shape[1]
    k_slots = cfg.max_crossings
    m_bh = bh.mass.astype(dtype)
    a_bh = bh.spin.astype(dtype)
    r_h = bh.event_horizon().astype(dtype)
    r_ph = bh.photon_sphere().astype(dtype)
    slot_ids = jnp.arange(k_slots)

    if thr is None:
        thr = precull_threshold(yt0, bh, cfg)

    # Affine-normalize to p_t = -1 (null geodesics are invariant under
    # momentum rescaling; every camera ray has p_t < 0). Pins the conserved
    # p_t row to a compile-time constant, which the Pallas kernel folds out
    # of every step (camera_rays_u already emits normalized rays, making
    # this an exact multiply-by-one for the render pipeline).
    inv_e = -1.0 / jnp.where(jnp.abs(yt0[4]) < 1e-12, -1.0, yt0[4])
    yt0 = jnp.concatenate(
        [
            yt0[:4],
            -jnp.ones_like(yt0[4:5]),
            yt0[5:8] * inv_e[None, :],
        ],
        axis=0,
    )

    yt0 = ks_renormalize_u(m_bh, a_bh, yt0)

    if cfg.start_jitter > 0.0:
        from blackhole_simulation_tpu.ops.pallas_march import (
            start_offset_rows,
        )

        interp = jax.default_backend() != "tpu"
        rows7 = (yt0[0], yt0[1], yt0[2], yt0[3], yt0[5], yt0[6], yt0[7])
        ot, orr, ou, oph, opr, opu, _ = start_offset_rows(
            m_bh, a_bh, r_h, r_ph, cfg,
            cfg.approx_recip and not interp, rows7,
        )
        yt0 = jnp.stack([ot, orr, ou, oph, yt0[4], opr, opu, yt0[7]])

    if cfg.use_pallas and jets is None:
        from blackhole_simulation_tpu.ops.pallas_march import pallas_march_u

        interpret = jax.default_backend() != "tpu"
        yt, hit, steps, cr, cp, ct, ncross, rmin = pallas_march_u(
            yt0, thr, m_bh, a_bh, r_h, r_ph, cfg, interpret=interpret
        )
        return MarchRows(
            state_u=yt,
            hit=hit,
            steps=steps,
            cross_r=cr,
            cross_phi=cp,
            cross_t=ct,
            n_crossings=ncross,
            jet_radiance=jnp.zeros((3, n), dtype=dtype),
            r_min_ph=rmin,
        )

    # The state is carried as 6 separate evolving rows (t, r, u, phi, p_r,
    # p_u); the conserved p_t, p_phi rows are loop-invariant captures — the
    # same row decomposition as the Pallas kernel, and the SAME row-level
    # expression graph (ks_symplectic_step_rows / ks_renormalize_pr), which
    # is what keeps the two paths near-bitwise equal: any ulp-level FMA or
    # fusion difference amplifies through chaotic photon-ring rays.
    t0s, r0s, u0s, ph0s = yt0[0], yt0[1], yt0[2], yt0[3]
    pr0s, pu0s, pph_c = yt0[5], yt0[6], yt0[7]
    # p_t is the compile-time scalar -1 after the normalization above: the
    # step algebra's p_t^2 and p_t-cross terms constant-fold in both the
    # jnp trace and the Mosaic kernel (same DAG, same folding).
    pt_c = jnp.asarray(-1.0, dtype)

    # Benign far-field values substituted into the step for terminated rays
    # (the "double-where" rule): a frozen ray's discarded y_next can still
    # overflow in f32 (it keeps re-stepping its frozen state), and reverse-
    # mode turns 0-cotangent x Inf-primal into NaN — d(pixel)/d(spin) was
    # NaN at a=0.7 f32 until dead lanes stepped this safe state instead.
    # (p_t, p_phi are conserved and always finite, so they pass through.)
    safe = jnp.asarray([0.0, 10.0, 0.0, 0.0, 0.0, 0.0], dtype)

    from blackhole_simulation_tpu.ops.ks_kernel import (
        ks_renormalize_pr,
        ks_symplectic_step_rows,
        w_floor,
    )

    def body(i, carry):
        t, r, u, ph, pr, pu, hit, steps, cr, cp, ct, ncross, jet_rgb, rmin = carry
        active = hit == HIT_NONE
        t_in = jnp.where(active, t, safe[0])
        r_in = jnp.where(active, r, safe[1])
        u_in = jnp.where(active, u, safe[2])
        ph_in = jnp.where(active, ph, safe[3])
        pr_in = jnp.where(active, pr, safe[4])
        pu_in = jnp.where(active, pu, safe[5])

        dlam = adaptive_dlam(r, r_h, r_ph, cfg, dtype)

        # Pole throttle: cap the step so u cannot overshoot past +-1 (where
        # w = 1 - u^2 hits its guard and dphi/dlam spikes). du/dlam = w pu/S.
        w = jnp.maximum(1.0 - u * u, w_floor(dtype))
        sig = r * r + a_bh * a_bh * u * u
        du_rate = jnp.abs(w * pu / sig) + 1e-12
        margin = 1.0 - jnp.abs(u) + 1e-6
        dlam = jnp.minimum(dlam, jnp.maximum(0.5 * margin / du_rate, cfg.min_step))

        nt, nr, nu, nph, npr, npu = ks_symplectic_step_rows(
            m_bh, a_bh, (t_in, r_in, u_in, ph_in, pt_c, pr_in, pu_in, pph_c),
            dlam, cfg.midpoint_iters,
        )
        # Keep u inside the chart after any residual overshoot.
        nu = jnp.clip(nu, -1.0 + 1e-7, 1.0 - 1e-7)

        if jets is not None:
            from blackhole_simulation_tpu.render.shading import jet_emission_step

            inv = 1.0 / dlam
            st = jnp.sqrt(w)
            contrib = jnp.stack(jet_emission_step(
                jets,
                r, st, u, ph,
                (nr - r) * inv,
                -(nu - u) * inv / st,  # dtheta = -du / sin(theta)
                (nph - ph) * inv,
                dlam,
                dtype,
            ))  # (3, N)
            jet_rgb = jet_rgb + jnp.where(active[None, :], contrib, 0.0)

        # Equator-crossing detection: u sign change; interpolate the record
        # (chunks/disk.ts:22-31 / compute.wgsl.ts:217, recorded not shaded).
        frac = jnp.clip(
            u / jnp.where(jnp.abs(u - nu) < 1e-12, 1e-12, u - nu), 0.0, 1.0
        )
        r_c = r + frac * (nr - r)
        phi_c = ph + frac * (nph - ph)
        t_c = t + frac * (nt - t)
        crossed = (
            active
            & ((u * nu) < 0.0)
            & (r_c > cfg.record_r_min)
            & (r_c < cfg.record_r_max)
            & (ncross < k_slots)
        )
        # Scatter into the next free slot: one-hot over K static slots.
        mask_k = crossed[None, :] & (ncross[None, :] == slot_ids[:, None])
        cr = jnp.where(mask_k, jnp.where(crossed, r_c, 0.0)[None, :], cr)
        cp = jnp.where(mask_k, jnp.where(crossed, phi_c, 0.0)[None, :], cp)
        ct = jnp.where(mask_k, jnp.where(crossed, t_c, 0.0)[None, :], ct)
        ncross = ncross + crossed.astype(jnp.int32)

        # Stability safety net (the reference's NaN validation + rollback,
        # gravitas-wasm camera.rs): near-critical whirling rays can diverge
        # exponentially in f32 — freeze a ray as captured the moment its
        # state goes non-finite OR its momenta/radius leave sane bounds
        # (a diverged ray once produced r ~ 7e6 and was misread as escaped).
        sane = (
            jnp.isfinite(nr)
            & jnp.isfinite(nph)
            & jnp.isfinite(npr)
            & jnp.isfinite(npu)
            & (jnp.abs(npr) < 1e7)
            & (jnp.abs(npu) < 1e7)
            & (nr < 8.0 * cfg.escape_radius)
        )
        advance = active & sane
        t = jnp.where(advance, nt, t)
        r = jnp.where(advance, nr, r)
        u = jnp.where(advance, nu, u)
        ph = jnp.where(advance, nph, ph)
        pr = jnp.where(advance, npr, pr)
        pu = jnp.where(advance, npu, pu)
        steps = steps + advance.astype(jnp.int32)
        # Photon-ring proximity record (fragment.glsl.ts:198-200): min
        # |r - r_ph| over the marched path, not a post-hoc heuristic.
        rmin = jnp.where(advance, jnp.minimum(rmin, jnp.abs(r - r_ph)), rmin)
        hit = jnp.where(active & ~sane, HIT_HORIZON, hit)

        hit = jnp.where(active & (r < thr), HIT_HORIZON, hit)
        hit = jnp.where(active & (r > cfg.escape_radius), HIT_ESCAPE, hit)

        # Periodic null renormalization to hold H = 0 in low precision —
        # applied to the post-advance carry of still-active rays, the same
        # semantics the Pallas kernel implements at its tile-exit block
        # boundaries (where it costs one predicated evaluation per
        # exit_check_every steps instead of a masked quadratic every step).
        renorm = (i % cfg.renormalize_every) == cfg.renormalize_every - 1
        pr = jnp.where(
            renorm & (hit == HIT_NONE),
            ks_renormalize_pr(m_bh, a_bh, r, u, pt_c, pr, pu, pph_c),
            pr,
        )
        if cfg.cotangent_clip > 0.0:
            # Bound the adjoint ONCE per step (identity in the forward pass;
            # XLA folds the stack/unstack). See MarchConfig.cotangent_clip.
            t, r, u, ph, pr, pu = clip_cotangent(
                jnp.stack([t, r, u, ph, pr, pu]), cfg.cotangent_clip
            )
        return t, r, u, ph, pr, pu, hit, steps, cr, cp, ct, ncross, jet_rgb, rmin

    hit0 = jnp.zeros(n, dtype=jnp.int32)
    # Rays born below their termination radius (inside the horizon, or
    # pre-culled with the disk off) terminate immediately.
    hit0 = jnp.where(r0s < thr, HIT_HORIZON, hit0)
    zeros_k = jnp.zeros((k_slots, n), dtype=dtype)
    carry = (
        t0s, r0s, u0s, ph0s, pr0s, pu0s,
        hit0,
        jnp.zeros(n, dtype=jnp.int32),
        zeros_k,
        zeros_k,
        zeros_k,
        jnp.zeros(n, dtype=jnp.int32),
        jnp.zeros((3, n), dtype=dtype),
        jnp.abs(r0s - r_ph),
    )
    if cfg.remat_every > 0 and cfg.remat_every < cfg.max_steps:
        # Checkpointed march: scan over blocks of K steps, each block a
        # rematerialized unit (see remat_every). The step index threads
        # through as block*K + j so the renorm cadence is unchanged.
        k_blk = cfg.remat_every
        n_blk = -(-cfg.max_steps // k_blk)

        exact = cfg.max_steps % k_blk == 0

        @jax.checkpoint
        def block(c, blk):
            def inner(j, cc):
                i = blk * k_blk + j
                cc2 = body(i, cc)
                if exact:
                    return cc2
                # Non-divisible tail: steps past the budget must be no-ops
                # for fori-path parity.
                return jax.tree.map(
                    lambda a, b: jnp.where(i < cfg.max_steps, a, b), cc2, cc
                )

            return jax.lax.fori_loop(0, k_blk, inner, c), None

        out, _ = jax.lax.scan(block, carry, jnp.arange(n_blk))
    else:
        out = jax.lax.fori_loop(0, cfg.max_steps, body, carry)
    t, r, u, ph, pr, pu, hit, steps, cr, cp, ct, ncross, jet_rgb, rmin = out
    yt = jnp.stack(
        [t, r, u, ph, jnp.broadcast_to(pt_c, t.shape), pr, pu, pph_c], axis=0
    )
    # Step budget exhausted while still live: closest to a horizon-bound ray
    # (photon-ring orbiters) — classify as horizon like the reference's cap.
    hit = jnp.where(hit == HIT_NONE, HIT_HORIZON, hit)
    return MarchRows(
        state_u=yt,
        hit=hit,
        steps=steps,
        cross_r=cr,
        cross_phi=cp,
        cross_t=ct,
        n_crossings=ncross,
        jet_radiance=jet_rgb,
        r_min_ph=rmin,
    )
