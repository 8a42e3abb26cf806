"""Pallas TPU kernel: march a tile of rays entirely in VMEM.

The jnp march (render/march.py) streams its full (8, N) carry through HBM
every one of its 256 steps — at 1080p that is ~100 GB of traffic and the
march is memory-bound. This kernel gives each grid program a TILE of rays
that stays resident in VMEM for the *whole* march, so the loop is
compute-bound, and adds the wavefront-style optimization the reference's
tile queue aims at (legacy tiling.rs, TiledRayBatch): a ``while_loop`` stops
the tile as soon as every ray in it has terminated — shadow-interior and
sky tiles quit in a fraction of max_steps.

Same math as the jnp path: u = cos(theta) Kerr-Schild Hamiltonian RHS
(ops/ks_kernel.ks_rhs_u), curvature-adaptive step with photon-sphere
proximity clamp and pole throttle, periodic null renormalization, sanity
freeze, and K-slot equatorial-crossing recording. Forward-only: the
differentiable paths keep the jnp march (its VJP); tests assert the two
paths agree.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blackhole_simulation_tpu.ops.ks_kernel import (
    ks_renormalize_pr,
    ks_symplectic_step_rows,
    w_floor,
)

HIT_NONE = 0
HIT_HORIZON = 1
HIT_ESCAPE = 2

# Rays per grid program, arranged as full (sublane, lane) VPU tiles: every
# per-ray quantity in the kernel is a (SUB, 128) 2-D array = SUB/8 vector
# registers. (A flat (TILE,) 1-D layout puts rays on lanes only — 1 of 8
# sublanes active — wasting 7/8 of the VPU.) SUB > 8 issues several
# independent vregs through each op, pipelining the step's dependency chain
# (the kernel is latency-bound, not throughput-bound); the cost is coarser
# per-tile early exit. BH_PALLAS_SUB is an experiment override.
import os as _os

SUB = int(_os.environ.get("BH_PALLAS_SUB", "32"))
LANE = 128
TILE = SUB * LANE

def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _block_dims(height: int, width: int):
    """Pick the BLOCK_H x BLOCK_W = TILE pixel-block shape that minimizes
    padding for this frame (fixed 64x64 padded a 96x96 render to 128x128,
    +78% marched rays). Ties prefer the squarest block — spatial coherence
    is what makes the per-tile early exit fire."""
    best = None
    bh = 8
    while bh * 8 <= TILE:
        bw = TILE // bh
        area = _cdiv(height, bh) * bh * _cdiv(width, bw) * bw
        squareness = abs(bh - bw)
        if best is None or (area, squareness) < best[:2]:
            best = (area, squareness, bh, bw)
        bh *= 2
    return best[2], best[3]


def _padded_dims(height: int, width: int):
    bh, bw = _block_dims(height, width)
    hp = _cdiv(height, bh) * bh
    wp = _cdiv(width, bw) * bw
    return hp, wp


def to_block_order(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Row-major (H*W, ...) -> pixel-block-major (Hp*Wp, ...) ordering.

    The kernel's early exit is per-TILE: a tile stops marching only when
    EVERY ray in it terminated. In row-major order a 512-ray tile is a wide
    strip of one image row, so almost every tile contains at least one slow
    photon-ring ray and the exit never fires. Regrouping rays into compact
    BLOCK_H x BLOCK_W pixel blocks (the reference's screen-tile
    decomposition, _legacy_src/tiling.rs / TiledRayBatch) makes sky and
    shadow-interior tiles spatially coherent so they quit in a fraction of
    max_steps — measured 36 % less tile-work at 1080p a=0.999.

    Implemented as reshape+transpose (a regular XLA copy — arbitrary-index
    gathers of the same data measured ~15x slower on TPU). The image is
    padded to block multiples with edge-replicated rays (marched normally,
    ~0.7 % overhead at 1080p, dropped by from_block_order).
    """
    bh, bw = _block_dims(height, width)
    hp, wp = _padded_dims(height, width)
    tail = x.shape[1:]
    x = x.reshape(height, width, *tail)
    x = jnp.pad(x, ((0, hp - height), (0, wp - width)) + ((0, 0),) * len(tail),
                mode="edge")
    x = x.reshape(hp // bh, bh, wp // bw, bw, *tail)
    x = jnp.moveaxis(x, 1, 2)
    return x.reshape(hp * wp, *tail)


def from_block_order(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Inverse of to_block_order: (Hp*Wp, ...) -> row-major (H*W, ...)."""
    bh, bw = _block_dims(height, width)
    hp, wp = _padded_dims(height, width)
    tail = x.shape[1:]
    x = x.reshape(hp // bh, wp // bw, bh, bw, *tail)
    x = jnp.moveaxis(x, 2, 1).reshape(hp, wp, *tail)
    return x[:height, :width].reshape(height * width, *tail)


@jax.custom_vjp
def recip_approx(x):
    """TPU approximate reciprocal with a VJP (d(1/x) = -y^2 dx using the
    approximate y itself): pl.reciprocal has no differentiation rule, and
    the gradient kernel (ops/pallas_grad.py) must differentiate through
    the bit-exact replay of an approx-recip forward."""
    return pl.reciprocal(x, approx=True)


def _recip_fwd(x):
    y = pl.reciprocal(x, approx=True)
    return y, y


def _recip_bwd(y, ct):
    return (-y * y * ct,)


recip_approx.defvjp(_recip_fwd, _recip_bwd)


def make_div_recip(approx_recip: bool):
    """(div, recip) pair: exact division in interpret mode (bit-parity with
    the jnp path), TPU approximate-reciprocal + multiply on hardware (the
    periodic renormalization absorbs the truncation)."""
    if approx_recip:
        return (lambda num, den: num * recip_approx(den), recip_approx)
    return (lambda num, den: num / den), None


def diff_step_values(m, a, r_h, r_ph, cfg, approx_recip, rows):
    """The pure (differentiable) value computations of one march step.

    ``rows`` = (t, r, u, ph, pr, pu, pph); p_t is the implicit scalar -1.
    Returns (nt, nr, nu, nph, npr, npu, r_c, phi_c, t_c, dlam): the stepped
    state, the interpolated equator-crossing record values (meaningful only
    where the caller's crossing mask holds), and the affine step taken
    (consumed by the jet accumulator). Shared by the forward kernels'
    step bodies and the gradient kernel's per-step VJP composite
    (ops/pallas_grad.py) — one DAG, so the replay is bit-exact.
    """
    t, r, u, ph, pr, pu, pph = rows
    dt = r.dtype
    F = lambda v: jnp.asarray(v, dt)
    div, recip = make_div_recip(approx_recip)
    pt_ = F(-1.0)
    inv_rph = F(1.0) / jnp.maximum(r_ph, F(1e-3))

    base = (r - r_h) * F(cfg.step_rate)
    far = jnp.maximum(r / F(cfg.far_boost_radius), F(1.0))
    prox = jnp.clip(jnp.abs(r - r_ph) * inv_rph, F(0.25), F(1.0))
    if cfg.far_step_cap_rate > 0.0:
        cap = jnp.maximum(F(cfg.max_step), F(cfg.far_step_cap_rate) * r)
    else:
        cap = F(cfg.max_step)
    dlam = jnp.clip(base * far * prox, F(cfg.min_step), cap)

    # Pole throttle — same floor as the jnp path (render/march.py).
    w = jnp.maximum(F(1.0) - u * u, F(w_floor(dt)))
    sig = r * r + a * a * u * u
    du_rate = jnp.abs(w * pu / sig) + F(1e-12)
    margin = F(1.0) - jnp.abs(u) + F(1e-6)
    dlam = jnp.minimum(
        dlam, jnp.maximum(div(F(0.5) * margin, du_rate), F(cfg.min_step))
    )

    nt, nr, nu, nph, npr, npu = ks_symplectic_step_rows(
        m, a, (t, r, u, ph, pt_, pr, pu, pph), dlam,
        cfg.midpoint_iters, recip,
    )
    nu = jnp.clip(nu, F(-1.0 + 1e-7), F(1.0 - 1e-7))

    # Equator-crossing record values (chunks/disk.ts:22-31 interpolation).
    frac = jnp.clip(
        div(u, jnp.where(jnp.abs(u - nu) < F(1e-12), F(1e-12), u - nu)),
        F(0.0),
        F(1.0),
    )
    r_c = r + frac * (nr - r)
    phi_c = ph + frac * (nph - ph)
    t_c = t + frac * (nt - t)
    return nt, nr, nu, nph, npr, npu, r_c, phi_c, t_c, dlam


def start_offset_rows(m, a, r_h, r_ph, cfg, approx_recip, rows):
    """Blue-noise-decorrelated march start (fragment.glsl.ts:104-109).

    Each ray advances by xi * start_jitter * dlam0 before the march, with
    xi in [0, 1) hashed from its conserved momenta (a per-pixel value with
    no spatial structure at banding frequencies — the hash plays the
    reference's blue-noise texture). Stepping stays on the geodesic
    ((lambda, eta) conserved), so only the discretization PHASE changes:
    the correlated stepping bands of neighboring rays decohere into
    broadband noise the supersampled accumulation averages away.
    ``rows`` = (t, r, u, ph, pr, pu, pph); returns the offset rows.
    """
    from blackhole_simulation_tpu.render.shading import hash21

    t, r, u, ph, pr, pu, pph = rows
    dt = r.dtype
    xi = hash21(pph * 977.0, pr * 991.0).astype(dt) * cfg.start_jitter
    nt, nr, nu, nph, npr, npu, _, _, _, dlam = diff_step_values(
        m, a, r_h, r_ph, cfg, approx_recip, rows
    )
    # One partial step of xi * dlam (re-evaluated at the scaled size).
    from blackhole_simulation_tpu.ops.ks_kernel import (
        ks_symplectic_step_rows,
    )

    _, recip = make_div_recip(approx_recip)
    pt_ = jnp.asarray(-1.0, dt)
    ot, orr, ou, oph, opr, opu = ks_symplectic_step_rows(
        m, a, (t, r, u, ph, pt_, pr, pu, pph), dlam * xi,
        cfg.midpoint_iters, recip,
    )
    ou = jnp.clip(ou, -1.0 + 1e-7, 1.0 - 1e-7)
    return ot, orr, ou, oph, opr, opu, pph


def march_tile(m, a, r_h, r_ph, thr, rows0, cfg, approx_recip=False,
               jets=None):
    """The VMEM-resident march loop on one tile of rays.

    ``rows0``: 7 arrays (t, r, u, ph, p_r, p_u, p_phi) of a common 2-D
    (sublane, lane) shape — p_t is the implicit scalar -1 (callers
    normalize). ``jets``: optional shading.JetParams — per-step optically-
    thin jet emission accumulates into 3 extra carry rows (VERDICT r3
    item 5: the full-featured scene runs the fast path). Shared by the
    march-only kernel (_march_kernel) and the fused render kernel
    (ops/pallas_render.py). Returns
    (t, r, u, ph, pr, pu, hit, steps, cr, cp, ct, nc, rmin, (jr, jg, jb)).
    """
    t0_, r0_, u0_, ph0_, pr0_, pu0_, pph_ = rows0
    dt = r0_.dtype
    shape = r0_.shape
    # Every numeric literal must be dtype-typed: with jax_enable_x64 on,
    # bare python floats/ints inside clip/where materialize f64/i64 scalars,
    # and mosaic's 64-bit emulation path blows the recursion limit.
    F = lambda v: jnp.asarray(v, dt)
    I = lambda v: jnp.asarray(v, jnp.int32)
    inv_rph = F(1.0) / jnp.maximum(r_ph, F(1e-3))  # scalar, hoisted

    k_slots = cfg.max_crossings
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (k_slots,) + shape, 0)

    # p_t is the compile-time scalar -1; every p_t term in the step folds.
    pt_ = F(-1.0)

    hit0 = jnp.where(r0_ < thr, I(HIT_HORIZON), I(HIT_NONE))
    zeros_k = jnp.zeros((k_slots,) + shape, dtype=dt)

    # The tile-exit reduce+branch amortizes over `exit_check_every` steps.
    # The block interior is a lax.while_loop, NOT a fori_loop: Mosaic
    # unrolls static-trip loops into one giant basic block and compile time
    # explodes superlinearly in (trip count x SUB) — measured 17.5 s at trip
    # 1 vs >580 s at trip 15 with SUB=32 (r2 shipped 376 s compile+first
    # frame because of exactly this). Runtime is insensitive: the while
    # back-edge costs what the per-step exit branch it replaced did.
    exit_every = min(cfg.exit_check_every, cfg.max_steps)
    # Renorm can hoist to the block boundary only when boundaries land
    # exactly on the renorm cadence.
    hoist_renorm = (cfg.renormalize_every % exit_every) == 0

    def cond(carry):
        i, hit = carry[0], carry[7]
        # Per-tile early exit: stop when every ray in the tile is done.
        # (int32 max-reduce: jnp.any lowers through an f64 squeeze when
        # jax_enable_x64 is on, which mosaic rejects.)
        n_live = jnp.max(jnp.where(hit == I(HIT_NONE), I(1), I(0)))
        return (i < I(cfg.max_steps)) & (n_live > I(0))

    def body(carry):
        if jets is not None:
            (i, t, r, u, ph, pr, pu, hit, steps, cr, cp, ct, nc, rmin,
             jet) = carry
        else:
            i, t, r, u, ph, pr, pu, hit, steps, cr, cp, ct, nc, rmin = carry
            jet = None
        # i < max_steps guard: the batched exit check can run past the step
        # budget; those overshoot steps must be no-ops for jnp-path parity.
        active = (hit == I(HIT_NONE)) & (i < I(cfg.max_steps))

        nt, nr, nu, nph, npr, npu, r_c, phi_c, t_c, dlam = diff_step_values(
            m, a, r_h, r_ph, cfg, approx_recip, (t, r, u, ph, pr, pu, pph_)
        )

        if jets is not None:
            # Per-step optically-thin jet emission — same expression as the
            # jnp path (render/march.py), on the pre-advance state.
            from blackhole_simulation_tpu.render.shading import (
                jet_emission_step,
            )
            from blackhole_simulation_tpu.ops.ks_kernel import w_floor as _wf

            div_, recip_ = make_div_recip(approx_recip)
            inv = recip_(dlam) if recip_ is not None else 1.0 / dlam
            w_ = jnp.maximum(F(1.0) - u * u, F(_wf(dt)))
            st_ = jnp.sqrt(w_)
            c_r, c_g, c_b = jet_emission_step(
                jets, r, st_, u, ph,
                (nr - r) * inv, -(nu - u) * inv / st_, (nph - ph) * inv,
                dlam, dt,
            )
            jet = (
                jet[0] + jnp.where(active, c_r, F(0.0)),
                jet[1] + jnp.where(active, c_g, F(0.0)),
                jet[2] + jnp.where(active, c_b, F(0.0)),
            )

        # Equator-crossing record, unconditionally masked: the earlier
        # tile-level lax.cond needed a cross-lane any() reduce + scalar
        # branch EVERY step, which stalls the pipeline for longer than the
        # ~K masked selects it saved.
        maybe = active & ((u * nu) < F(0.0)) & (nc < I(k_slots))
        crossed = (
            maybe & (r_c > F(cfg.record_r_min)) & (r_c < F(cfg.record_r_max))
        )
        mask_k = crossed[None, :] & (nc[None, :] == slot_ids)
        cr = jnp.where(mask_k, r_c[None, :], cr)
        cp = jnp.where(mask_k, phi_c[None, :], cp)
        ct = jnp.where(mask_k, t_c[None, :], ct)
        nc = nc + jnp.where(crossed, I(1), I(0))

        sane = (
            jnp.isfinite(nr)
            & jnp.isfinite(nph)
            & jnp.isfinite(npr)
            & jnp.isfinite(npu)
            & (jnp.abs(npr) < F(1e7))
            & (jnp.abs(npu) < F(1e7))
            & (nr < F(8.0 * cfg.escape_radius))
        )
        advance = active & sane
        t = jnp.where(advance, nt, t)
        r = jnp.where(advance, nr, r)
        u = jnp.where(advance, nu, u)
        ph = jnp.where(advance, nph, ph)
        pr = jnp.where(advance, npr, pr)
        pu = jnp.where(advance, npu, pu)
        steps = steps + jnp.where(advance, I(1), I(0))
        # Photon-ring proximity record — same update as the jnp path.
        rmin = jnp.where(advance, jnp.minimum(rmin, jnp.abs(r - r_ph)), rmin)
        hit = jnp.where(active & ~sane, I(HIT_HORIZON), hit)

        hit = jnp.where(active & (r < thr), I(HIT_HORIZON), hit)
        hit = jnp.where(active & (r > F(cfg.escape_radius)), I(HIT_ESCAPE), hit)
        if not hoist_renorm:
            # Fallback (renormalize_every not a multiple of exit_every):
            # masked per-step renorm with the same post-advance semantics
            # as the jnp path.
            rn = (i % I(cfg.renormalize_every)) == I(cfg.renormalize_every - 1)
            pr = jnp.where(
                rn & (hit == I(HIT_NONE)),
                ks_renormalize_pr(m, a, r, u, pt_, pr, pu, pph_),
                pr,
            )
        out = (i + I(1), t, r, u, ph, pr, pu, hit, steps, cr, cp, ct, nc,
               rmin)
        return out + ((jet,) if jets is not None else ())

    def _apply_renorm(c):
        i, t, r, u, ph, pr, pu, hit, steps, cr, cp, ct, nc, rmin = c[:14]
        pr = jnp.where(
            hit == I(HIT_NONE),
            ks_renormalize_pr(m, a, r, u, pt_, pr, pu, pph_),
            pr,
        )
        return (i, t, r, u, ph, pr, pu, hit, steps, cr, cp, ct, nc,
                rmin) + tuple(c[14:])

    def body_block(carry):
        # exit_every steps per tile-exit check; dynamic-bound while_loop so
        # Mosaic cannot unroll it (see exit_every comment above). The body
        # is traced exactly ONCE in the whole kernel.
        j0 = carry[0]
        carry = jax.lax.while_loop(
            lambda c: c[0] < j0 + I(exit_every), body, carry
        )
        if hoist_renorm:
            # Periodic null renormalization hoisted to the tile-exit
            # boundary: one scalar-predicated evaluation per
            # exit_check_every steps instead of a ~25-op masked quadratic
            # every step (the jnp path implements the identical
            # post-advance/still-active semantics per step — same inputs,
            # same projected p_r, near-bitwise parity preserved).
            due = (carry[0] % I(cfg.renormalize_every)) == I(0)
            carry = jax.lax.cond(due, _apply_renorm, lambda c: c, carry)
        return carry

    carry = (
        jnp.int32(0),
        t0_, r0_, u0_, ph0_, pr0_, pu0_,
        hit0,
        jnp.zeros(shape, jnp.int32),
        zeros_k,
        zeros_k,
        zeros_k,
        jnp.zeros(shape, jnp.int32),
        jnp.abs(r0_ - r_ph),
    )
    if jets is not None:
        zj = jnp.zeros(shape, dt)
        carry = carry + ((zj, zj, zj),)
    out = jax.lax.while_loop(cond, body_block, carry)
    _, t, r, u, ph, pr, pu, hit, steps, cr, cp, ct, nc, rmin = out[:14]
    jet = out[14] if jets is not None else None
    hit = jnp.where(hit == I(HIT_NONE), I(HIT_HORIZON), hit)
    return t, r, u, ph, pr, pu, hit, steps, cr, cp, ct, nc, rmin, jet


def march_tile_ab3(m, a, r_h, r_ph, thr, rows0, cfg, approx_recip=False):
    """EXPERIMENTAL variable-step Adams-Bashforth-3 tile march.

    One RHS evaluation per step (the midpoint step pays two): the stepped
    state integrates the quadratic through the last three RHS samples,

        y_{n+1} = y_n + c0 f_n + c1 f_{n-1} + c2 f_{n-2},

    with the variable-step Lagrange-integral coefficients of the step
    history (h = dlam_n, h1 = dlam_{n-1}, h2 = dlam_{n-2}):

        c0 =  (h^3/3 + (2 h1 + h2) h^2/2 + h1 (h1 + h2) h) / (h1 (h1 + h2))
        c1 = -(h^3/3 + (h1 + h2) h^2/2) / (h1 h2)
        c2 =  (h^3/3 + h1 h^2/2) / (h2 (h1 + h2))

    3rd-order accurate at half the RHS evaluations per step; the periodic
    null renormalization holds H = 0 exactly as before (the RHS history
    straddling a renorm carries an O(drift-correction) inconsistency —
    far below the truncation error). Two midpoint bootstrap steps seed the
    history. Gated by MarchConfig.multistep; forward-only (no AD path).

    MEASURED OUTCOME (r4, TPU v5e, 1080p a=0.999 fused spectral): escape-
    direction accuracy matches the midpoint step at the same step_rate
    (12.1 vs 12.8 mrad median at 0.2), but the frame is SLOWER — 18.4 vs
    15.3 ms — because the march loop is latency-bound, not
    throughput-bound: halving the RHS work does not shorten the step's
    dependency chain, while the 14 extra carry rows (two RHS histories +
    step sizes) raise vector-register pressure. Kept as a flag-gated,
    tested negative result; the midpoint step remains production.

    Returns the march_tile tuple (without jets).
    """
    from blackhole_simulation_tpu.ops.ks_kernel import ks_rhs_rows

    t0_, r0_, u0_, ph0_, pr0_, pu0_, pph_ = rows0
    dt = r0_.dtype
    shape = r0_.shape
    F = lambda v: jnp.asarray(v, dt)
    I = lambda v: jnp.asarray(v, jnp.int32)
    k_slots = cfg.max_crossings
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (k_slots,) + shape, 0)
    pt_ = F(-1.0)
    div, recip = make_div_recip(approx_recip)

    hit0 = jnp.where(r0_ < thr, I(HIT_HORIZON), I(HIT_NONE))
    zeros_k = jnp.zeros((k_slots,) + shape, dtype=dt)
    exit_every = min(cfg.exit_check_every, cfg.max_steps)
    hoist_renorm = (cfg.renormalize_every % exit_every) == 0

    def finish_step(carry, i, t, r, u, ph, pr, pu, nt, nr, nu, nph, npr,
                    npu, active, hit, steps, cr, cp, ct, nc, rmin):
        """Shared crossing/sanity/advance epilogue (march_tile twin)."""
        nu = jnp.clip(nu, F(-1.0 + 1e-7), F(1.0 - 1e-7))
        frac = jnp.clip(
            div(u, jnp.where(jnp.abs(u - nu) < F(1e-12), F(1e-12), u - nu)),
            F(0.0), F(1.0),
        )
        r_c = r + frac * (nr - r)
        phi_c = ph + frac * (nph - ph)
        t_c = t + frac * (nt - t)
        maybe = active & ((u * nu) < F(0.0)) & (nc < I(k_slots))
        crossed = (
            maybe & (r_c > F(cfg.record_r_min)) & (r_c < F(cfg.record_r_max))
        )
        mask_k = crossed[None, :] & (nc[None, :] == slot_ids)
        cr = jnp.where(mask_k, r_c[None, :], cr)
        cp = jnp.where(mask_k, phi_c[None, :], cp)
        ct = jnp.where(mask_k, t_c[None, :], ct)
        nc = nc + jnp.where(crossed, I(1), I(0))
        sane = (
            jnp.isfinite(nr) & jnp.isfinite(nph) & jnp.isfinite(npr)
            & jnp.isfinite(npu) & (jnp.abs(npr) < F(1e7))
            & (jnp.abs(npu) < F(1e7)) & (nr < F(8.0 * cfg.escape_radius))
        )
        advance = active & sane
        t = jnp.where(advance, nt, t)
        r = jnp.where(advance, nr, r)
        u = jnp.where(advance, nu, u)
        ph = jnp.where(advance, nph, ph)
        pr = jnp.where(advance, npr, pr)
        pu = jnp.where(advance, npu, pu)
        steps = steps + jnp.where(advance, I(1), I(0))
        rmin = jnp.where(advance, jnp.minimum(rmin, jnp.abs(r - r_ph)), rmin)
        hit = jnp.where(active & ~sane, I(HIT_HORIZON), hit)
        hit = jnp.where(active & (r < thr), I(HIT_HORIZON), hit)
        hit = jnp.where(
            active & (r > F(cfg.escape_radius)), I(HIT_ESCAPE), hit
        )
        return (t, r, u, ph, pr, pu, hit, steps, cr, cp, ct, nc, rmin,
                advance)

    def boot_body(carry):
        """Midpoint bootstrap step that also records (f_n, dlam_n)."""
        (i, t, r, u, ph, pr, pu, hit, steps, cr, cp, ct, nc, rmin,
         f1, f2, h1, h2) = carry
        active = (hit == I(HIT_NONE)) & (i < I(cfg.max_steps))
        f_now = ks_rhs_rows(m, a, r, u, pt_, pr, pu, pph_, recip)
        nt, nr, nu, nph, npr, npu, _, _, _, dlam = diff_step_values(
            m, a, r_h, r_ph, cfg, approx_recip, (t, r, u, ph, pr, pu, pph_)
        )
        (t, r, u, ph, pr, pu, hit, steps, cr, cp, ct, nc, rmin,
         advance) = finish_step(
            carry, i, t, r, u, ph, pr, pu, nt, nr, nu, nph, npr, npu,
            active, hit, steps, cr, cp, ct, nc, rmin,
        )
        sel = lambda new, old: tuple(
            jnp.where(advance, nv, ov) for nv, ov in zip(new, old)
        )
        f2 = sel(f1, f2)
        f1 = sel(f_now, f1)
        h2 = jnp.where(advance, h1, h2)
        h1 = jnp.where(advance, dlam, h1)
        return (i + I(1), t, r, u, ph, pr, pu, hit, steps, cr, cp, ct, nc,
                rmin, f1, f2, h1, h2)

    def ab3_body(carry):
        (i, t, r, u, ph, pr, pu, hit, steps, cr, cp, ct, nc, rmin,
         f1, f2, h1, h2) = carry
        active = (hit == I(HIT_NONE)) & (i < I(cfg.max_steps))

        # dlam chain (diff_step_values twin)
        base = (r - r_h) * F(cfg.step_rate)
        far = jnp.maximum(r / F(cfg.far_boost_radius), F(1.0))
        prox = jnp.clip(
            jnp.abs(r - r_ph) * (F(1.0) / jnp.maximum(r_ph, F(1e-3))),
            F(0.25), F(1.0),
        )
        if cfg.far_step_cap_rate > 0.0:
            cap = jnp.maximum(F(cfg.max_step), F(cfg.far_step_cap_rate) * r)
        else:
            cap = F(cfg.max_step)
        dlam = jnp.clip(base * far * prox, F(cfg.min_step), cap)
        w = jnp.maximum(F(1.0) - u * u, F(w_floor(dt)))
        sig = r * r + a * a * u * u
        du_rate = jnp.abs(w * pu / sig) + F(1e-12)
        margin = F(1.0) - jnp.abs(u) + F(1e-6)
        dlam = jnp.minimum(
            dlam, jnp.maximum(div(F(0.5) * margin, du_rate), F(cfg.min_step))
        )
        # AB stability: bound the step GROWTH ratio (a large h against a
        # small h1/h2 history extrapolates far outside the sample window).
        dlam = jnp.minimum(dlam, F(2.0) * h1)

        f0 = ks_rhs_rows(m, a, r, u, pt_, pr, pu, pph_, recip)
        h12 = h1 + h2
        hh2 = dlam * dlam
        hh3 = hh2 * dlam
        c0 = div(hh3 * F(1.0 / 3.0) + (F(2.0) * h1 + h2) * hh2 * F(0.5)
                 + h1 * h12 * dlam, h1 * h12)
        c1 = -div(hh3 * F(1.0 / 3.0) + h12 * hh2 * F(0.5), h1 * h2)
        c2 = div(hh3 * F(1.0 / 3.0) + h1 * hh2 * F(0.5), h2 * h12)

        nt = t + c0 * f0[0] + c1 * f1[0] + c2 * f2[0]
        nr = r + c0 * f0[1] + c1 * f1[1] + c2 * f2[1]
        nu = u + c0 * f0[2] + c1 * f1[2] + c2 * f2[2]
        nph = ph + c0 * f0[3] + c1 * f1[3] + c2 * f2[3]
        npr = pr + c0 * f0[4] + c1 * f1[4] + c2 * f2[4]
        npu = pu + c0 * f0[5] + c1 * f1[5] + c2 * f2[5]

        (t, r, u, ph, pr, pu, hit, steps, cr, cp, ct, nc, rmin,
         advance) = finish_step(
            carry, i, t, r, u, ph, pr, pu, nt, nr, nu, nph, npr, npu,
            active, hit, steps, cr, cp, ct, nc, rmin,
        )
        sel = lambda new, old: tuple(
            jnp.where(advance, nv, ov) for nv, ov in zip(new, old)
        )
        f2 = sel(f1, f2)
        f1 = sel(f0, f1)
        h2 = jnp.where(advance, h1, h2)
        h1 = jnp.where(advance, dlam, h1)
        return (i + I(1), t, r, u, ph, pr, pu, hit, steps, cr, cp, ct, nc,
                rmin, f1, f2, h1, h2)

    def _apply_renorm(c):
        i, t, r, u, ph, pr, pu, hit = c[:8]
        pr = jnp.where(
            hit == I(HIT_NONE),
            ks_renormalize_pr(m, a, r, u, pt_, pr, pu, pph_),
            pr,
        )
        return (i, t, r, u, ph, pr, pu, hit) + tuple(c[8:])

    def cond(carry):
        i, hit = carry[0], carry[7]
        n_live = jnp.max(jnp.where(hit == I(HIT_NONE), I(1), I(0)))
        return (i < I(cfg.max_steps)) & (n_live > I(0))

    def body_block(carry):
        # Blocks realign to exit_every multiples (the 2-step bootstrap
        # leaves i = 2, so the first block runs exit_every - 2 steps) —
        # otherwise the renorm cadence check would never fire.
        j0 = carry[0]
        limit = (j0 // I(exit_every) + I(1)) * I(exit_every)
        carry = jax.lax.while_loop(
            lambda c: c[0] < limit, ab3_body, carry
        )
        if hoist_renorm:
            due = (carry[0] % I(cfg.renormalize_every)) == I(0)
            carry = jax.lax.cond(due, _apply_renorm, lambda c: c, carry)
        return carry

    zrow = jnp.zeros(shape, dt)
    zeros6 = (zrow,) * 6
    carry = (
        jnp.int32(0), t0_, r0_, u0_, ph0_, pr0_, pu0_, hit0,
        jnp.zeros(shape, jnp.int32), zeros_k, zeros_k, zeros_k,
        jnp.zeros(shape, jnp.int32), jnp.abs(r0_ - r_ph),
        zeros6, zeros6, zrow + F(cfg.min_step), zrow + F(cfg.min_step),
    )
    # Two midpoint bootstrap steps seed the RHS/step history.
    carry = jax.lax.while_loop(lambda c: c[0] < I(2), boot_body, carry)
    out = jax.lax.while_loop(cond, body_block, carry)
    _, t, r, u, ph, pr, pu, hit, steps, cr, cp, ct, nc, rmin = out[:14]
    hit = jnp.where(hit == I(HIT_NONE), I(HIT_HORIZON), hit)
    return t, r, u, ph, pr, pu, hit, steps, cr, cp, ct, nc, rmin, None


def _march_kernel(params_ref, y_ref, thr_ref, yo_ref, hit_ref, steps_ref,
                  cr_ref, cp_ref, ct_ref, nc_ref, rmin_ref, *, cfg,
                  approx_recip=False):
    yt0 = y_ref[0]  # (8, SUB, LANE): 8 state rows, each one full VPU vreg
    # The state is carried as 6 separate evolving rows (t, r, u, phi, p_r,
    # p_u) plus the conserved p_phi row captured by the loop body (p_t is
    # the implicit scalar -1) — not as one (8, SUB, LANE) block. The block
    # form paid zero-row FMAs per RHS eval and 8-row advance selects every
    # step; rows cost exactly what they use.
    m = params_ref[0, 0]
    a = params_ref[0, 1]
    r_h = params_ref[0, 2]
    r_ph = params_ref[0, 3]
    rows0 = (yt0[0], yt0[1], yt0[2], yt0[3], yt0[5], yt0[6], yt0[7])
    tile = march_tile_ab3 if cfg.multistep else march_tile
    t, r, u, ph, pr, pu, hit, steps, cr, cp, ct, nc, rmin, _ = tile(
        m, a, r_h, r_ph, thr_ref[0], rows0, cfg, approx_recip
    )
    yo_ref[0] = jnp.stack(
        [t, r, u, ph, jnp.full_like(t, -1.0), pr, pu, yt0[7]]
    )
    hit_ref[0] = hit
    steps_ref[0] = steps
    cr_ref[0] = cr
    cp_ref[0] = cp
    ct_ref[0] = ct
    nc_ref[0] = nc
    rmin_ref[0] = rmin


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def pallas_march_u(yt0: jnp.ndarray, thr: jnp.ndarray, m, a, r_h, r_ph, cfg,
                   interpret: bool = False):
    """Run the tile-resident march. yt0: (8, N) u-coordinate f32 state
    (pre-renormalized); thr: (N,) per-ray termination radius (horizon_r, or
    the pre-cull stop radius). Returns (yt, hit, steps, cross_r, cross_phi,
    cross_t, ncross, r_min_ph) with the same shapes/meanings as the jnp
    march internals. N is padded to a TILE multiple internally.
    """
    n = yt0.shape[1]
    # Affine-normalize to p_t = -1 (march_rows already does this — an exact
    # multiply-by-one there — but direct callers may pass raw rays): the
    # kernel hard-codes p_t as the scalar -1 and folds its terms.
    inv_e = -1.0 / jnp.where(jnp.abs(yt0[4]) < 1e-12, -1.0, yt0[4])
    yt0 = jnp.concatenate(
        [yt0[:4], -jnp.ones_like(yt0[4:5]), yt0[5:8] * inv_e[None, :]], axis=0
    )
    n_pad = _cdiv(n, TILE) * TILE
    if n_pad != n:
        # Padded rays are born at r = 0 with a huge termination radius:
        # dead at step 0.
        yt0 = jnp.pad(yt0, ((0, 0), (0, n_pad - n)))
        thr = jnp.pad(thr, (0, n_pad - n), constant_values=1e9)
    nb = n_pad // TILE
    # (8, N) -> (nb, 8, SUB, LANE): ray j = i*TILE + s*LANE + l, so each grid
    # program owns one contiguous TILE with every state row a (8, 128) vreg.
    yt0 = yt0.reshape(8, nb, SUB, LANE).transpose(1, 0, 2, 3)
    thr = thr.reshape(nb, SUB, LANE)

    params = jnp.stack(
        [m, a, r_h, r_ph, jnp.zeros_like(m), jnp.zeros_like(m), jnp.zeros_like(m),
         jnp.zeros_like(m)]
    ).reshape(1, 8).astype(yt0.dtype)

    k_slots = cfg.max_crossings
    grid = (nb,)
    # approx reciprocal is a TPU-hardware op; interpret mode keeps the exact
    # divide so CPU tests exercise the same control flow.
    kernel = functools.partial(
        _march_kernel, cfg=cfg, approx_recip=cfg.approx_recip and not interpret
    )

    out_shapes = (
        jax.ShapeDtypeStruct((nb, 8, SUB, LANE), yt0.dtype),       # y out
        jax.ShapeDtypeStruct((nb, SUB, LANE), jnp.int32),          # hit
        jax.ShapeDtypeStruct((nb, SUB, LANE), jnp.int32),          # steps
        jax.ShapeDtypeStruct((nb, k_slots, SUB, LANE), yt0.dtype), # cross_r
        jax.ShapeDtypeStruct((nb, k_slots, SUB, LANE), yt0.dtype), # cross_phi
        jax.ShapeDtypeStruct((nb, k_slots, SUB, LANE), yt0.dtype), # cross_t
        jax.ShapeDtypeStruct((nb, SUB, LANE), jnp.int32),          # ncross
        jax.ShapeDtypeStruct((nb, SUB, LANE), yt0.dtype),          # r_min_ph
    )
    spec4 = lambda rows: pl.BlockSpec(
        (1, rows, SUB, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    spec3 = pl.BlockSpec(
        (1, SUB, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    # Trace the kernel with x64 OFF: the package enables x64 globally for the
    # f64 oracle layer, but inside a Pallas TPU kernel any stray 64-bit
    # literal (index-map ints, where/clip scalars) either recurses mosaic's
    # emulation lowering or fails to legalize. All operands here are already
    # concrete 32-bit.
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # params (1, 8)
                spec4(8),
                spec3,
            ],
            out_specs=(
                spec4(8),
                spec3,
                spec3,
                spec4(k_slots),
                spec4(k_slots),
                spec4(k_slots),
                spec3,
                spec3,
            ),
            out_shape=out_shapes,
            interpret=interpret,
        )(params, yt0, thr)

    yt, hit, steps, cr, cp, ct, nc, rmin = outs
    sl = slice(0, n)
    flat3 = lambda x: x.reshape(n_pad)[sl]
    flat4 = lambda x, rows: x.transpose(1, 0, 2, 3).reshape(rows, n_pad)[:, sl]
    return (
        flat4(yt, 8),
        flat3(hit),
        flat3(steps),
        flat4(cr, k_slots),
        flat4(cp, k_slots),
        flat4(ct, k_slots),
        flat3(nc),
        flat3(rmin),
    )
