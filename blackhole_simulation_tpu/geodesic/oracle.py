"""Oracle march: the f64 adaptive-RKF45 integrator driving a MarchResult.

The reference validates its GPU march against the f64 CPU RKF45 integrator
(gravitas-core/src/geodesic/integrator.rs:113-190 as oracle, driven by
geodesic/mod.rs:180-253). This module is that oracle made *consumable by
the render pipeline*: it integrates camera rays with the per-ray adaptive
Fehlberg stepper (geodesic/integrator.py), records equatorial-plane
crossings and the photon-ring proximity minimum exactly like the fast
march (render/march.py), and returns a MarchResult — so the SAME shading
code produces an oracle image, and the BASELINE gate (image and
d(pixel)/d(spin) allclose vs the f64 reference at a = 0.999) is a direct
comparison of two MarchResult-driven renders.

Unlike the fast march (fixed-trip fori_loop, fixed curvature-adaptive
step), this path uses error-controlled steps with accept/reject (tolerance
1e-8 by default, integrator.rs:38-45) in f64 — slower, but the ground
truth.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from blackhole_simulation_tpu.geodesic.integrate import TERM_NONE
from blackhole_simulation_tpu.geodesic.integrator import (
    IntegrationOptions,
    rkf45_step,
    step_controller,
)
from blackhole_simulation_tpu.geodesic.invariants import renormalize_null
from blackhole_simulation_tpu.render.march import (
    HIT_ESCAPE,
    HIT_HORIZON,
    HIT_NONE,
    MarchConfig,
    MarchResult,
)


def oracle_march(
    y0: jnp.ndarray,
    bh,
    cfg: MarchConfig = MarchConfig(),
    opts: IntegrationOptions | None = None,
) -> MarchResult:
    """March (N, 8) theta-form KS rays with the f64 RKF45 oracle.

    ``cfg`` supplies the *termination geometry* (horizon factor, escape
    radius, crossing-record window and slot count) so the oracle and the
    fast march disagree only through integration error, never through
    different exit rules. ``opts`` tunes the stepper (tolerance etc.).
    """
    opts = opts or IntegrationOptions(
        tolerance=1e-10,
        max_steps=20_000,
        escape_radius=cfg.escape_radius,
        horizon_factor=cfg.horizon_factor,
    )
    y0 = jnp.asarray(y0, jnp.float64)
    y0 = renormalize_null(y0, bh)
    n = y0.shape[0]
    k_slots = cfg.max_crossings
    dtype = y0.dtype

    r_h = bh.event_horizon().astype(dtype)
    r_ph = bh.photon_sphere().astype(dtype)
    horizon_r = cfg.horizon_factor * r_h
    slot_ids = jnp.arange(k_slots)

    h0 = jnp.full((n,), opts.initial_step, dtype)
    hit0 = jnp.where(y0[:, 1] < horizon_r, HIT_HORIZON, HIT_NONE).astype(jnp.int32)
    zeros_k = jnp.zeros((k_slots, n), dtype)
    max_trials = opts.max_steps * 2

    def cond(carry):
        trials, _, _, hit = carry[0], carry[1], carry[2], carry[3]
        return (trials < max_trials) & jnp.any(hit == HIT_NONE)

    def body(carry):
        trials, y, h, hit, steps, cr, cp, ct, nc, rmin = carry
        live = hit == HIT_NONE

        y_trial, err = rkf45_step(bh, y, h)
        accept, h = step_controller(
            h, err, opts.tolerance,
            safety=opts.safety, min_step=opts.min_step, max_step=opts.max_step,
        )
        advance = live & accept

        # Equator-crossing record in u = cos(theta), the same interpolation
        # variable as the fast march so the records are comparable.
        u_old = jnp.cos(y[:, 2])
        u_new = jnp.cos(y_trial[:, 2])
        frac = jnp.clip(
            u_old
            / jnp.where(jnp.abs(u_old - u_new) < 1e-30, 1e-30, u_old - u_new),
            0.0,
            1.0,
        )
        r_c = y[:, 1] + frac * (y_trial[:, 1] - y[:, 1])
        phi_c = y[:, 3] + frac * (y_trial[:, 3] - y[:, 3])
        t_c = y[:, 0] + frac * (y_trial[:, 0] - y[:, 0])
        crossed = (
            advance
            & ((u_old * u_new) < 0.0)
            & (r_c > cfg.record_r_min)
            & (r_c < cfg.record_r_max)
            & (nc < k_slots)
        )
        mask_k = crossed[None, :] & (nc[None, :] == slot_ids[:, None])
        cr = jnp.where(mask_k, jnp.where(crossed, r_c, 0.0)[None, :], cr)
        cp = jnp.where(mask_k, jnp.where(crossed, phi_c, 0.0)[None, :], cp)
        ct = jnp.where(mask_k, jnp.where(crossed, t_c, 0.0)[None, :], ct)
        nc = nc + crossed.astype(jnp.int32)

        y = jnp.where(advance[:, None], y_trial, y)
        steps = steps + advance.astype(jnp.int32)
        rmin = jnp.where(
            advance, jnp.minimum(rmin, jnp.abs(y[:, 1] - r_ph)), rmin
        )

        renorm_due = advance & (steps % opts.renormalize_interval == 0)
        y = jnp.where(renorm_due[:, None], renormalize_null(y, bh), y)

        hit = jnp.where(live & (y[:, 1] < horizon_r), HIT_HORIZON, hit)
        hit = jnp.where(live & (y[:, 1] > opts.escape_radius), HIT_ESCAPE, hit)
        return trials + 1, y, h, hit, steps, cr, cp, ct, nc, rmin

    carry = (
        jnp.int32(0), y0, h0, hit0,
        jnp.zeros((n,), jnp.int32),
        zeros_k, zeros_k, zeros_k,
        jnp.zeros((n,), jnp.int32),
        jnp.abs(y0[:, 1] - r_ph),
    )
    _, y, h, hit, steps, cr, cp, ct, nc, rmin = jax.lax.while_loop(
        cond, body, carry
    )
    # Budget exhausted while live -> closest to horizon-bound (the fast
    # march's classification of max-step rays).
    hit = jnp.where(hit == HIT_NONE, HIT_HORIZON, hit)
    return MarchResult(
        state=y,
        hit=hit,
        steps=steps,
        cross_r=cr.T,
        cross_phi=cp.T,
        cross_t=ct.T,
        n_crossings=nc,
        jet_radiance=jnp.zeros((n, 3), dtype),
        r_min_ph=rmin,
    )
