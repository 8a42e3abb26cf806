"""High-level trajectory driver: batched adaptive integration to termination.

Capability parity with reference gravitas-core/src/geodesic/mod.rs:180-266
(`integrate` -> Trajectory{final_state, termination, steps_taken,
max_hamiltonian_drift, path}) and termination.rs:6-17 — re-designed TPU-first:

 - ALL rays integrate together inside ONE bounded ``lax.while_loop``; each
   ray carries its own adaptive step size, step count, termination code, and
   max |H| drift. Finished rays freeze (masked updates) while live rays march.
 - The reference's nested accept/reject loop (AdaptiveStepper) is flattened:
   every while-loop trip is one *attempted* step, accepted per-ray by the
   step controller. The trip budget is ``max_trials`` attempts.
 - Periodic null renormalization (every ``renormalize_interval`` accepted
   steps) projects p_r back to H = 0, mirroring mod.rs:229-231.
 - ``integrate_path`` records the trajectory with a fixed-length ``lax.scan``
   (fixed-step RK4/symplectic), the shape-static analogue of record_path.

Termination codes are small ints (a jnp-friendly TerminationReason):
    0 NONE / 1 HORIZON / 2 ESCAPE / 3 MAX_STEPS / 4 DISK_CROSSING.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from blackhole_simulation_tpu.geodesic.integrator import (
    IntegrationMethod,
    IntegrationOptions,
    rk4_step,
    rkf45_step,
    step_controller,
    symplectic_step,
)
from blackhole_simulation_tpu.geodesic.invariants import hamiltonian, renormalize_null

TERM_NONE = 0
TERM_HORIZON = 1
TERM_ESCAPE = 2
TERM_MAX_STEPS = 3
TERM_DISK = 4

TERMINATION_NAMES = ("none", "horizon", "escape", "max_steps", "disk_crossing")


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["final_state", "termination", "steps_taken", "max_hamiltonian_drift", "path"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class Trajectory:
    """Result bundle, batched over leading ray axes (mod.rs Trajectory)."""

    final_state: jnp.ndarray        # (..., 8)
    termination: jnp.ndarray        # (...) int32 TERM_* code
    steps_taken: jnp.ndarray        # (...) int32 accepted steps
    max_hamiltonian_drift: jnp.ndarray  # (...)
    path: jnp.ndarray | None = None     # (n_steps, ..., 8) when recorded


def _classify_termination(y, term, steps, metric, opts: IntegrationOptions):
    """Apply the reference's termination rules (mod.rs:256-266) to live rays."""
    r = y[..., 1]
    horizon = opts.horizon_factor * metric.event_horizon()
    live = term == TERM_NONE
    term = jnp.where(live & (r < horizon), TERM_HORIZON, term)
    term = jnp.where(live & (r > opts.escape_radius), TERM_ESCAPE, term)
    term = jnp.where(
        (term == TERM_NONE) & (steps >= opts.max_steps), TERM_MAX_STEPS, term
    )
    return term


def integrate(
    y0: jnp.ndarray, metric, opts: IntegrationOptions = IntegrationOptions()
) -> Trajectory:
    """Integrate a batch of null rays to termination. y0: (..., 8).

    The f64 oracle driver — mirrors gravitas-core geodesic/mod.rs:180-253.
    jit-compatible; `opts` and `metric.chart` select the traced program.
    """
    y0 = renormalize_null(jnp.asarray(y0), metric)
    batch_shape = y0.shape[:-1]
    h0 = jnp.full(batch_shape, opts.initial_step, dtype=y0.dtype)
    term0 = jnp.zeros(batch_shape, dtype=jnp.int32)
    steps0 = jnp.zeros(batch_shape, dtype=jnp.int32)
    drift0 = jnp.zeros(batch_shape, dtype=y0.dtype)
    term0 = _classify_termination(y0, term0, steps0, metric, opts)

    adaptive = opts.method is IntegrationMethod.RKF45
    # Attempt budget: adaptive integration may reject steps; give it headroom.
    max_trials = opts.max_steps * (2 if adaptive else 1)

    def cond(carry):
        _, _, term, _, _, trials = carry
        return (trials < max_trials) & jnp.any(term == TERM_NONE)

    def body(carry):
        y, h, term, steps, drift, trials = carry
        live = term == TERM_NONE

        if adaptive:
            y_trial, err = rkf45_step(metric, y, h)
            accept, h = step_controller(
                h,
                err,
                opts.tolerance,
                safety=opts.safety,
                min_step=opts.min_step,
                max_step=opts.max_step,
            )
        else:
            step = rk4_step if opts.method is IntegrationMethod.RK4 else symplectic_step
            y_trial = step(metric, y, h)
            accept = jnp.ones_like(live)

        advance = live & accept
        y = jnp.where(advance[..., None], y_trial, y)
        steps = steps + advance.astype(jnp.int32)

        # Periodic null renormalization (mod.rs:229-231).
        renorm_due = advance & (steps % opts.renormalize_interval == 0)
        y = jnp.where(renorm_due[..., None], renormalize_null(y, metric), y)

        # Track max |H| drift on live rays (mod.rs:234-237).
        h_now = jnp.abs(hamiltonian(y, metric))
        drift = jnp.where(advance, jnp.maximum(drift, h_now), drift)

        term = _classify_termination(y, term, steps, metric, opts)
        return y, h, term, steps, drift, trials + 1

    y, h, term, steps, drift, trials = jax.lax.while_loop(
        cond, body, (y0, h0, term0, steps0, drift0, jnp.int32(0))
    )
    # Rays still live when the attempt budget ran out hit the step ceiling.
    term = jnp.where(term == TERM_NONE, TERM_MAX_STEPS, term)
    return Trajectory(
        final_state=y,
        termination=term,
        steps_taken=steps,
        max_hamiltonian_drift=drift,
    )


def integrate_path(
    y0: jnp.ndarray,
    metric,
    n_steps: int = 1000,
    step_size: float = 1e-2,
    method: IntegrationMethod = IntegrationMethod.RK4,
    opts: IntegrationOptions = IntegrationOptions(),
) -> Trajectory:
    """Fixed-step integration that records the full path (record_path analogue).

    Runs `n_steps` fixed-size steps under ``lax.scan``; rays freeze once
    terminated. Returns Trajectory with ``path`` of shape (n_steps+1, ..., 8).
    """
    y0 = renormalize_null(jnp.asarray(y0), metric)
    batch_shape = y0.shape[:-1]
    h = jnp.full(batch_shape, step_size, dtype=y0.dtype)
    term0 = jnp.zeros(batch_shape, dtype=jnp.int32)
    steps0 = jnp.zeros(batch_shape, dtype=jnp.int32)
    drift0 = jnp.zeros(batch_shape, dtype=y0.dtype)
    step = rk4_step if method is IntegrationMethod.RK4 else symplectic_step
    run_opts = dataclasses.replace(opts, max_steps=n_steps)

    def body(carry, _):
        y, term, steps, drift = carry
        live = term == TERM_NONE
        y_next = step(metric, y, h)
        y = jnp.where(live[..., None], y_next, y)
        steps = steps + live.astype(jnp.int32)
        renorm_due = live & (steps % opts.renormalize_interval == 0)
        y = jnp.where(renorm_due[..., None], renormalize_null(y, metric), y)
        drift = jnp.where(live, jnp.maximum(drift, jnp.abs(hamiltonian(y, metric))), drift)
        term = _classify_termination(y, term, steps, metric, run_opts)
        return (y, term, steps, drift), y

    (y, term, steps, drift), path = jax.lax.scan(
        body, (y0, term0, steps0, drift0), None, length=n_steps
    )
    term = jnp.where(term == TERM_NONE, TERM_MAX_STEPS, term)
    path = jnp.concatenate([y0[None], path], axis=0)
    return Trajectory(
        final_state=y,
        termination=term,
        steps_taken=steps,
        max_hamiltonian_drift=drift,
        path=path,
    )
