"""Single-step geodesic integrators: RKF45, RK4, symplectic implicit midpoint.

Capability parity with reference gravitas-core/src/geodesic/integrator.rs:
 - ``rkf45_step``     — Runge-Kutta-Fehlberg 4(5) embedded pair returning the
                        5th-order state and a 4th-vs-5th error estimate
                        (integrator.rs:113-190),
 - ``rk4_step``       — classic fixed-step RK4 (integrator.rs:193-203),
 - ``step_controller``— the adaptive step-size law used by the batched driver:
                        grow err_ratio^-0.2 capped at 5x, shrink ^-0.25 floored
                        at 0.1x, safety 0.9, with a forced min-step acceptance
                        fallback (integrator.rs:53-108),
 - ``symplectic_step``— implicit midpoint with a fixed number of fixed-point
                        iterations (integrator.rs:209-226).

TPU-first design: every step function is a pure batched map ``(..., 8) ->
(..., 8)``; the reference's accept/reject *inner* loop becomes a per-ray
accept mask applied by the driver (geodesic/integrate.py) inside one bounded
``lax.while_loop`` — no nested data-dependent loops, so the whole integration
jits and differentiates.
"""

from __future__ import annotations

import dataclasses
import enum
from functools import partial

import jax
import jax.numpy as jnp

from blackhole_simulation_tpu.geodesic.hamiltonian import state_derivative


class IntegrationMethod(enum.Enum):
    """Mirror of the reference's IntegrationMethod (integrator.rs)."""

    RKF45 = "rkf45"
    RK4 = "rk4"
    SYMPLECTIC = "symplectic"


@dataclasses.dataclass(frozen=True)
class IntegrationOptions:
    """Mirror of IntegrationOptions defaults (integrator.rs:35-47).

    All fields are static (Python) values: they select the traced program.
    """

    method: IntegrationMethod = IntegrationMethod.RKF45
    tolerance: float = 1e-8
    initial_step: float = 1e-2
    max_steps: int = 10_000
    escape_radius: float = 1000.0
    renormalize_interval: int = 10
    min_step: float = 1e-5
    max_step: float = 10.0
    safety: float = 0.9
    horizon_factor: float = 1.001  # terminate at r < factor * r_+


# Fehlberg 4(5) Butcher tableau (integrator.rs:113-190).
_B21 = 1.0 / 4.0
_B31, _B32 = 3.0 / 32.0, 9.0 / 32.0
_B41, _B42, _B43 = 1932.0 / 2197.0, -7200.0 / 2197.0, 7296.0 / 2197.0
_B51, _B52, _B53, _B54 = 439.0 / 216.0, -8.0, 3680.0 / 513.0, -845.0 / 4104.0
_B61, _B62, _B63, _B64, _B65 = (
    -8.0 / 27.0,
    2.0,
    -3544.0 / 2565.0,
    1859.0 / 4104.0,
    -11.0 / 40.0,
)
# 5th-order solution weights
_C1, _C3, _C4, _C5, _C6 = (
    16.0 / 135.0,
    6656.0 / 12825.0,
    28561.0 / 56430.0,
    -9.0 / 50.0,
    2.0 / 55.0,
)
# 4th-order solution weights (for the embedded error estimate)
_D1, _D3, _D4, _D5 = 25.0 / 216.0, 1408.0 / 2565.0, 2197.0 / 4104.0, -1.0 / 5.0


def rkf45_step(metric, y: jnp.ndarray, h: jnp.ndarray):
    """One Fehlberg 4(5) step. y: (...,8), h: (...) -> (y5, err).

    Returns the 5th-order state and the max-abs componentwise difference
    between the embedded 4th- and 5th-order solutions (per ray).
    """
    hh = h[..., None]
    k1 = state_derivative(metric, y)
    k2 = state_derivative(metric, y + hh * _B21 * k1)
    k3 = state_derivative(metric, y + hh * (_B31 * k1 + _B32 * k2))
    k4 = state_derivative(metric, y + hh * (_B41 * k1 + _B42 * k2 + _B43 * k3))
    k5 = state_derivative(
        metric, y + hh * (_B51 * k1 + _B52 * k2 + _B53 * k3 + _B54 * k4)
    )
    k6 = state_derivative(
        metric,
        y + hh * (_B61 * k1 + _B62 * k2 + _B63 * k3 + _B64 * k4 + _B65 * k5),
    )
    y5 = y + hh * (_C1 * k1 + _C3 * k3 + _C4 * k4 + _C5 * k5 + _C6 * k6)
    y4 = y + hh * (_D1 * k1 + _D3 * k3 + _D4 * k4 + _D5 * k5)
    err = jnp.max(jnp.abs(y5 - y4), axis=-1)
    return y5, err


def rk4_step(metric, y: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """One classic RK4 step (integrator.rs:193-203). y: (...,8), h: (...)."""
    hh = h[..., None]
    k1 = state_derivative(metric, y)
    k2 = state_derivative(metric, y + 0.5 * hh * k1)
    k3 = state_derivative(metric, y + 0.5 * hh * k2)
    k4 = state_derivative(metric, y + hh * k3)
    return y + hh / 6.0 * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def symplectic_step(
    metric, y: jnp.ndarray, h: jnp.ndarray, iterations: int = 2
) -> jnp.ndarray:
    """Implicit-midpoint step with fixed-point iterations (integrator.rs:209-226).

    y_{n+1} = y_n + h f((y_n + y_{n+1})/2), solved by `iterations` rounds of
    fixed-point iteration seeded with an explicit Euler guess. Nearly
    time-reversible — the property the fast differentiable path exploits.
    """
    hh = h[..., None]
    y_next = y + hh * state_derivative(metric, y)
    for _ in range(iterations):
        y_next = y + hh * state_derivative(metric, 0.5 * (y + y_next))
    return y_next


@partial(jax.jit, static_argnames=("safety", "min_step", "max_step"))
def step_controller(
    h: jnp.ndarray,
    err: jnp.ndarray,
    tolerance: float,
    safety: float = 0.9,
    min_step: float = 1e-5,
    max_step: float = 10.0,
):
    """Per-ray adaptive step-size law (integrator.rs:53-108), vectorized.

    Returns ``(accept, h_next)``:
      - accept where err <= tol, or where h has already hit min_step (the
        reference's forced min-step fallback),
      - on accept: h *= clip(safety * ratio^-0.2, ..., 5.0),
      - on reject: h *= clip(safety * ratio^-0.25, 0.1, ...),
    with h clipped to [min_step, max_step]. err == 0 grows at the 5x cap.
    """
    ratio = err / tolerance
    at_floor = h <= min_step * (1.0 + 1e-12)
    accept = (ratio <= 1.0) | at_floor
    safe_ratio = jnp.maximum(ratio, 1e-30)
    grow = jnp.minimum(safety * safe_ratio ** (-0.2), 5.0)
    shrink = jnp.maximum(safety * safe_ratio ** (-0.25), 0.1)
    factor = jnp.where(accept, grow, shrink)
    h_next = jnp.clip(h * factor, min_step, max_step)
    return accept, h_next
