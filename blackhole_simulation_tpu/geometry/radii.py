"""Free-function derived radii (convenience wrappers over geometry.metrics.Kerr).

Mirrors the scalar `compute_*` API the reference exposes through its FFI facade
(gravitas-wasm/src/lib.rs:85-105: compute_horizon/isco/photon_sphere/dilation).
"""

from __future__ import annotations

import jax.numpy as jnp

from blackhole_simulation_tpu.geometry.metrics import Kerr


def _kerr(m, a) -> Kerr:
    return Kerr(mass=jnp.asarray(m), spin=jnp.asarray(a))


def event_horizon(m, a):
    return _kerr(m, a).event_horizon()


def cauchy_horizon(m, a):
    return _kerr(m, a).cauchy_horizon()


def photon_sphere(m, a, prograde: bool = True):
    return _kerr(m, a).photon_sphere(prograde)


def isco(m, a, prograde: bool = True):
    return _kerr(m, a).isco(prograde)


def ergosphere(m, a, theta):
    return _kerr(m, a).ergosphere(theta)


def frame_dragging(m, a, r, theta):
    return _kerr(m, a).frame_dragging(r, theta)


def keplerian_omega(m, a, r, prograde: bool = True):
    return _kerr(m, a).keplerian_omega(r, prograde)


def time_dilation(m, a, r, theta=jnp.pi / 2):
    return _kerr(m, a).time_dilation(r, theta)
