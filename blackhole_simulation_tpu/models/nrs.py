"""Neural Radiance Surrogate: MLP approximating far-field geodesic optics.

Capability parity with the reference's legacy NrsTrainer
(physics-engine/_legacy_src/training.rs:14-80): a 4-layer, 16-wide MLP
(flat weight buffer, deterministic init) trained against the geodesic
integrator to predict per-ray observables from (impact parameter b,
observer inclination theta, spin a) — here (deflection angle, coordinate
time delay, escape logit). Inference is a batched jnp forward pass suitable
for skipping the full march on far-field rays (the reference's roadmap use,
shaders/compute/mlp.wgsl).

TPU-first: the whole training set is generated in one batched f64 oracle
integration; training is full-batch Adam under jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
from blackhole_simulation_tpu.geodesic import (
    IntegrationOptions,
    TERM_ESCAPE,
    integrate,
    null_ray,
)

NRS_LAYERS = 4
NRS_HIDDEN = 16
_IN, _OUT = 3, 3


def nrs_init(seed: int = 0):
    """Deterministic Xavier-style init (training.rs flat-buffer init)."""
    key = jax.random.PRNGKey(seed)
    sizes = [_IN] + [NRS_HIDDEN] * (NRS_LAYERS - 1) + [_OUT]
    params = []
    for i, (fan_in, fan_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, sub = jax.random.split(key)
        scale = jnp.sqrt(2.0 / (fan_in + fan_out))
        w = jax.random.normal(sub, (fan_in, fan_out), jnp.float32) * scale
        params.append((w, jnp.zeros((fan_out,), jnp.float32)))
    return params


def nrs_apply(params, x: jnp.ndarray) -> jnp.ndarray:
    """Forward pass: x (..., 3) -> (..., 3) = (deflection, delay, escape logit)."""
    h = x
    for i, (w, b) in enumerate(params):
        h = h @ w + b
        if i < len(params) - 1:
            h = jnp.tanh(h)
    return h


def nrs_flat_weights(params) -> np.ndarray:
    """Flatten to the reference's single weight buffer layout."""
    return np.concatenate([np.asarray(t).ravel() for w_b in params for t in w_b])


def nrs_from_flat(flat: np.ndarray):
    """Inverse of nrs_flat_weights."""
    sizes = [_IN] + [NRS_HIDDEN] * (NRS_LAYERS - 1) + [_OUT]
    params, off = [], 0
    for fan_in, fan_out in zip(sizes[:-1], sizes[1:]):
        w = flat[off : off + fan_in * fan_out].reshape(fan_in, fan_out)
        off += fan_in * fan_out
        b = flat[off : off + fan_out]
        off += fan_out
        params.append((jnp.asarray(w, jnp.float32), jnp.asarray(b, jnp.float32)))
    return params


def generate_training_data(
    n: int = 256,
    spin_range=(-0.99, 0.99),
    b_range=(3.0, 40.0),
    r0: float = 200.0,
    seed: int = 0,
):
    """Oracle-labeled dataset: inputs (b, theta_obs, a) normalized, targets
    (deflection, time delay vs flat, escaped flag). One batched f64 RKF45
    integration labels the whole set (training.rs generates per-sample)."""
    rng = np.random.default_rng(seed)
    b = rng.uniform(*b_range, n)
    a = rng.uniform(*spin_range, n)
    theta = np.full(n, np.pi / 2)  # equatorial family, like the reference

    def one(bi, ai):
        bh = Kerr(mass=jnp.asarray(1.0), spin=jnp.asarray(ai), chart=KS)
        x = jnp.array([0.0, r0, jnp.pi / 2, 0.0])
        y0 = null_ray(x, jnp.array([-1.0, 0.0, bi]), bh)
        traj = integrate(
            y0, bh, IntegrationOptions(max_steps=30_000, escape_radius=r0 * 1.5)
        )
        esc = (traj.termination == TERM_ESCAPE).astype(jnp.float64)
        phi_out = traj.final_state[3]
        r_out = traj.final_state[1]
        pr, pph = traj.final_state[5], traj.final_state[7]
        out_angle = jnp.arctan2(pph / r_out, pr)
        in_angle = jnp.arcsin(jnp.clip(jnp.abs(bi) / r0, 0.0, 1.0)) * jnp.sign(bi)
        deflection = jnp.where(esc > 0, phi_out + out_angle + in_angle - jnp.pi, 0.0)
        delay = jnp.where(esc > 0, traj.final_state[0] - (r_out - r0), 0.0)
        return deflection, delay, esc

    deflection, delay, esc = jax.vmap(one)(jnp.asarray(b), jnp.asarray(a))
    x = np.stack([b / b_range[1], theta / np.pi, a], axis=-1).astype(np.float32)
    y = np.stack(
        [np.asarray(deflection), np.asarray(delay) / 50.0, np.asarray(esc)], axis=-1
    ).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def train_nrs(x, y, n_steps: int = 500, lr: float = 3e-3, seed: int = 0):
    """Full-batch Adam on MSE; returns (params, loss_history)."""
    params = nrs_init(seed)

    def loss_fn(p):
        pred = nrs_apply(p, x)
        return jnp.mean((pred - y) ** 2)

    opt_m = jax.tree.map(jnp.zeros_like, params)
    opt_v = jax.tree.map(jnp.zeros_like, params)

    @jax.jit
    def step(p, m, v, t):
        loss, g = jax.value_and_grad(loss_fn)(p)
        m = jax.tree.map(lambda mm, gg: 0.9 * mm + 0.1 * gg, m, g)
        v = jax.tree.map(lambda vv, gg: 0.999 * vv + 0.001 * gg * gg, v, g)
        mhat = jax.tree.map(lambda mm: mm / (1 - 0.9**t), m)
        vhat = jax.tree.map(lambda vv: vv / (1 - 0.999**t), v)
        p = jax.tree.map(
            lambda pp, mm, vv: pp - lr * mm / (jnp.sqrt(vv) + 1e-8), p, mhat, vhat
        )
        return p, m, v, loss

    losses = []
    for t in range(1, n_steps + 1):
        params, opt_m, opt_v, loss = step(params, opt_m, opt_v, float(t))
        if t % 50 == 0 or t == 1:
            losses.append(float(loss))
    return params, losses
