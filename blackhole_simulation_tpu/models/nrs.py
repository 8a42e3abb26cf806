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


def nrs_far_field_rows(params, rays_u, bh, b_min: float = 12.0):
    """Far-field march skip (the reference's NRS roadmap use,
    _legacy_src/training.rs + shaders/compute/mlp.wgsl): for rays whose
    total impact parameter b = sqrt(eta + lambda^2) exceeds ``b_min``, the
    surrogate's deflection angle replaces the march — the incoming
    direction is rotated by alpha(b) about the orbital-plane normal
    (Rodrigues), toward the hole.

    ``rays_u``: (8, N) u-chart rows with p_t = -1. Returns
    (far_mask (N,), (dx, dy, dz) deflected escape-direction rows). The
    caller composites starfield(dirs) into far pixels and terminates their
    march at birth (render/pipeline.py, Features.nrs_far_field).
    """
    from blackhole_simulation_tpu.render.shading import (
        escape_direction_u_rows,
    )

    dt = rays_u.dtype
    r, u, ph = rays_u[1], rays_u[2], rays_u[3]
    pu, pph = rays_u[6], rays_u[7]
    w = jnp.maximum(1.0 - u * u, 1e-12)
    lam = pph  # p_t = -1
    eta = pu * pu * w + u * u * (pph * pph / w - bh.spin.astype(dt) ** 2)
    b = jnp.sqrt(jnp.maximum(eta + lam * lam, 1e-12))
    far = b > b_min

    # Incoming travel direction and position in Cartesian.
    rows = tuple(rays_u[i] for i in range(8))
    vx, vy, vz = escape_direction_u_rows(rows, bh)
    s = jnp.sqrt(w)
    px = r * s * jnp.cos(ph)
    py = r * s * jnp.sin(ph)
    pz = r * u

    # Surrogate deflection at (b, theta_obs, a); input normalization as in
    # generate_training_data. Deflection sign: the equatorial family is
    # labeled with signed b (prograde/retrograde); a general ray's bend is
    # toward the hole in its own orbital plane, so evaluate at |b| with the
    # ray's prograde sign lam/|lam| folded into the rotation axis below.
    theta_row = jnp.arccos(jnp.clip(u, -1.0, 1.0))
    x_in = jnp.stack(
        [jnp.abs(b) / 40.0, theta_row / jnp.pi,
         jnp.broadcast_to(bh.spin.astype(dt), b.shape)], axis=-1
    )
    pred = nrs_apply(params, x_in)
    alpha = pred[..., 0]

    # Rotation axis: orbital-plane normal oriented so positive alpha bends
    # the direction toward the hole (n = normalize(P x V): empirically
    # validated against the marched escape direction — the flipped axis
    # doubles the error instead of removing it).
    nx = py * vz - pz * vy
    ny = pz * vx - px * vz
    nz = px * vy - py * vx
    inv_n = 1.0 / jnp.sqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
    nx, ny, nz = nx * inv_n, ny * inv_n, nz * inv_n
    ca = jnp.cos(alpha)
    sa = jnp.sin(alpha)
    # Rodrigues (n . v = 0 for the orbital normal): v' = v c + (n x v) s
    cx = ny * vz - nz * vy
    cy = nz * vx - nx * vz
    cz = nx * vy - ny * vx
    dx = vx * ca + cx * sa
    dy = vy * ca + cy * sa
    dz = vz * ca + cz * sa
    return far, (dx, dy, dz)


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
