"""Sparse scalar-component Kerr-Schild geodesic kernel (the hot path).

Everything is flat (...,) lane arrays — zero 4x4 tensors, zero einsums, zero
autodiff inside the step. The Hamiltonian derivatives are hand-derived
closed forms of the ingoing-KS Hamiltonian

    H = 1/2 [ -(1+h) p_t^2 + 2 h p_t p_r + (D/S) p_r^2 + (2a/S) p_r p_phi
              + p_th^2 / S + p_phi^2 / (S s2) ],

    h = 2 M r / S,  S = r^2 + a^2 cos^2(th),  D = r^2 - 2 M r + a^2,
    s2 = sin^2(th),

the same analytic-expansion strategy as the reference's hand-expanded
Kerr-Schild derivatives (gravitas-core/src/metric/kerr.rs:442-499), derived
independently for this exact form. Validated against the autodiff metric
path (tests/test_ops.py) to fp64 round-off.

Derivatives used (S_r = 2r, S_th = -a^2 sin(2 th), D_r = 2r - 2M):
    h_r      = 2M (S - 2 r^2) / S^2
    h_th     = -2 M r S_th / S^2
    (D/S)_r  = (D_r S - D S_r) / S^2
    (D/S)_th = -D S_th / S^2
    (1/S)_r  = -S_r / S^2        (1/S)_th  = -S_th / S^2
    (1/(S s2))_r  = -S_r / (S^2 s2)
    (1/(S s2))_th = -(S_th s2 + S sin(2 th)) / (S s2)^2
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SIN2_EPS = 1e-12


def _geom(m, a, r, th):
    """Shared geometric quantities for one evaluation point."""
    s = jnp.sin(th)
    c = jnp.cos(th)
    s2 = jnp.maximum(s * s, _SIN2_EPS)
    sin2t = 2.0 * s * c  # sin(2 th)
    S = r * r + a * a * c * c
    D = r * r - 2.0 * m * r + a * a
    inv_S = 1.0 / S
    h = 2.0 * m * r * inv_S
    return s2, sin2t, S, D, inv_S, h


def ks_hamiltonian(m, a, y):
    """H for packed state y: (...,8) -> (...). Sparse scalar form."""
    r, th = y[..., 1], y[..., 2]
    pt, pr, pth, pph = y[..., 4], y[..., 5], y[..., 6], y[..., 7]
    s2, _, S, D, inv_S, h = _geom(m, a, r, th)
    return 0.5 * (
        -(1.0 + h) * pt * pt
        + 2.0 * h * pt * pr
        + D * inv_S * pr * pr
        + 2.0 * a * inv_S * pr * pph
        + pth * pth * inv_S
        + pph * pph * inv_S / s2
    )


def ks_rhs(m, a, y):
    """dy/dlambda for the ingoing-KS chart, packed (...,8) -> (...,8).

    dx^mu/dlam = g^{mu nu} p_nu with the sparse contravariant components
    (g^tt=-(1+h), g^tr=h, g^rr=D/S, g^rphi=a/S, g^thth=1/S,
    g^phph=1/(S s2)); dp_r = -dH/dr, dp_th = -dH/dth; p_t, p_phi conserved.
    """
    r, th = y[..., 1], y[..., 2]
    pt, pr, pth, pph = y[..., 4], y[..., 5], y[..., 6], y[..., 7]
    s2, sin2t, S, D, inv_S, h = _geom(m, a, r, th)
    inv_S2 = inv_S * inv_S

    # --- dx/dlam ---
    dt = -(1.0 + h) * pt + h * pr
    dr = h * pt + D * inv_S * pr + a * inv_S * pph
    dth = pth * inv_S
    dph = a * inv_S * pr + pph * inv_S / s2

    # --- dH/dr ---
    S_r = 2.0 * r
    D_r = 2.0 * r - 2.0 * m
    h_r = 2.0 * m * (S - 2.0 * r * r) * inv_S2
    DS_r = (D_r * S - D * S_r) * inv_S2
    invS_r = -S_r * inv_S2
    invSs2_r = -S_r * inv_S2 / s2
    dH_dr = 0.5 * (
        -h_r * pt * pt
        + 2.0 * h_r * pt * pr
        + DS_r * pr * pr
        + 2.0 * a * invS_r * pr * pph
        + invS_r * pth * pth
        + invSs2_r * pph * pph
    )

    # --- dH/dth ---
    S_th = -(a * a) * sin2t
    h_th = -2.0 * m * r * S_th * inv_S2
    DS_th = -D * S_th * inv_S2
    invS_th = -S_th * inv_S2
    invSs2_th = -(S_th * s2 + S * sin2t) * inv_S2 / (s2 * s2)
    dH_dth = 0.5 * (
        -h_th * pt * pt
        + 2.0 * h_th * pt * pr
        + DS_th * pr * pr
        + 2.0 * a * invS_th * pr * pph
        + invS_th * pth * pth
        + invSs2_th * pph * pph
    )

    zeros = jnp.zeros_like(r)
    return jnp.stack([dt, dr, dth, dph, zeros, -dH_dr, -dH_dth, zeros], axis=-1)


def ks_renormalize(m, a, y):
    """Project p_r onto H = 0, sparse KS quadratic (invariants twin).

    A = D/S, B = 2 (h p_t + (a/S) p_phi),
    C = -(1+h) p_t^2 + p_th^2/S + p_phi^2/(S s2);
    root nearest the current p_r; gradient-safe via the safe-where pattern.
    """
    r, th = y[..., 1], y[..., 2]
    pt, pr, pth, pph = y[..., 4], y[..., 5], y[..., 6], y[..., 7]
    s2, _, S, D, inv_S, h = _geom(m, a, r, th)
    A = D * inv_S
    B = 2.0 * (h * pt + a * inv_S * pph)
    C = -(1.0 + h) * pt * pt + pth * pth * inv_S + pph * pph * inv_S / s2
    disc = B * B - 4.0 * A * C
    valid = (disc >= 0.0) & (jnp.abs(A) > 1e-12)
    sqrt_d = jnp.sqrt(jnp.where(valid, jnp.maximum(disc, 1e-30), 1.0))
    denom = jnp.where(valid, 2.0 * A, 1.0)
    sol1 = (-B + sqrt_d) / denom
    sol2 = (-B - sqrt_d) / denom
    nearest = jnp.where(jnp.abs(sol1 - pr) < jnp.abs(sol2 - pr), sol1, sol2)
    new_pr = jnp.where(valid, nearest, pr)
    return y.at[..., 5].set(new_pr)


def ks_symplectic_step(m, a, y, dlam, iterations: int = 2):
    """Implicit-midpoint step on the sparse KS RHS (integrator.rs:209-226).

    y_{n+1} = y_n + dlam f((y_n + y_{n+1})/2), `iterations` fixed-point
    rounds from an explicit-Euler seed. dlam: (...)."""
    hh = dlam[..., None]
    y_next = y + hh * ks_rhs(m, a, y)
    for _ in range(iterations):
        y_next = y + hh * ks_rhs(m, a, 0.5 * (y + y_next))
    return y_next


# ---------------------------------------------------------------------------
# Transposed (8, N) layout variants — the TPU-native layout for the march.
#
# (N, 8) puts the 8 state slots in the 128-lane minor dimension: every packed
# op runs at 8/128 lane utilization. (8, N) makes each slot a full lane-major
# row, so y[k] slices are free and all arithmetic is dense. The march carries
# state transposed and converts at its boundaries.
# ---------------------------------------------------------------------------

def ks_rhs_t(m, a, yt):
    """dy/dlambda for transposed state yt: (8, N) -> (8, N)."""
    r, th = yt[1], yt[2]
    pt, pr, pth, pph = yt[4], yt[5], yt[6], yt[7]
    s2, sin2t, S, D, inv_S, h = _geom(m, a, r, th)
    inv_S2 = inv_S * inv_S

    dt = -(1.0 + h) * pt + h * pr
    dr = h * pt + D * inv_S * pr + a * inv_S * pph
    dth = pth * inv_S
    dph = a * inv_S * pr + pph * inv_S / s2

    S_r = 2.0 * r
    D_r = 2.0 * r - 2.0 * m
    h_r = 2.0 * m * (S - 2.0 * r * r) * inv_S2
    DS_r = (D_r * S - D * S_r) * inv_S2
    invS_r = -S_r * inv_S2
    invSs2_r = -S_r * inv_S2 / s2
    dH_dr = 0.5 * (
        -h_r * pt * pt
        + 2.0 * h_r * pt * pr
        + DS_r * pr * pr
        + 2.0 * a * invS_r * pr * pph
        + invS_r * pth * pth
        + invSs2_r * pph * pph
    )

    S_th = -(a * a) * sin2t
    h_th = -2.0 * m * r * S_th * inv_S2
    DS_th = -D * S_th * inv_S2
    invS_th = -S_th * inv_S2
    invSs2_th = -(S_th * s2 + S * sin2t) * inv_S2 / (s2 * s2)
    dH_dth = 0.5 * (
        -h_th * pt * pt
        + 2.0 * h_th * pt * pr
        + DS_th * pr * pr
        + 2.0 * a * invS_th * pr * pph
        + invS_th * pth * pth
        + invSs2_th * pph * pph
    )

    zeros = jnp.zeros_like(r)
    return jnp.stack([dt, dr, dth, dph, zeros, -dH_dr, -dH_dth, zeros], axis=0)


def ks_renormalize_t(m, a, yt):
    """Transposed-layout twin of ks_renormalize: yt (8, N)."""
    r, th = yt[1], yt[2]
    pt, pr, pth, pph = yt[4], yt[5], yt[6], yt[7]
    s2, _, S, D, inv_S, h = _geom(m, a, r, th)
    A = D * inv_S
    B = 2.0 * (h * pt + a * inv_S * pph)
    C = -(1.0 + h) * pt * pt + pth * pth * inv_S + pph * pph * inv_S / s2
    disc = B * B - 4.0 * A * C
    valid = (disc >= 0.0) & (jnp.abs(A) > 1e-12)
    sqrt_d = jnp.sqrt(jnp.where(valid, jnp.maximum(disc, 1e-30), 1.0))
    denom = jnp.where(valid, 2.0 * A, 1.0)
    sol1 = (-B + sqrt_d) / denom
    sol2 = (-B - sqrt_d) / denom
    nearest = jnp.where(jnp.abs(sol1 - pr) < jnp.abs(sol2 - pr), sol1, sol2)
    new_pr = jnp.where(valid, nearest, pr)
    return yt.at[5].set(new_pr)


def ks_symplectic_step_t(m, a, yt, dlam, iterations: int = 2):
    """Transposed-layout implicit midpoint: yt (8, N), dlam (N,)."""
    hh = dlam[None, :]
    y_next = yt + hh * ks_rhs_t(m, a, yt)
    for _ in range(iterations):
        y_next = yt + hh * ks_rhs_t(m, a, 0.5 * (yt + y_next))
    return y_next


# ---------------------------------------------------------------------------
# u = cos(theta) coordinate kernel — the trig-free march representation.
#
# Substituting u = cos(theta) (p_u = -p_theta / sin(theta)) makes the KS
# Hamiltonian purely rational:
#
#   H = 1/2 [ -(1+h) p_t^2 + 2 h p_t p_r + (D/S) p_r^2 + (2a/S) p_r p_phi
#             + (w/S) p_u^2 + p_phi^2 / (S w) ],
#   S = r^2 + a^2 u^2,  w = 1 - u^2,  h = 2 M r / S,
#
# so the step loop contains no sin/cos at all, and the polar coordinate
# singularity weakens: du/dlam = (w/S) p_u -> 0 smoothly at the axis.
# State layout (8, N): (t, r, u, phi, p_t, p_r, p_u, p_phi).
# ---------------------------------------------------------------------------

_W_EPS = 1e-12


def w_floor(dtype):
    """Pole guard floor for w = 1 - u^2, by dtype. In f32 the floor must be
    large enough that the 1/w^2 polar terms cannot overflow inside one
    implicit-midpoint step (u overshoots past +-1 mid-iteration): with
    w >= 1e-6 every intermediate stays < 1e32. d(pixel)/d(spin) was NaN in
    f32 (0-cotangent x Inf-intermediate in the VJP) with the f64 floor.
    w = 1e-6 is theta within ~1e-3 rad of the axis — far below pixel scale."""
    return 1e-12 if jnp.finfo(dtype).bits >= 64 else 1e-6


def set_row(yt, k: int, val):
    """Replace row k of a (8, N) state without jnp .at scatter — Pallas TPU
    has no scatter lowering; an iota row mask selects instead."""
    row_ids = jax.lax.broadcasted_iota(jnp.int32, yt.shape, 0)
    return jnp.where(row_ids == k, val[None, :], yt)


def theta_state_to_u(yt):
    """(8,N) state with theta/p_theta -> u/p_u rows."""
    th, pth = yt[2], yt[6]
    s = jnp.sqrt(jnp.maximum(1.0 - jnp.cos(th) ** 2, _W_EPS))
    yt = yt.at[2].set(jnp.cos(th))
    return yt.at[6].set(-pth / s)


def u_state_to_theta(yt):
    """(8,N) state with u/p_u rows -> theta/p_theta."""
    u, pu = yt[2], yt[6]
    u = jnp.clip(u, -1.0, 1.0)
    s = jnp.sqrt(jnp.maximum(1.0 - u * u, _W_EPS))
    yt = yt.at[2].set(jnp.arccos(u))
    return yt.at[6].set(-pu * s)


def _geom_u(m, a, r, u, recip=None):
    """``recip``: optional reciprocal op — the Pallas kernel passes the
    hardware approximate reciprocal (pl.reciprocal(approx=True)) here; the
    default is the exact divide."""
    w = jnp.maximum(1.0 - u * u, w_floor(jnp.result_type(u)))
    S = r * r + a * a * u * u
    D = r * r - 2.0 * m * r + a * a
    inv_S = recip(S) if recip is not None else 1.0 / S
    h = 2.0 * m * r * inv_S
    return w, S, D, inv_S, h


def ks_hamiltonian_u(m, a, yt):
    """H for transposed u-state yt: (8, N) -> (N,)."""
    r, u = yt[1], yt[2]
    pt, pr, pu, pph = yt[4], yt[5], yt[6], yt[7]
    w, S, D, inv_S, h = _geom_u(m, a, r, u)
    return 0.5 * (
        -(1.0 + h) * pt * pt
        + 2.0 * h * pt * pr
        + D * inv_S * pr * pr
        + 2.0 * a * inv_S * pr * pph
        + w * inv_S * pu * pu
        + pph * pph * inv_S / w
    )


def ks_rhs_u(m, a, yt, recip=None):
    """dy/dlambda in (t, r, u, phi) coordinates; yt (8, N) -> (8, N).

    Rational in (r, u): zero transcendentals in the hot loop. ``recip``
    selects the reciprocal op (see _geom_u) — the step's only two divides.
    """
    r, u = yt[1], yt[2]
    pt, pr, pu, pph = yt[4], yt[5], yt[6], yt[7]
    w, S, D, inv_S, h = _geom_u(m, a, r, u, recip)
    inv_S2 = inv_S * inv_S
    inv_w = recip(w) if recip is not None else 1.0 / w

    dt = -(1.0 + h) * pt + h * pr
    dr = h * pt + D * inv_S * pr + a * inv_S * pph
    du = w * inv_S * pu
    dph = a * inv_S * pr + pph * inv_S * inv_w

    # d/dr (S_r = 2r)
    S_r = 2.0 * r
    D_r = 2.0 * r - 2.0 * m
    h_r = 2.0 * m * (S - 2.0 * r * r) * inv_S2
    DS_r = (D_r * S - D * S_r) * inv_S2
    invS_r = -S_r * inv_S2
    wS_r = -w * S_r * inv_S2
    invSw_r = -S_r * inv_S2 * inv_w
    dH_dr = 0.5 * (
        -h_r * pt * pt
        + 2.0 * h_r * pt * pr
        + DS_r * pr * pr
        + 2.0 * a * invS_r * pr * pph
        + wS_r * pu * pu
        + invSw_r * pph * pph
    )

    # d/du (S_u = 2 a^2 u, w_u = -2u)
    S_u = 2.0 * a * a * u
    w_u = -2.0 * u
    h_u = -2.0 * m * r * S_u * inv_S2
    DS_u = -D * S_u * inv_S2
    invS_u = -S_u * inv_S2
    wS_u = (w_u * S - w * S_u) * inv_S2
    invSw_u = -(S_u * w + S * w_u) * inv_S2 * inv_w * inv_w
    dH_du = 0.5 * (
        -h_u * pt * pt
        + 2.0 * h_u * pt * pr
        + DS_u * pr * pr
        + 2.0 * a * invS_u * pr * pph
        + wS_u * pu * pu
        + invSw_u * pph * pph
    )

    zeros = jnp.zeros_like(r)
    return jnp.stack([dt, dr, du, dph, zeros, -dH_dr, -dH_du, zeros], axis=0)


def ks_renormalize_u(m, a, yt):
    """Project p_r onto H = 0 in u-coordinates; yt (8, N).

    Thin wrapper over ks_renormalize_pr so the jnp march and the Pallas
    kernel (which carries rows separately) share one computation graph —
    near-bitwise parity between the two paths requires identical expression
    DAGs, or FMA-contraction differences amplify through chaotic
    photon-ring rays.
    """
    new_pr = ks_renormalize_pr(m, a, yt[1], yt[2], yt[4], yt[5], yt[6], yt[7])
    return set_row(yt, 5, new_pr)


def ks_rhs_rows(m, a, r, u, pt, pr, pu, pph, recip=None):
    """ks_rhs_u on unpacked rows -> (dt, dr, du, dph, dpr, dpu).

    Same expressions in the same order as ks_rhs_u, minus the two zero rows
    for the conserved momenta (p_t, p_phi) — the Pallas kernel carries rows
    separately so the conserved rows cost nothing per step. Bit-identical
    to stacking ks_rhs_u's output (tests assert Pallas/jnp march parity).
    """
    w, S, D, inv_S, h = _geom_u(m, a, r, u, recip)
    inv_S2 = inv_S * inv_S
    inv_w = recip(w) if recip is not None else 1.0 / w

    dt = -(1.0 + h) * pt + h * pr
    dr = h * pt + D * inv_S * pr + a * inv_S * pph
    du = w * inv_S * pu
    dph = a * inv_S * pr + pph * inv_S * inv_w

    S_r = 2.0 * r
    D_r = 2.0 * r - 2.0 * m
    h_r = 2.0 * m * (S - 2.0 * r * r) * inv_S2
    DS_r = (D_r * S - D * S_r) * inv_S2
    invS_r = -S_r * inv_S2
    wS_r = -w * S_r * inv_S2
    invSw_r = -S_r * inv_S2 * inv_w
    dH_dr = 0.5 * (
        -h_r * pt * pt
        + 2.0 * h_r * pt * pr
        + DS_r * pr * pr
        + 2.0 * a * invS_r * pr * pph
        + wS_r * pu * pu
        + invSw_r * pph * pph
    )

    S_u = 2.0 * a * a * u
    w_u = -2.0 * u
    h_u = -2.0 * m * r * S_u * inv_S2
    DS_u = -D * S_u * inv_S2
    invS_u = -S_u * inv_S2
    wS_u = (w_u * S - w * S_u) * inv_S2
    invSw_u = -(S_u * w + S * w_u) * inv_S2 * inv_w * inv_w
    dH_du = 0.5 * (
        -h_u * pt * pt
        + 2.0 * h_u * pt * pr
        + DS_u * pr * pr
        + 2.0 * a * invS_u * pr * pph
        + wS_u * pu * pu
        + invSw_u * pph * pph
    )
    return dt, dr, du, dph, -dH_dr, -dH_du


def ks_symplectic_step_rows(m, a, rows, dlam, iterations: int = 2, recip=None):
    """Implicit midpoint on unpacked rows.

    rows = (t, r, u, ph, pt, pr, pu, pph); returns the 6 evolving rows
    (t, r, u, ph, pr, pu). The conserved p_t, p_phi pass through the
    midpoint average unchanged ((x + x)/2 == x), so they are simply not
    averaged — bit-identical to ks_symplectic_step_u.
    """
    t, r, u, ph, pt, pr, pu, pph = rows
    d = ks_rhs_rows(m, a, r, u, pt, pr, pu, pph, recip)
    nt = t + dlam * d[0]
    nr = r + dlam * d[1]
    nu = u + dlam * d[2]
    nph = ph + dlam * d[3]
    npr = pr + dlam * d[4]
    npu = pu + dlam * d[5]
    for _ in range(iterations):
        d = ks_rhs_rows(
            m, a,
            0.5 * (r + nr), 0.5 * (u + nu),
            pt, 0.5 * (pr + npr), 0.5 * (pu + npu), pph,
            recip,
        )
        nt = t + dlam * d[0]
        nr = r + dlam * d[1]
        nu = u + dlam * d[2]
        nph = ph + dlam * d[3]
        npr = pr + dlam * d[4]
        npu = pu + dlam * d[5]
    return nt, nr, nu, nph, npr, npu


def ks_renormalize_pr(m, a, r, u, pt, pr, pu, pph):
    """ks_renormalize_u on unpacked rows: returns the projected p_r row."""
    dt = r.dtype
    one = jnp.asarray(1.0, dt)
    tiny = jnp.asarray(1e-30, dt)
    w, S, D, inv_S, h = _geom_u(m, a, r, u)
    A = D * inv_S
    B = 2.0 * (h * pt + a * inv_S * pph)
    C = -(1.0 + h) * pt * pt + w * inv_S * pu * pu + pph * pph * inv_S / w
    disc = B * B - 4.0 * A * C
    valid = (disc >= 0.0) & (jnp.abs(A) > 1e-12)
    sqrt_d = jnp.sqrt(jnp.where(valid, jnp.maximum(disc, tiny), one))
    denom = jnp.where(valid, 2.0 * A, one)
    sol1 = (-B + sqrt_d) / denom
    sol2 = (-B - sqrt_d) / denom
    nearest = jnp.where(jnp.abs(sol1 - pr) < jnp.abs(sol2 - pr), sol1, sol2)
    return jnp.where(valid, nearest, pr)


def ks_symplectic_step_u(m, a, yt, dlam, iterations: int = 2, recip=None):
    """Implicit midpoint on the u-coordinate RHS; yt (8, N), dlam (N,).

    iterations=1 degenerates to the explicit RK2 midpoint step (the seed is
    explicit Euler), trading one RHS evaluation for the symplectic property;
    the periodic null renormalization holds H = 0 either way.

    Wrapper over ks_symplectic_step_rows (shared DAG with the Pallas kernel
    — see ks_renormalize_u). The conserved p_t, p_phi rows pass through."""
    rows = (yt[0], yt[1], yt[2], yt[3], yt[4], yt[5], yt[6], yt[7])
    nt, nr, nu, nph, npr, npu = ks_symplectic_step_rows(
        m, a, rows, dlam, iterations, recip
    )
    return jnp.stack([nt, nr, nu, nph, yt[4], npr, npu, yt[7]], axis=0)
