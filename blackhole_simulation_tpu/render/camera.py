"""Pinhole camera -> batched null-ray initial states in the Kerr-Schild chart.

Capability parity with the reference's per-pixel camera ray setup
(src/shaders/compute.wgsl.ts:135-187: Halton-jittered pinhole rays + BL-style
state init from the camera; src/shaders/blackhole/fragment.glsl.ts:49-61) —
re-derived properly for the TPU build:

The camera sits at Boyer-Lindquist (r, theta, phi). A ZAMO (zero-angular-
momentum observer) tetrad at the camera gives the local orthonormal frame;
each pixel's unit direction n in that frame lifts to a null 4-momentum
p^mu = -u^mu + n^i e_(i)^mu (past-directed convention p_t ~ -1), which is
lowered with the BL metric and transformed to the horizon-regular Kerr-Schild
chart (p_r^KS = p_r^BL - (2Mr/Delta) p_t - (a/Delta) p_phi) where the march
integrates. Everything is batched over pixels and differentiable w.r.t.
camera and black-hole parameters.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from blackhole_simulation_tpu.geometry.metrics import (
    Kerr,
    kerr_cov_bl,
    kerr_delta,
    kerr_sigma,
)
from blackhole_simulation_tpu.geodesic.state import pack_state


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["r", "theta", "phi", "fov", "roll"],
    meta_fields=["width", "height"],
)
@dataclasses.dataclass(frozen=True)
class Camera:
    """Pinhole camera in Boyer-Lindquist coordinates, looking at the hole.

    fov is the full vertical field of view in radians. `roll` rotates the
    image plane. width/height are static (they fix array shapes).
    """

    r: jnp.ndarray
    theta: jnp.ndarray
    phi: jnp.ndarray
    fov: jnp.ndarray
    roll: jnp.ndarray
    width: int = 256
    height: int = 256

    @classmethod
    def create(cls, r=30.0, theta=jnp.pi / 2 - 0.3, phi=0.0, fov=0.35, roll=0.0,
               width=256, height=256):
        f = jnp.asarray
        return cls(r=f(r), theta=f(theta), phi=f(phi), fov=f(fov), roll=f(roll),
                   width=int(width), height=int(height))


def zamo_tetrad(m, a, r, theta):
    """ZAMO orthonormal tetrad components in the BL coordinate basis.

    Returns (u, e_r, e_th, e_ph): each a (..., 4) contravariant vector.
    u = (1/alpha)(d_t + omega d_phi) with lapse alpha = sqrt(Delta Sigma / A),
    omega = 2 M a r / A, A = (r^2+a^2)^2 - a^2 Delta sin^2 theta.
    """
    s = jnp.sin(theta)
    s2 = jnp.maximum(s * s, 1e-12)
    sig = kerr_sigma(a, r, theta)
    delta = kerr_delta(m, a, r)
    r2a2 = r * r + a * a
    big_a = r2a2 * r2a2 - a * a * delta * s2
    alpha = jnp.sqrt(jnp.maximum(delta * sig / big_a, 1e-30))
    omega = 2.0 * m * a * r / big_a
    z = jnp.zeros_like(r)
    u = jnp.stack([1.0 / alpha, z, z, omega / alpha], axis=-1)
    e_r = jnp.stack([z, jnp.sqrt(jnp.maximum(delta / sig, 1e-30)), z, z], axis=-1)
    e_th = jnp.stack([z, z, 1.0 / jnp.sqrt(sig), z], axis=-1)
    e_ph = jnp.stack(
        [z, z, z, jnp.sqrt(jnp.maximum(sig / big_a, 1e-30)) / jnp.sqrt(s2)], axis=-1
    )
    return u, e_r, e_th, e_ph


def bl_to_ks_momentum(m, a, r, p):
    """Covariant momentum BL -> ingoing-KS: p_r += -(2Mr/Delta) p_t - (a/Delta) p_phi.

    The same covector transform the chart-invariance test validates
    (tests/test_geodesic.py::TestChartConsistency).
    """
    delta = kerr_delta(m, a, r)
    shift = -(2.0 * m * r / delta) * p[..., 0] - (a / delta) * p[..., 3]
    return p.at[..., 1].add(shift)


def pixel_grid(width: int, height: int, jitter=None, dtype=jnp.float32):
    """Normalized pixel coordinates (ndc_x, ndc_y) in [-1, 1], y up.

    ``jitter``: optional (2,) sub-pixel offset in pixel units for
    supersampled accumulation (the TAA-replacement path).
    """
    xs = (jnp.arange(width, dtype=dtype) + 0.5) / width
    ys = (jnp.arange(height, dtype=dtype) + 0.5) / height
    if jitter is not None:
        # astype: an f64 jitter scalar would promote the whole grid.
        xs = xs + jnp.asarray(jitter[0], dtype) / width
        ys = ys + jnp.asarray(jitter[1], dtype) / height
    ndc_x = xs * 2.0 - 1.0
    ndc_y = 1.0 - ys * 2.0
    return jnp.meshgrid(ndc_x, ndc_y, indexing="xy")


def camera_rays_indexed(camera: Camera, bh: Kerr, pix_ids: jnp.ndarray,
                        jitter=None, dtype=jnp.float32):
    """Build (len(pix_ids), 8) null-ray states for the given flat pixel ids.

    ``pix_ids`` indexes row-major (iy * width + ix) — this is what lets a
    device mesh build only its own ray shard inside shard_map instead of
    scattering a host-built buffer.
    """
    ix = (pix_ids % camera.width).astype(dtype)
    iy = (pix_ids // camera.width).astype(dtype)
    jx = jitter[0] if jitter is not None else 0.0
    jy = jitter[1] if jitter is not None else 0.0
    nx = (ix + 0.5 + jx) / camera.width * 2.0 - 1.0
    ny = 1.0 - (iy + 0.5 + jy) / camera.height * 2.0
    return _rays_from_ndc(camera, bh, nx, ny, dtype)


def camera_rays_u(camera: Camera, bh: Kerr, pix_ids=None, jitter=None,
                  dtype=jnp.float32):
    """Build (8, N) u-chart null-ray rows (t, r, u, phi, p_t, p_r, p_u, p_phi)
    with the momentum normalized to p_t = -1.

    The row-native twin of camera_rays: emits the march's working layout
    directly — no (N, 8) intermediate, no per-ray theta trig (the camera
    sits at one theta, so u0 = cos(theta0) and p_u = -p_theta / sin(theta0)
    are scalar ops), and the affine normalization p -> p / (-p_t) (null
    geodesics are invariant under affine rescaling) pins the conserved p_t
    row to the constant -1, which lets the march kernel fold every
    p_t-multiplied term (and makes lam = L_z/E equal p_phi outright).
    """
    if pix_ids is None:
        nx, ny = pixel_grid(camera.width, camera.height, jitter, dtype)
        nx, ny = nx.reshape(-1), ny.reshape(-1)
    else:
        ix = (pix_ids % camera.width).astype(dtype)
        iy = (pix_ids // camera.width).astype(dtype)
        jx = jitter[0] if jitter is not None else 0.0
        jy = jitter[1] if jitter is not None else 0.0
        nx = (ix + 0.5 + jx) / camera.width * 2.0 - 1.0
        ny = 1.0 - (iy + 0.5 + jy) / camera.height * 2.0
    p = _momenta_from_ndc(camera, bh, nx.astype(dtype), ny.astype(dtype), dtype)
    # Affine-normalize to p_t = -1 (p_t < 0 for every camera ray: the ZAMO
    # u^mu contribution dominates the lowered momentum's t component).
    inv = 1.0 / (-p[0])
    th0 = camera.theta
    u0 = jnp.cos(th0).astype(dtype)
    s0 = jnp.sqrt(jnp.maximum(1.0 - jnp.cos(th0) ** 2, 1e-12)).astype(dtype)
    n = nx.shape[0]
    full = lambda v: jnp.full((n,), v, dtype)
    return jnp.stack(
        [
            jnp.zeros((n,), dtype),
            full(camera.r.astype(dtype)),
            full(u0),
            full(camera.phi.astype(dtype)),
            jnp.full((n,), -1.0, dtype),
            p[1] * inv,
            -(p[2] * inv) / s0,
            p[3] * inv,
        ],
        axis=0,
    )


def camera_rays(camera: Camera, bh: Kerr, jitter=None, dtype=jnp.float32):
    """Build (H*W, 8) null-ray initial states in the Kerr-Schild chart.

    The camera looks radially inward (at the hole); pixel directions fan out
    by the field of view. Image x maps to -e_phi (so the approaching,
    frame-dragged side is on the conventional side), image y to +e_theta
    flipped into screen-up.
    """
    nx, ny = pixel_grid(camera.width, camera.height, jitter, dtype)
    return _rays_from_ndc(camera, bh, nx.reshape(-1), ny.reshape(-1), dtype)


def camera_scalars(camera: Camera, bh: Kerr, dtype=jnp.float32):
    """All scalar camera quantities for per-pixel ray construction:
    (c0, c_r, c_th, c_ph, k1, k2, roll_c, roll_s) — the KS-lowered ZAMO
    tetrad coefficient 4-vectors plus the NDC scale/rotation. Shared by
    the jnp ray builders and the fused render kernel (which re-derives
    rays per pixel in VMEM from exactly these scalars)."""
    m, a = bh.mass, bh.spin
    r0, th0 = camera.r, camera.theta
    aspect = jnp.asarray(camera.width / camera.height, dtype)
    half = jnp.tan(camera.fov / 2.0).astype(dtype)
    roll_c = jnp.cos(camera.roll).astype(dtype)
    roll_s = jnp.sin(camera.roll).astype(dtype)
    # Scalar coefficient 4-vectors: lower the tetrad with the BL metric and
    # shift to the KS chart once, at the camera point.
    u, e_r, e_th, e_ph = zamo_tetrad(m, a, r0, th0)
    g_bl = kerr_cov_bl(m, a, r0, th0)
    coeffs = [g_bl @ v for v in (u, e_r, e_th, e_ph)]
    coeffs = [bl_to_ks_momentum(m, a, r0, c).astype(dtype) for c in coeffs]
    c0, c_r, c_th, c_ph = coeffs
    return c0, c_r, c_th, c_ph, half * aspect, half, roll_c, roll_s


def _momenta_from_ndc(camera: Camera, bh: Kerr, nx, ny, dtype):
    """Covariant KS momentum rows [p_t, p_r, p_th, p_ph] for NDC pixels.

    Per-ray work is 3 scalar-coefficient FMAs per momentum component: the
    ZAMO tetrad, BL metric, and BL->KS covector transform all live at the
    (scalar) camera position, and the photon momentum is LINEAR in the pixel
    direction (n_r, n_th, n_ph): p_cov = c0 + n_r c_r + n_th c_th + n_ph c_ph
    with 4-vectors of scalar coefficients. The earlier form materialized
    (N, 4) tensors through an einsum — minor-dim 4 means 4/128 lane occupancy
    on every op, and ray gen cost ~2/3 of the march itself (measured 38 ms
    at 1080p; this form ~1 ms).

    All per-pixel math runs in the render dtype: camera fields are f64
    scalars (the package enables x64 for the oracle layer), and one f64
    scalar touching the (N,) NDC arrays promotes the whole ray-gen sweep
    to emulated f64 on TPU (measured 24 ms of a 84 ms frame at 1080p;
    ~1 ms in f32). Scalar camera/tetrad math stays f64.
    """
    c0, c_r, c_th, c_ph, k1, k2, roll_c, roll_s = camera_scalars(
        camera, bh, dtype
    )
    cx = nx * k1
    cy = ny * k2
    cx, cy = cx * roll_c - cy * roll_s, cx * roll_s + cy * roll_c

    # Local unit direction: forward = -e_r (inward), right = -e_phi, up = -e_theta
    # (theta increases downward from the pole, so screen-up is -e_theta).
    inv_norm = jnp.asarray(1.0, dtype) / jnp.sqrt(1.0 + cx * cx + cy * cy)
    n_r = -inv_norm                 # inward
    n_th = -cy * inv_norm           # screen up
    n_ph = -cx * inv_norm           # screen right
    return [c0[j] + n_r * c_r[j] + n_th * c_th[j] + n_ph * c_ph[j]
            for j in range(4)]


def _rays_from_ndc(camera: Camera, bh: Kerr, nx, ny, dtype):
    """(N, 8) theta-chart packed states (the legacy/public layout)."""
    nx_ = nx.astype(dtype)
    r0, th0, ph0 = camera.r, camera.theta, camera.phi
    p = _momenta_from_ndc(camera, bh, nx_, ny.astype(dtype), dtype)

    zero = jnp.zeros_like(nx_)
    y0 = jnp.stack(
        [
            zero,
            jnp.full_like(nx_, r0.astype(dtype)),
            jnp.full_like(nx_, th0.astype(dtype)),
            jnp.full_like(nx_, ph0.astype(dtype)),
            p[0], p[1], p[2], p[3],
        ],
        axis=-1,
    )
    return y0.reshape(-1, 8)
