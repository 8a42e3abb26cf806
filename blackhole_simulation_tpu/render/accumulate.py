"""Temporal accumulation — the TPU re-design of the reference's TAA.

The reference amortizes supersampling across frames two ways:
 - WebGL TAA resolve (src/shaders/postprocess/reprojection.glsl.ts:43-116):
   3x3 neighborhood mean/sigma in YCoCg, history clamped to a mu +- 1.5 sigma
   AABB, variance-guided blend weight (luma sigma remaps the base feedback
   1.0 -> 0.45), and a moving-camera history reset.
 - WGSL ATAA compute resolve (postprocess/ataa.wgsl.ts): mu +- 2 sigma clip,
   feedback 0.92.

Here the same math is a pure jitted function over whole (H, W, 3) frames:
``taa_resolve`` blends a history buffer with the current frame, and
``TemporalAccumulator`` is the stateful host-side wrapper the frame loop
uses (ReprojectionManager's ping-pong history, src/rendering/reprojection.ts
:28-34, reduced to one device-resident array). Static-camera sequences
converge to the supersampled reference; a moving camera REPROJECTS the
history through the camera delta at a heuristic depth
(``taa_resolve_reprojected``, the reference's ATAA trick: ataa.wgsl.ts
reprojectDepth) so orbiting keeps its accumulation — the plain
``taa_resolve`` keeps the isCameraMoving hard reset for callers without
camera state.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


def rgb_to_ycocg(rgb: jnp.ndarray) -> jnp.ndarray:
    """Linear RGB -> YCoCg (reprojection.glsl.ts RGBToYCoCg)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.25 * r + 0.5 * g + 0.25 * b
    co = 0.5 * r - 0.5 * b
    cg = -0.25 * r + 0.5 * g - 0.25 * b
    return jnp.stack([y, co, cg], axis=-1)


def ycocg_to_rgb(ycc: jnp.ndarray) -> jnp.ndarray:
    """YCoCg -> linear RGB."""
    y, co, cg = ycc[..., 0], ycc[..., 1], ycc[..., 2]
    r = y + co - cg
    g = y + cg
    b = y - co - cg
    return jnp.stack([r, g, b], axis=-1)


def _neighborhood_stats(img: jnp.ndarray):
    """Per-pixel 3x3 neighborhood mean and stddev, edge-replicated.

    The reference samples the 8 neighbors explicitly
    (reprojection.glsl.ts:52-74); on TPU the same window is two shifted-sum
    passes (separable box filter) that XLA fuses into the resolve.
    """
    def box9(x):
        p = jnp.pad(x, ((1, 1), (1, 1), (0, 0)), mode="edge")
        rows = p[:-2] + p[1:-1] + p[2:]
        return rows[:, :-2] + rows[:, 1:-1] + rows[:, 2:]

    mean = box9(img) / 9.0
    mean2 = box9(img * img) / 9.0
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    return mean, jnp.sqrt(var)


@partial(jax.jit, static_argnames=())
def taa_resolve(
    history: jnp.ndarray,
    current: jnp.ndarray,
    moving: jnp.ndarray,
    base_feedback: jnp.ndarray | float = 0.7,
    clamp_k: float = 1.5,
) -> jnp.ndarray:
    """One TAA resolve step: (H, W, 3) history x current -> new history.

    Mirrors reprojection.glsl.ts:43-116: clamp history to the mu +- k sigma
    YCoCg AABB of the current frame's 3x3 neighborhood, then blend with a
    variance-guided feedback weight (high local luma sigma -> trust history
    less: weight scales from 1.0 at sigma=0 to 0.45 at sigma>=1). ``moving``
    (scalar bool) resets history to the current frame.
    """
    cur_y = rgb_to_ycocg(current)
    hist_y = rgb_to_ycocg(history)
    mean, sigma = _neighborhood_stats(cur_y)
    lo = mean - clamp_k * sigma
    hi = mean + clamp_k * sigma
    hist_clamped = jnp.clip(hist_y, lo, hi)

    # Variance-guided weight on the luma channel (glsl: mix(1.0, 0.45, s)).
    luma_sigma = jnp.clip(sigma[..., 0:1], 0.0, 1.0)
    feedback = jnp.asarray(base_feedback) * (1.0 - 0.55 * luma_sigma)

    blended = feedback * hist_clamped + (1.0 - feedback) * cur_y
    out = ycocg_to_rgb(blended)
    return jnp.where(moving, current, out)


def _cam_basis(r, theta, phi):
    """Flat-space camera position + orthonormal spherical basis (Cartesian).

    The reprojection treats the scene as flat (exactly the reference's
    approximation: ataa.wgsl.ts reconstructs a straight world ray); lensing
    distortion of the reprojection field is absorbed by the variance clamp.
    """
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    e_r = jnp.stack([st * cp, st * sp, ct])
    e_th = jnp.stack([ct * cp, ct * sp, -st])
    e_ph = jnp.stack([-sp, cp, jnp.zeros_like(r)])
    return r * e_r, e_r, e_th, e_ph


def reproject_uv(cam_prev, cam_curr, height, width, depth=None,
                 dtype=jnp.float32):
    """Previous-frame pixel coordinates for every current pixel.

    ``cam_prev``/``cam_curr``: (r, theta, phi, fov, roll) scalars. Each
    current pixel's view ray is pushed to the heuristic ``depth`` (default:
    the camera's distance to the hole, so the disk/shadow region — the
    visually significant structure, ataa.wgsl.ts reprojectDepth — aligns
    exactly) and projected through the PREVIOUS camera. Returns
    (prev_y, prev_x, valid): float pixel coords + in-front/in-bounds mask.

    Pixel-direction conventions mirror render/camera.py exactly: image x ->
    -e_phi, image y -> -e_theta, forward = -e_r, vertical fov, roll rotates
    the image plane.
    """
    r0, th0, ph0, fov0, roll0 = [jnp.asarray(v, dtype) for v in cam_curr]
    r1, th1, ph1, fov1, roll1 = [jnp.asarray(v, dtype) for v in cam_prev]
    if depth is None:
        depth = r0
    depth = jnp.asarray(depth, dtype)

    pos0, er0, eth0, eph0 = _cam_basis(r0, th0, ph0)
    pos1, er1, eth1, eph1 = _cam_basis(r1, th1, ph1)

    ys = (jnp.arange(height, dtype=dtype) + 0.5) / height
    xs = (jnp.arange(width, dtype=dtype) + 0.5) / width
    # indexing="xy" with (W,), (H,) inputs yields (H, W) grids.
    nx, ny = jnp.meshgrid(xs * 2.0 - 1.0, 1.0 - ys * 2.0, indexing="xy")

    aspect = jnp.asarray(width / height, dtype)
    k1_0 = jnp.tan(fov0 / 2.0) * aspect
    k2_0 = jnp.tan(fov0 / 2.0)
    cx = nx * k1_0
    cy = ny * k2_0
    rc, rs = jnp.cos(roll0), jnp.sin(roll0)
    cx, cy = cx * rc - cy * rs, cx * rs + cy * rc

    # Current world point at the heuristic depth along the view ray.
    inv_n = 1.0 / jnp.sqrt(1.0 + cx * cx + cy * cy)
    d = (-er0[:, None, None] - cx[None] * eph0[:, None, None]
         - cy[None] * eth0[:, None, None]) * inv_n[None]
    wpos = pos0[:, None, None] + depth * d  # (3, H, W)

    # Project through the previous camera: local components, then NDC.
    v = wpos - pos1[:, None, None]
    a_r = jnp.einsum("i,ihw->hw", er1, v)
    a_th = jnp.einsum("i,ihw->hw", eth1, v)
    a_ph = jnp.einsum("i,ihw->hw", eph1, v)
    in_front = a_r < -1e-6  # forward = -e_r
    safe = jnp.where(in_front, a_r, -1.0)
    pcx = a_ph / safe
    pcy = a_th / safe
    rc1, rs1 = jnp.cos(roll1), jnp.sin(roll1)
    pcx, pcy = pcx * rc1 + pcy * rs1, -pcx * rs1 + pcy * rc1  # un-roll
    k1_1 = jnp.tan(fov1 / 2.0) * aspect
    k2_1 = jnp.tan(fov1 / 2.0)
    pnx = pcx / k1_1
    pny = pcy / k2_1
    px = (pnx + 1.0) * 0.5 * width - 0.5
    py = (1.0 - pny) * 0.5 * height - 0.5
    # Half-pixel slack: bilinear clamps at the border, and identity
    # reprojection must not invalidate border pixels on f32 round-off.
    valid = (
        in_front
        & (px >= -0.5) & (px <= width - 0.5)
        & (py >= -0.5) & (py <= height - 0.5)
    )
    return py, px, valid


def _bilinear(img, py, px):
    """Bilinear sample of (H, W, 3) at float pixel coords (clamped)."""
    h, w = img.shape[:2]
    py = jnp.clip(py, 0.0, h - 1.0)
    px = jnp.clip(px, 0.0, w - 1.0)
    y0 = jnp.floor(py).astype(jnp.int32)
    x0 = jnp.floor(px).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = (py - y0.astype(img.dtype))[..., None]
    fx = (px - x0.astype(img.dtype))[..., None]
    top = img[y0, x0] * (1.0 - fx) + img[y0, x1] * fx
    bot = img[y1, x0] * (1.0 - fx) + img[y1, x1] * fx
    return top * (1.0 - fy) + bot * fy


@partial(jax.jit, static_argnames=())
def taa_resolve_reprojected(
    history: jnp.ndarray,
    current: jnp.ndarray,
    cam_prev: jnp.ndarray,
    cam_curr: jnp.ndarray,
    base_feedback: jnp.ndarray | float = 0.7,
    clamp_k: float = 1.5,
) -> jnp.ndarray:
    """Motion-aware TAA resolve (ataa.wgsl.ts): instead of resetting history
    when the camera moves, warp it through the camera delta at a heuristic
    depth, clamp to the current frame's YCoCg neighborhood box, and blend.
    Disoccluded / off-screen pixels fall back to the current frame.
    ``cam_prev``/``cam_curr``: (5,) arrays (r, theta, phi, fov, roll).
    """
    h, w = current.shape[:2]
    py, px, valid = reproject_uv(cam_prev, cam_curr, h, w,
                                 dtype=current.dtype)
    warped = _bilinear(history, py, px)

    cur_y = rgb_to_ycocg(current)
    hist_y = rgb_to_ycocg(warped)
    mean, sigma = _neighborhood_stats(cur_y)
    hist_clamped = jnp.clip(hist_y, mean - clamp_k * sigma,
                            mean + clamp_k * sigma)
    luma_sigma = jnp.clip(sigma[..., 0:1], 0.0, 1.0)
    feedback = (jnp.asarray(base_feedback) * (1.0 - 0.55 * luma_sigma)
                * valid[..., None])
    blended = feedback * hist_clamped + (1.0 - feedback) * cur_y
    return ycocg_to_rgb(blended)


@dataclasses.dataclass
class TemporalAccumulator:
    """Host-side history manager (ReprojectionManager + useAnimation wiring).

    Call ``resolve(frame, moving=...)`` once per rendered frame; it returns
    the temporally-accumulated frame and keeps it as history. ``jitter_index``
    walks the Halton sequence so the caller can jitter each frame's camera
    (compute.wgsl.ts:135-157) — accumulation then converges to the
    supersampled image.
    """

    feedback: float = 0.7
    clamp_k: float = 1.5
    history: jnp.ndarray | None = None
    frame_count: int = 0
    # (r, theta, phi, fov, roll) of the frame the history was rendered from;
    # set by passing ``camera=`` to resolve() — enables motion REPROJECTION
    # (ataa.wgsl.ts) instead of the history reset.
    prev_camera: tuple | None = None

    @property
    def jitter_index(self) -> int:
        return self.frame_count

    def reset(self) -> None:
        self.history = None
        self.frame_count = 0
        self.prev_camera = None

    def resolve(self, frame: jnp.ndarray, moving: bool = False,
                camera: tuple | None = None) -> jnp.ndarray:
        """Accumulate one frame. ``camera``: optional (r, theta, phi, fov,
        roll) of the frame's camera — when provided, a moving camera warps
        the history through the camera delta at a heuristic depth (the
        reference's ATAA reprojection) instead of discarding it, so orbiting
        keeps most of the accumulated effective samples."""
        if self.history is None or self.history.shape != frame.shape:
            self.history = frame
            self.frame_count = 1
            self.prev_camera = camera
            return frame
        # Early frames: converge faster than the steady-state feedback would
        # (history holds < feedback-weight's worth of samples).
        eff = min(self.feedback, 1.0 - 1.0 / (self.frame_count + 1))
        if moving and camera is not None and self.prev_camera is not None:
            self.history = taa_resolve_reprojected(
                self.history, frame,
                jnp.asarray(self.prev_camera, frame.dtype),
                jnp.asarray(camera, frame.dtype),
                eff, self.clamp_k,
            )
            # Warping resamples (bilinear blur + clamp): history keeps most
            # but not all of its effective samples — decay, don't reset.
            # Equilibrium under sustained motion: count ~ 4, so the ramped
            # feedback reaches min(feedback, 0.8) instead of collapsing.
            self.frame_count = max(int(self.frame_count * 0.75), 1) + 1
        else:
            self.history = taa_resolve(
                self.history, frame, jnp.asarray(moving), eff, self.clamp_k
            )
            self.frame_count = 1 if moving else self.frame_count + 1
        self.prev_camera = camera
        return self.history
