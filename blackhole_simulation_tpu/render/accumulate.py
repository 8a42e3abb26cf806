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
converge to the supersampled reference; motion resets history exactly like
the reference's isCameraMoving path.
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

    @property
    def jitter_index(self) -> int:
        return self.frame_count

    def reset(self) -> None:
        self.history = None
        self.frame_count = 0

    def resolve(self, frame: jnp.ndarray, moving: bool = False) -> jnp.ndarray:
        if self.history is None or self.history.shape != frame.shape:
            self.history = frame
            self.frame_count = 1
            return frame
        # Early frames: converge faster than the steady-state feedback would
        # (history holds < feedback-weight's worth of samples).
        eff = min(self.feedback, 1.0 - 1.0 / (self.frame_count + 1))
        self.history = taa_resolve(
            self.history, frame, jnp.asarray(moving), eff, self.clamp_k
        )
        self.frame_count = 0 if moving else self.frame_count + 1
        if moving:
            self.frame_count = 1
        return self.history
