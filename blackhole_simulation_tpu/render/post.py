"""Post-processing: bloom, ACES tone mapping, gamma.

Capability parity with the reference post stack re-designed as pure tensor
ops that XLA fuses:
 - bright-pass threshold + separable 9-tap Gaussian blur + additive combine
   (src/shaders/postprocess/bloom.glsl.ts:36-128, src/rendering/bloom.ts),
 - ACES filmic tone curve + gamma 2.2 (src/shaders/chunks/common.ts:52-59).

TAA is intentionally absent: the TPU build replaces temporal accumulation
with supersampled accumulation inside one batched pass (render/pipeline.py),
per the north star.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PostParams:
    exposure: float = 1.0
    bloom_enabled: bool = True
    bloom_threshold: float = 0.85
    bloom_strength: float = 0.55
    bloom_passes: int = 2        # blur iterations (each is a 9-tap separable pass)
    tonemap: bool = True
    gamma: float = 2.2


# 9-tap Gaussian weights (bloom.glsl.ts blur kernel).
_GAUSS9 = jnp.array(
    [0.0162162162, 0.0540540541, 0.1216216216, 0.1945945946, 0.2270270270,
     0.1945945946, 0.1216216216, 0.0540540541, 0.0162162162]
)


def _blur_axis(img: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Separable 9-tap Gaussian along one spatial axis, edge-clamped."""
    g = _GAUSS9.astype(img.dtype)  # keep the pass in the image dtype: an f64
    # constant would promote the whole blur to (TPU-emulated) float64
    out = g[4] * img
    for k in range(1, 5):
        up = jnp.roll(img, k, axis=axis)
        dn = jnp.roll(img, -k, axis=axis)
        out = out + g[4 - k] * up + g[4 + k] * dn
    return out


def bloom(img: jnp.ndarray, params: PostParams) -> jnp.ndarray:
    """Bright-pass -> N separable blurs -> additive combine (bloom.glsl.ts)."""
    luma = jnp.einsum("...c,c->...", img, jnp.array([0.2126, 0.7152, 0.0722]).astype(img.dtype))
    bright = img * jnp.clip(luma - params.bloom_threshold, 0.0, None)[..., None]
    blurred = bright
    for _ in range(params.bloom_passes):
        blurred = _blur_axis(_blur_axis(blurred, 0), 1)
    return img + params.bloom_strength * blurred


def aces(x: jnp.ndarray) -> jnp.ndarray:
    """ACES filmic approximation (Narkowicz fit; chunks/common.ts:52-59)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def tonemap(img: jnp.ndarray, params: PostParams = PostParams()) -> jnp.ndarray:
    """exposure -> bloom -> ACES -> gamma, matching the reference ordering
    (TAA-resolve then bloom then ACES+gamma, useAnimation.ts:497-506)."""
    img = img * params.exposure
    if params.bloom_enabled:
        img = bloom(img, params)
    if params.tonemap:
        img = aces(img)
    return jnp.power(jnp.clip(img, 0.0, 1.0), 1.0 / params.gamma)
