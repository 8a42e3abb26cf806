"""Blackbody spectra -> CIE XYZ -> linear sRGB, plus the renderer LUTs.

Capability parity with reference gravitas-core/src/physics/spectrum.rs:
Planck law with overflow guard (spectrum.rs:12-18), integration over
380-780 nm against Gaussian-approximated CIE-1931 color matching functions
(spectrum.rs:23-62), the XYZ -> linear sRGB matrix (65-70), and the 2-D
blackbody LUT over (T with a ^2.5 warp) x (g-factor in [0.05, 5]) with g^4
Liouville intensity scaling (76-102).

TPU-first: the wavelength integral is a vectorized trapezoid over a static
grid (one shot for an entire LUT instead of per-texel loops); everything is
differentiable w.r.t. temperature and g for inverse rendering.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from blackhole_simulation_tpu.constants import C_SI, H_PLANCK, K_B

# Gaussian-sum approximation of the CIE 1931 color matching functions
# (the same closed-form approach as spectrum.rs:23-46; wavelength in nm).


def _gauss(x, mu, s1, s2):
    s = jnp.where(x < mu, s1, s2)
    t = (x - mu) / s
    return jnp.exp(-0.5 * t * t)


def cie_xbar(lam_nm):
    return (
        1.056 * _gauss(lam_nm, 599.8, 37.9, 31.0)
        + 0.362 * _gauss(lam_nm, 442.0, 16.0, 26.7)
        - 0.065 * _gauss(lam_nm, 501.1, 20.4, 26.2)
    )


def cie_ybar(lam_nm):
    return 0.821 * _gauss(lam_nm, 568.8, 46.9, 40.5) + 0.286 * _gauss(
        lam_nm, 530.9, 16.3, 31.1
    )


def cie_zbar(lam_nm):
    return 1.217 * _gauss(lam_nm, 437.0, 11.8, 36.0) + 0.681 * _gauss(
        lam_nm, 459.0, 26.0, 13.8
    )


def planck_law(lam_m, t_kelvin):
    """Spectral radiance B(lambda, T) [W sr^-1 m^-3], overflow-guarded
    (spectrum.rs:12-18). lam_m in metres, broadcasts with t_kelvin."""
    t = jnp.maximum(jnp.asarray(t_kelvin), 1e-6)
    x = H_PLANCK * C_SI / (lam_m * K_B * t)
    x = jnp.minimum(x, 700.0)  # exp overflow guard, as the reference
    return (2.0 * H_PLANCK * C_SI * C_SI / lam_m**5) / jnp.expm1(x)


@partial(jnp.vectorize, signature="()->(k)")
def integrate_planck_xyz(t_kelvin):
    """Integrate B(lambda, T) against CIE xbar/ybar/zbar over 380-780 nm
    (spectrum.rs:23-62). Returns XYZ, shape (..., 3)."""
    lam_nm = jnp.linspace(380.0, 780.0, 81)
    b = planck_law(lam_nm * 1e-9, t_kelvin)
    xyz_bar = jnp.stack([cie_xbar(lam_nm), cie_ybar(lam_nm), cie_zbar(lam_nm)], axis=-1)
    return jnp.trapezoid(b[:, None] * xyz_bar, lam_nm, axis=0)


# sRGB (D65, linear) matrix — same values as spectrum.rs:65-70. Kept as a
# host numpy constant: a module-scope jnp.array becomes a leaked tracer if
# this module's FIRST import happens inside a jit trace (the lazy
# build_disk_luts import path).
import numpy as _np

_XYZ_TO_RGB = _np.array(
    [
        [3.2406, -1.5372, -0.4986],
        [-0.9689, 1.8758, 0.0415],
        [0.0557, -0.2040, 1.0570],
    ]
)


def xyz_to_linear_rgb(xyz):
    """CIE XYZ -> linear sRGB (unclamped). xyz: (..., 3)."""
    return jnp.einsum("ij,...j->...i", _XYZ_TO_RGB, xyz)


def blackbody_rgb(t_kelvin, normalize: bool = True):
    """Chromaticity-normalized linear-sRGB color of a blackbody at T."""
    xyz = integrate_planck_xyz(t_kelvin)
    if normalize:
        xyz = xyz / jnp.maximum(xyz[..., 1:2], 1e-30)
    return jnp.clip(xyz_to_linear_rgb(xyz), 0.0, None)


@partial(jax.jit, static_argnames=("width", "height"))
def generate_blackbody_lut(
    width: int = 256, height: int = 64, t_max=4e4, g_min=0.05, g_max=5.0
):
    """2-D blackbody LUT: rows = g-factor in [g_min, g_max], cols = T with a
    ^2.5 warp up to t_max (spectrum.rs:76-102). RGBA float32, alpha = relative
    bolometric intensity; the observed color is the blackbody at g*T with the
    g^4 Liouville weight folded into intensity.
    """
    ts = t_max * jnp.linspace(0.0, 1.0, width) ** 2.5
    gs = g_min + (g_max - g_min) * jnp.linspace(0.0, 1.0, height)
    t_obs = gs[:, None] * jnp.maximum(ts[None, :], 1.0)  # (H, W)
    rgb = blackbody_rgb(t_obs)  # (H, W, 3) chromaticity
    # Bolometric intensity ~ T^4 with Liouville g^4, normalized to [0, 1].
    intensity = (t_obs / (g_max * t_max)) ** 4
    rgba = jnp.concatenate([rgb, intensity[..., None]], axis=-1)
    return rgba.astype(jnp.float32)
