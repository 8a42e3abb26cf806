"""Shading: thin-disk emission with GR redshift, blackbody colors, starfield.

Capability parity with the reference's shader chunks, re-derived as jnp:
 - disk sampling with equator-crossing detection, Novikov-Thorne radial
   temperature, exact equatorial GR Doppler factor, and beaming
   (src/shaders/chunks/disk.ts:16-111),
 - analytic blackbody temperature -> linear RGB ramp
   (src/shaders/chunks/blackbody.ts:9-46),
 - hash-noise fbm turbulence (src/shaders/chunks/noise.ts:3-46) — built on an
   integer PCG-style hash (uint32 vector ops, TPU-friendly) instead of the
   fract(sin) trick,
 - two-scale hashed starfield + fbm nebula background
   (src/shaders/chunks/background.ts:3-30).

The g-factor uses the photon's conserved lambda = -p_phi/p_t against the
Keplerian emitter (Cunningham form, physics/redshift.py) — exact, not the
SR approximation.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from blackhole_simulation_tpu.geometry.metrics import Kerr


# ---------------------------------------------------------------------------
# Lattice hash noise (chunks/noise.ts parity). Fractional-arithmetic hash
# (Hoskins-style "hash without sine"): all f32 FMAs, zero transcendentals,
# zero integer multiplies — a u32 VPU multiply costs ~25x an f32 FMA on TPU
# (measured 0.042 ms vs ~0.002 ms per 1080p application), and the earlier
# PCG-style mix spent ~200 u32 multiplies per ray across the disk/nebula
# fbm chain ≈ 6 ms/frame of pure hashing.
# ---------------------------------------------------------------------------

def _fract(x):
    return x - jnp.floor(x)


def hash21(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """2-D lattice hash -> float in [0, 1).

    The +0.5 input offset keeps lattice point (0, 0) off the hash's fixed
    point (with all-zero inputs every fract term vanishes and the hash
    returns exactly 0). Entropy note: the final f32 fract of a ~1e2-
    magnitude product keeps ~16 effective random bits — below the 24 bits
    of an integer PCG mix, visually indistinguishable in the star/
    turbulence fields and ~25x cheaper on the VPU (see block comment)."""
    x = jnp.asarray(x, jnp.float32) + 0.5
    y = jnp.asarray(y, jnp.float32) + 0.5
    px = _fract(x * 0.1031)
    py = _fract(y * 0.1030)
    pz = _fract((x + y) * 0.0973)
    d = px * (py + 33.33) + py * (pz + 33.33) + pz * (px + 33.33)
    return _fract((px + py + 2.0 * d) * (pz + d))


def hash31(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    x = jnp.asarray(x, jnp.float32) + 0.5
    y = jnp.asarray(y, jnp.float32) + 0.5
    z = jnp.asarray(z, jnp.float32) + 0.5
    px = _fract(x * 0.1031)
    py = _fract(y * 0.1030)
    pz = _fract(z * 0.0973)
    d = px * (py + 33.33) + py * (pz + 33.33) + pz * (px + 33.33)
    return _fract((px + py + 2.0 * d) * (pz + d))


def _smooth(t):
    return t * t * (3.0 - 2.0 * t)


def atan2_approx(y, x):
    """Polynomial atan2 (max err ~2e-7 rad): octant range-reduction + an
    11th-order odd minimax polynomial on [0, 1].

    Exists because Mosaic has no atan/atan2 lowering — the fused render
    kernel (ops/pallas_render.py) evaluates the starfield in-VMEM, and the
    jnp path uses the SAME function so the two paths share one DAG (the
    error is ~5e-3 star-cell units at the starfield's hash frequency —
    far below a star spot's width)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    z = lo / jnp.maximum(hi, 1e-30)
    z2 = z * z
    # odd minimax coefficients for atan(z), z in [0, 1]
    p = jnp.asarray(-0.0117212, z.dtype)
    p = p * z2 + jnp.asarray(0.0526477, z.dtype)
    p = p * z2 + jnp.asarray(-0.1172626, z.dtype)
    p = p * z2 + jnp.asarray(0.1936999, z.dtype)
    p = p * z2 + jnp.asarray(-0.3326231, z.dtype)
    p = p * z2 + jnp.asarray(0.9999798, z.dtype)
    t = p * z
    half_pi = jnp.asarray(jnp.pi / 2, z.dtype)
    t = jnp.where(ay > ax, half_pi - t, t)         # reflect past 45 deg
    t = jnp.where(x < 0.0, jnp.asarray(jnp.pi, z.dtype) - t, t)
    return jnp.where(y < 0.0, -t, t)


def _powi(x, p: float):
    """x**p via sqrt/multiply chains when p is a multiple of 0.25 (pow lowers
    to exp(log(x)*p) on the VPU — two transcendentals per lane; shading calls
    this hundreds of millions of times per frame). Requires x >= 0 (true for
    every shading quantity). Falls back to jnp pow otherwise."""
    for k in range(3):  # p * 2^k integral for k sqrts of the base
        pk = p * (1 << k)
        if float(pk).is_integer() and abs(pk) <= 16:
            n = int(abs(pk))
            base = x
            for _ in range(k):
                base = jnp.sqrt(base)
            acc, bit = None, base
            while n:
                if n & 1:
                    acc = bit if acc is None else acc * bit
                bit = bit * bit
                n >>= 1
            if acc is None:
                acc = jnp.ones_like(x)
            return 1.0 / acc if p < 0 else acc
    return x**p


def value_noise2(x, y):
    """Smoothed 2-D value noise in [0, 1)."""
    xf, yf = jnp.floor(x), jnp.floor(y)
    tx, ty = _smooth(x - xf), _smooth(y - yf)
    c00 = hash21(xf, yf)
    c10 = hash21(xf + 1, yf)
    c01 = hash21(xf, yf + 1)
    c11 = hash21(xf + 1, yf + 1)
    return (
        c00 * (1 - tx) * (1 - ty)
        + c10 * tx * (1 - ty)
        + c01 * (1 - tx) * ty
        + c11 * tx * ty
    )


def fbm2(x, y, octaves: int = 4):
    """4-octave fractal value noise (chunks/noise.ts fbm)."""
    total = jnp.zeros_like(jnp.asarray(x, dtype=jnp.float32))
    amp, freq = 0.5, 1.0
    for _ in range(octaves):
        total = total + amp * value_noise2(x * freq, y * freq)
        amp *= 0.5
        freq *= 2.0
    return total


# ---------------------------------------------------------------------------
# Blackbody color ramp (chunks/blackbody.ts parity)
# ---------------------------------------------------------------------------

def blackbody_ramp_rows(t_kelvin):
    """Analytic blackbody T -> linear RGB as a (r, g, b) tuple of channel
    rows (Tanner-Helland-style fit domain 1000K-40000K); chromaticity only
    (intensity handled by the caller via g^4 / T^4 weights).

    Channel-row ("structure of arrays") form: on TPU a stacked (N, 3) RGB
    array puts the 3-channel axis in the 128-lane minor dimension — every
    elementwise op runs at 3/128 lane occupancy. Rows keep full (8, 128)
    tiles (the r2->r3 shading-path profile showed ~30 ms/frame of exactly
    these degenerate-layout fusions at 1080p)."""
    t = jnp.clip(jnp.asarray(t_kelvin), 1000.0, 40000.0) / 100.0
    # red
    red = jnp.where(
        t <= 66.0, 255.0, 329.698727446 * jnp.maximum(t - 60.0, 1e-6) ** -0.1332047592
    )
    # green
    g_lo = 99.4708025861 * jnp.log(jnp.maximum(t, 1e-6)) - 161.1195681661
    g_hi = 288.1221695283 * jnp.maximum(t - 60.0, 1e-6) ** -0.0755148492
    green = jnp.where(t <= 66.0, g_lo, g_hi)
    # blue
    b_lo = 138.5177312231 * jnp.log(jnp.maximum(t - 10.0, 1e-6)) - 305.0447927307
    blue = jnp.where(t >= 66.0, 255.0, jnp.where(t <= 19.0, 0.0, b_lo))
    out = []
    for c in (red, green, blue):
        c = jnp.clip(c / 255.0, 0.0, 1.0)
        out.append(c * c)  # sRGB-ish -> linear
    return tuple(out)


def blackbody_ramp(t_kelvin):
    """(..., 3) convenience wrapper over blackbody_ramp_rows."""
    return jnp.stack(blackbody_ramp_rows(t_kelvin), axis=-1)


# ---------------------------------------------------------------------------
# Thin accretion disk (chunks/disk.ts parity)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DiskParams:
    """Static disk configuration (SIMULATION_CONFIG disk params)."""

    outer_radius: float = 18.0
    density: float = 0.7          # overall opacity scale
    t_peak: float = 9000.0        # peak color temperature (display scale), K
    beaming_exponent: float = 4.0 # Liouville g^4 (reference uses delta^3.5)
    turbulence: float = 0.6       # noise modulation amount
    inner_edge_softness: float = 0.35
    outer_falloff: float = 4.0    # radial emissivity falloff power
    # Inverse-GRRT artistic mapping (compute.wgsl.ts:228-239): a target
    # DISPLAY color is mapped back to the emitted j_nu via g^4 and
    # re-transported forward — the disk renders at this fixed chromaticity
    # while intensity carries the exact relativistic g^4 x T^4 transport
    # (the reference's artistic-color device). None = physical blackbody.
    artistic_rgb: tuple | None = None


def nt_temperature_profile(r, r_in, dtype=jnp.float32):
    """Zero-torque Novikov-Thorne radial temperature shape
    T(r) ~ (1 - sqrt(r_in/r))^{1/4} (r_in/r)^{3/4} (chunks/disk.ts:99-106),
    normalized to peak 1."""
    x = jnp.maximum(r / r_in, 1.0 + 1e-6)
    shape = _powi(1.0 - jnp.sqrt(1.0 / x), 0.25) * _powi(x, -0.75)
    # Analytic peak of the shape at x = 49/36.
    xp = 49.0 / 36.0
    peak = (1.0 - (1.0 / xp) ** 0.5) ** 0.25 * xp ** -0.75
    return (shape / peak).astype(dtype)


def equatorial_g_factor(m, a, r, lam, dtype=jnp.float32):
    """Cunningham g-factor for a prograde Keplerian emitter at equatorial r
    seen by a photon with conserved lam = L_z/E (chunks/disk.ts:67-90 exact
    form; physics/redshift.py f64 twin)."""
    r = jnp.maximum(r, 1.05)  # guard: emitters exist only outside the ISCO anyway
    two_mr = 2.0 * m * r
    sig = r * r  # equatorial Sigma = r^2
    g_tt = -(1.0 - two_mr / sig)
    g_tph = -two_mr * a / sig
    g_phph = r * r + a * a + two_mr * a * a / sig
    sqrt_m = jnp.sqrt(m)
    omega = sqrt_m / (r * jnp.sqrt(r) + a * sqrt_m)
    ut_inv_sq = -(g_tt + 2.0 * omega * g_tph + omega * omega * g_phph)
    u_t = 1.0 / jnp.sqrt(jnp.maximum(ut_inv_sq, 1e-6))
    doppler = 1.0 - lam * omega
    doppler = jnp.where(jnp.abs(doppler) < 1e-4, 1e-4, doppler)
    return (1.0 / (u_t * doppler)).astype(dtype)


def disk_emission_rows(
    disk: DiskParams,
    bh: Kerr,
    r_c,
    phi_c,
    t_c,
    lam,
    dtype=jnp.float32,
    density_scale=1.0,
    intensity_scale=1.0,
    octaves: int = 3,
    r_in=None,
):
    """Shade ONE recorded disk crossing: ((r, g, b) rows, alpha, valid).

    Runs once per crossing after the march (not per step) — blackbody color
    at g * T(r) with g^beaming intensity and noise-modulated alpha
    (chunks/disk.ts:22-111). ``lam`` is the ray's conserved impact parameter
    L_z/E. ``density_scale`` / ``intensity_scale`` are traced multipliers
    used by inverse rendering. Channel-row output: see blackbody_ramp_rows.
    """
    m = bh.mass.astype(dtype)
    a = bh.spin.astype(dtype)
    r_in = bh.isco().astype(dtype) if r_in is None else r_in

    valid = (r_c > r_in) & (r_c < disk.outer_radius)
    # Sanitize invalid lanes so no inf/NaN flows into the math below
    # (0 * NaN would poison the masked composite).
    r_c = jnp.where(valid, r_c, r_in * 2.0)
    phi_c = jnp.where(valid, phi_c, 0.0)
    t_c = jnp.where(valid, t_c, 0.0)

    g = equatorial_g_factor(m, a, jnp.maximum(r_c, r_in), lam, dtype)
    g = jnp.clip(g, 0.05, 5.0)  # LUT g-range guard (spectrum.rs:76-102)

    t_shape = nt_temperature_profile(jnp.maximum(r_c, r_in * (1 + 1e-4)), r_in, dtype)
    if disk.artistic_rgb is not None:
        # Inverse-GRRT mapping (see DiskParams.artistic_rgb): fixed target
        # chromaticity; the g^4/T^4 transport below stays exact.
        ones = jnp.ones_like(r_c)
        color = tuple(jnp.asarray(c, dtype) * ones for c in disk.artistic_rgb)
    else:
        t_obs = jnp.clip(g * t_shape * disk.t_peak, 1000.0, 40000.0)
        color = tuple(c.astype(dtype) for c in blackbody_ramp_rows(t_obs))

    # Keplerian-phase-rotated turbulence (chunks/disk.ts:42-61): rotate the
    # noise field by the local orbital phase so structure shears.
    rk = jnp.maximum(r_c, r_in)
    omega_k = jnp.sqrt(m) / (rk * jnp.sqrt(rk) + a * jnp.sqrt(m))
    phase = phi_c - omega_k * t_c
    # Wrap the phase to a bounded interval before hashing: float->int casts
    # of huge f32 values are undefined (the 1080p NaN source).
    phase = jnp.mod(phase, 2.0 * jnp.pi)
    # ``octaves``: turbulence LOD — slot 0 (the direct image) renders the
    # full 3-octave field; higher-order crossings (thin lensed rings a few
    # pixels wide) use 1 octave, the reference's own adaptive 1-3-octave
    # fbm idea (chunks/noise.ts adaptive fbm).
    noise = fbm2(r_c * 1.7, phase * 3.0, octaves=octaves).astype(dtype)
    turb = 1.0 - disk.turbulence + disk.turbulence * (0.4 + 1.2 * noise)

    # Radial emissivity/opacity profile with soft edges.
    inner = jnp.clip((r_c - r_in) / (disk.inner_edge_softness * r_in + 1e-6), 0.0, 1.0)
    outer = _powi(jnp.maximum(r_in, r_c) / r_in, -disk.outer_falloff * 0.5)
    edge = _smooth(inner) * jnp.clip(
        (disk.outer_radius - r_c) / (0.15 * disk.outer_radius), 0.0, 1.0
    )
    alpha = jnp.clip(disk.density * density_scale * edge * turb, 0.0, 1.0)
    alpha = jnp.where(valid, alpha, 0.0).astype(dtype)

    intensity = _powi(g, disk.beaming_exponent) * t_shape**4 * outer * intensity_scale
    masked = jnp.where(valid, intensity, 0.0)
    rgb = tuple(c * masked for c in color)
    return rgb, alpha, valid


def disk_emission(disk, bh, r_c, phi_c, t_c, lam, dtype=jnp.float32,
                  density_scale=1.0, intensity_scale=1.0):
    """(..., 3) convenience wrapper over disk_emission_rows."""
    rgb, alpha, valid = disk_emission_rows(
        disk, bh, r_c, phi_c, t_c, lam, dtype, density_scale, intensity_scale
    )
    return jnp.stack(rgb, axis=-1), alpha, valid


# ---------------------------------------------------------------------------
# Physics-LUT shading chain (disk.rs:175-201 + spectrum.rs:76-102 parity)
# ---------------------------------------------------------------------------

def build_disk_luts(bh: Kerr, disk: DiskParams, dtype=jnp.float32,
                    n_r: int = 256, n_t: int = 128, n_g: int = 48):
    """Generate the two renderer LUTs in-graph, differentiably.

    1. Page-Thorne temperature shape T(r)/T_peak on a log-r grid from the
       ISCO to the disk edge (physics/disk.py page_thorne_flux — the exact
       relativistic flux with the no-torque ISCO boundary, disk.rs:90-170),
       replacing the Novikov-Thorne zero-torque approximation of the
       analytic path.
    2. Planck/CIE blackbody chromaticity over observed temperature
       (physics/spectrum.py integrate_planck_xyz -> linear sRGB,
       spectrum.rs:23-70), replacing the Tanner-Helland fit. The reference
       uploads these as GPU textures (webgl/renderer.ts:433-464,
       spectral.ts:13-34); here they are device arrays and the LOOKUP is
       differentiable linear interpolation, so disk-parameter and spin
       gradients flow through the chain (BASELINE configs[3] needs
       d/d(disk)).

    Returns (r_grid, t_shape, t_axis, rgb_table): the 2-D g-dependence is
    folded at lookup time (observed T = g * T_emit, intensity g^4 exactly
    — Liouville; spectrum.rs applies the same fold when building its 2-D
    texture, so a 1-D chromaticity axis loses nothing).
    """
    from blackhole_simulation_tpu.physics.disk import page_thorne_flux

    m64 = bh.mass.astype(jnp.float64)
    a64 = bh.spin.astype(jnp.float64)
    r_in = Kerr(mass=m64, spin=a64).isco()
    r_grid = r_in * (disk.outer_radius / r_in) ** jnp.linspace(0.0, 1.0, n_r)
    flux = page_thorne_flux(r_grid, m64, a64, n_grid=n_r)
    t_raw = jnp.maximum(flux, 0.0) ** 0.25
    t_shape = (t_raw / jnp.maximum(jnp.max(t_raw), 1e-30)).astype(dtype)

    from blackhole_simulation_tpu.physics.spectrum import blackbody_rgb

    # Observed-temperature axis with the reference's ^2.5 warp
    # (spectrum.rs:84): dense where blackbody color changes fastest. Floor
    # ~900 K: below that the visible-band Planck integral underflows and
    # the chromaticity normalization is meaningless.
    t_axis = 900.0 + (4e4 - 900.0) * jnp.linspace(0.0, 1.0, n_t) ** 2.5
    rgb_table = blackbody_rgb(t_axis).astype(dtype)
    return r_grid.astype(dtype), t_shape, t_axis.astype(dtype), rgb_table


SPECTRAL_CHEB_K = 16
SPECTRAL_T_LO = 900.0
SPECTRAL_T_HI = 4e4


def spectral_cheb_coeffs(luts, dtype=jnp.float32):
    """Chebyshev projections of the two spectral LUTs for in-VMEM shading.

    The fused render kernel (ops/pallas_render.py) cannot gather from LUT
    tables (Mosaic has no per-lane dynamic gather), so the smooth LUT
    contents are refit as K-term Chebyshev series evaluated by Clenshaw
    recurrences — pure FMA chains, and comparably priced to the gathers
    they replace:

      * t_shape on x' = sqrt(log(r/r_in)/log(r_out/r_in)) in [0, 1] — the
        Page-Thorne temperature profile. The sqrt substitution opens the
        profile's (r - r_isco)^{1/2}-type edge at the no-torque ISCO
        boundary, which otherwise defeats polynomial convergence (maxerr
        0.13 -> 0.04 at K = 16),
      * rgb_c(y), y = ((T - 900)/(4e4 - 900))^(1/2.5) in [0, 1] — the
        Planck/CIE chromaticity on the reference's ^2.5-warped T axis
        (spectrum.rs:84).

    Returns (t_coeffs (K,), rgb_coeffs (3, K)). K = 16 keeps the Mosaic
    trace small (the K = 32 variant compiled 289 s vs <10 s); end-to-end
    radiance error vs the LUT-interp path is bounded by the fused-path
    parity test.
    """
    r_grid, t_shape_tab, t_axis, rgb_table = luts
    k = jnp.arange(SPECTRAL_CHEB_K, dtype=jnp.float32)
    nodes = jnp.cos(jnp.pi * (k + 0.5) / SPECTRAL_CHEB_K)  # (K,) in (-1, 1)
    x01 = 0.5 * (nodes + 1.0)

    # t_shape at Chebyshev nodes of the sqrt(log-r) domain (r_grid is
    # log-spaced, so x01**2 indexes it linearly).
    r_in, r_out = r_grid[0], r_grid[-1]
    r_nodes = r_in * (r_out / r_in) ** (x01 ** 2)
    t_vals = jnp.interp(r_nodes, r_grid, t_shape_tab)

    # rgb at Chebyshev nodes of the warp domain (t_axis was built from the
    # same warp, so x01 indexes it linearly too).
    t_nodes = SPECTRAL_T_LO + (SPECTRAL_T_HI - SPECTRAL_T_LO) * x01 ** 2.5
    rgb_vals = jnp.stack(
        [jnp.interp(t_nodes, t_axis, rgb_table[:, c]) for c in range(3)]
    )  # (3, K)

    j = jnp.arange(SPECTRAL_CHEB_K, dtype=jnp.float32)
    dct = jnp.cos(jnp.pi * j[:, None] * (k[None, :] + 0.5) / SPECTRAL_CHEB_K)
    proj = lambda v: (
        (2.0 / SPECTRAL_CHEB_K) * (v[None, :] * dct).sum(axis=1)
    ).at[0].mul(0.5)
    t_coeffs = proj(t_vals).astype(dtype)
    rgb_coeffs = jnp.stack([proj(rgb_vals[c]) for c in range(3)]).astype(dtype)
    return t_coeffs, rgb_coeffs


import functools as _functools


@_functools.lru_cache(maxsize=64)
def spectral_kernel_tables(mass: float, spin: float, disk: "DiskParams"):
    """Host-side (eager, CPU, f64) spectral Chebyshev tables for the fused
    kernel: (t_coeffs (K,), rgb_coeffs (3, K), inv_logr ()) as f32 arrays.

    The f64 Page-Thorne Simpson integral compiles for ~340 s through this
    environment's TPU toolchain (measured r4) — two orders beyond the
    <120 s cold-compile budget — so it runs ONCE on the host CPU and the 65
    scalars ship as pytree leaves. LRU-cached on (mass, spin, disk):
    Scene.create calls it at scene-build time, and pipeline.render /
    render_radiance lazily backfill it for any OTHER construction path
    (e.g. dataclasses.replace flipping spectral_lut on) before entering
    jit — no construction path reaches the in-trace f64 build (VERDICT r4
    item 4; tests/test_fused.py asserts it).
    """
    from blackhole_simulation_tpu.geometry.metrics import KS, Kerr

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu), jax.enable_x64(True):
        bh = Kerr(
            mass=jnp.float64(float(mass)),
            spin=jnp.float64(float(spin)),
            chart=KS,
        )
        luts = build_disk_luts(bh, disk, jnp.float32)
        t_coeffs, rgb_coeffs = spectral_cheb_coeffs(luts)
        inv_logr = (1.0 / jnp.log(luts[0][-1] / luts[0][0])).astype(jnp.float32)
    import numpy as np

    return (np.asarray(t_coeffs), np.asarray(rgb_coeffs), np.asarray(inv_logr))


def disk_emission_lut_rows(
    disk: DiskParams,
    bh: Kerr,
    luts,
    r_c,
    phi_c,
    t_c,
    lam,
    dtype=jnp.float32,
    density_scale=1.0,
    intensity_scale=1.0,
    octaves: int = 3,
):
    """LUT twin of disk_emission_rows: Page-Thorne T(r) + Planck/CIE color.

    Identical geometry/turbulence/opacity to the analytic path; only the
    temperature profile and the color come from the LUTs. Liouville
    intensity is exactly g^4 (cf. DiskParams.beaming_exponent for the
    analytic path's knob).
    """
    m = bh.mass.astype(dtype)
    a = bh.spin.astype(dtype)
    r_in = bh.isco().astype(dtype)
    r_grid, t_shape_tab, t_axis, rgb_table = luts

    valid = (r_c > r_in) & (r_c < disk.outer_radius)
    r_c = jnp.where(valid, r_c, r_in * 2.0)
    phi_c = jnp.where(valid, phi_c, 0.0)
    t_c = jnp.where(valid, t_c, 0.0)

    g = equatorial_g_factor(m, a, jnp.maximum(r_c, r_in), lam, dtype)
    g = jnp.clip(g, 0.05, 5.0)  # the LUT g-range (spectrum.rs:76-102)

    # Differentiable 1-D interp of the Page-Thorne shape at the crossing
    # radius (gradients flow into r_c and, through the table values, spin).
    t_shape = jnp.interp(r_c, r_grid, t_shape_tab)
    t_obs = jnp.clip(g * t_shape * disk.t_peak, t_axis[0], t_axis[-1])

    # Differentiable lookup of the Planck/CIE chromaticity at observed T.
    idx = jnp.searchsorted(t_axis, t_obs, side="right") - 1
    idx = jnp.clip(idx, 0, t_axis.shape[0] - 2)
    t0 = t_axis[idx]
    t1 = t_axis[idx + 1]
    w1 = jnp.clip((t_obs - t0) / jnp.maximum(t1 - t0, 1e-3), 0.0, 1.0)
    # Per-channel gathers from the transposed (3, n_t) table keep the 2M-lane
    # interpolation in full-tile rows (see blackbody_ramp_rows).
    tab = rgb_table.T
    color = tuple(
        (tab[c][idx] * (1.0 - w1) + tab[c][idx + 1] * w1).astype(dtype)
        for c in range(3)
    )

    rk = jnp.maximum(r_c, r_in)
    omega_k = jnp.sqrt(m) / (rk * jnp.sqrt(rk) + a * jnp.sqrt(m))
    phase = phi_c - omega_k * t_c
    phase = jnp.mod(phase, 2.0 * jnp.pi)
    # ``octaves``: turbulence LOD — slot 0 (the direct image) renders the
    # full 3-octave field; higher-order crossings (thin lensed rings a few
    # pixels wide) use 1 octave, the reference's own adaptive 1-3-octave
    # fbm idea (chunks/noise.ts adaptive fbm).
    noise = fbm2(r_c * 1.7, phase * 3.0, octaves=octaves).astype(dtype)
    turb = 1.0 - disk.turbulence + disk.turbulence * (0.4 + 1.2 * noise)

    inner = jnp.clip((r_c - r_in) / (disk.inner_edge_softness * r_in + 1e-6), 0.0, 1.0)
    edge = _smooth(inner) * jnp.clip(
        (disk.outer_radius - r_c) / (0.15 * disk.outer_radius), 0.0, 1.0
    )
    alpha = jnp.clip(disk.density * density_scale * edge * turb, 0.0, 1.0)
    alpha = jnp.where(valid, alpha, 0.0).astype(dtype)

    # Liouville invariant: I_obs ~ g^4 T^4 (optically thick), with the
    # emitted-T^4 weight from the Page-Thorne profile.
    intensity = _powi(g, 4.0) * t_shape**4 * intensity_scale
    masked = jnp.where(valid, intensity, 0.0)
    rgb = tuple(c * masked for c in color)
    return rgb, alpha, valid


def cheb_clenshaw(coeffs, t):
    """Chebyshev series at t in [-1, 1] from a LIST of scalar coefficients
    — the recurrence shared verbatim by the fused kernel
    (ops/pallas_render._clenshaw) and the jnp spectral twin below, so the
    two paths stay bit-equal."""
    b1 = jnp.zeros_like(t)
    b2 = jnp.zeros_like(t)
    for j in range(len(coeffs) - 1, 0, -1):
        b1, b2 = 2.0 * t * b1 - b2 + coeffs[j], b1
    return t * b1 - b2 + coeffs[0]


def disk_emission_cheb_rows(
    disk: DiskParams,
    m,
    a,
    r_in,
    spectral_coeffs,
    r_c,
    phi_c,
    t_c,
    lam,
    dtype=jnp.float32,
    density_scale=1.0,
    intensity_scale=1.0,
    octaves: int = 3,
):
    """Spectral slot shading by the Chebyshev-compressed tables — the jnp
    twin of the fused kernel's _disk_slot_spectral (ops/pallas_render.py:
    identical series and geometry/turbulence/opacity expressions). Used
    where the kernel's SMEM form is unavailable: the critical-band
    refinement pass and any staged render whose Scene carries
    host-precomputed ``spectral_coeffs`` (t_coeffs, rgb_coeffs, inv_logr).
    """
    tc, rc_tab, il = spectral_coeffs
    tc = jnp.asarray(tc, dtype)
    rc_tab = jnp.asarray(rc_tab, dtype)
    t_coeffs = [tc[j] for j in range(SPECTRAL_CHEB_K)]
    rgb_coeffs = [
        [rc_tab[c, j] for j in range(SPECTRAL_CHEB_K)] for c in range(3)
    ]
    return spectral_slot_core(
        disk, m, a, r_in, jnp.asarray(il, dtype), t_coeffs, rgb_coeffs,
        r_c, phi_c, t_c, lam, dtype, octaves, density_scale, intensity_scale,
    )


def spectral_slot_core(disk, m, a, r_in, inv_logr, t_coeffs, rgb_coeffs,
                       r_c, phi_c, t_c, lam, dtype, octaves,
                       density_scale=1.0, intensity_scale=1.0):
    """One spectral crossing slot from scalar Chebyshev coefficient LISTS —
    the single expression DAG behind both disk_emission_cheb_rows (jnp) and
    the fused kernel's SMEM slot (ops/pallas_render._disk_slot_spectral).
    Scale factors of exactly 1.0 (python float) emit no ops, preserving
    bit-parity with the kernel."""
    F = lambda v: jnp.asarray(v, dtype)

    valid = (r_c > r_in) & (r_c < disk.outer_radius)
    r_c = jnp.where(valid, r_c, r_in * 2.0)
    phi_c = jnp.where(valid, phi_c, F(0.0))
    t_c = jnp.where(valid, t_c, F(0.0))

    g = equatorial_g_factor(m, a, jnp.maximum(r_c, r_in), lam, dtype)
    g = jnp.clip(g, 0.05, 5.0)

    x01 = jnp.log(jnp.maximum(r_c / r_in, 1e-6)) * inv_logr
    xs = jnp.sqrt(jnp.clip(x01, F(0.0), F(1.0)))
    tx = jnp.clip(2.0 * xs - 1.0, F(-1.0), F(1.0))
    t_shape = jnp.clip(cheb_clenshaw(t_coeffs, tx), F(0.0), F(1.0))
    t_obs = jnp.clip(g * t_shape * disk.t_peak, SPECTRAL_T_LO, SPECTRAL_T_HI)

    y01 = ((t_obs - SPECTRAL_T_LO) / (SPECTRAL_T_HI - SPECTRAL_T_LO)) ** 0.4
    ty = jnp.clip(2.0 * y01 - 1.0, F(-1.0), F(1.0))
    color = tuple(
        jnp.maximum(cheb_clenshaw(rgb_coeffs[c], ty), F(0.0))
        for c in range(3)
    )

    rk = jnp.maximum(r_c, r_in)
    omega_k = jnp.sqrt(m) / (rk * jnp.sqrt(rk) + a * jnp.sqrt(m))
    phase = phi_c - omega_k * t_c
    phase = jnp.mod(phase, 2.0 * jnp.pi)
    noise = fbm2(r_c * 1.7, phase * 3.0, octaves=octaves).astype(dtype)
    turb = 1.0 - disk.turbulence + disk.turbulence * (0.4 + 1.2 * noise)

    inner = jnp.clip(
        (r_c - r_in) / (disk.inner_edge_softness * r_in + 1e-6), 0.0, 1.0
    )
    edge = _smooth(inner) * jnp.clip(
        (disk.outer_radius - r_c) / (0.15 * disk.outer_radius), 0.0, 1.0
    )
    dens = disk.density
    if not (isinstance(density_scale, float) and density_scale == 1.0):
        dens = dens * density_scale
    alpha = jnp.clip(dens * edge * turb, 0.0, 1.0)
    alpha = jnp.where(valid, alpha, F(0.0))

    intensity = _powi(g, 4.0) * t_shape ** 4
    if not (isinstance(intensity_scale, float) and intensity_scale == 1.0):
        intensity = intensity * intensity_scale
    masked = jnp.where(valid, intensity, F(0.0))
    return tuple(c * masked for c in color), alpha, valid


def disk_emission_lut(disk, bh, luts, r_c, phi_c, t_c, lam, dtype=jnp.float32,
                      density_scale=1.0, intensity_scale=1.0):
    """(..., 3) convenience wrapper over disk_emission_lut_rows."""
    rgb, alpha, valid = disk_emission_lut_rows(
        disk, bh, luts, r_c, phi_c, t_c, lam, dtype, density_scale,
        intensity_scale,
    )
    return jnp.stack(rgb, axis=-1), alpha, valid


def shade_disk_crossings(
    result,
    bh: Kerr,
    disk: DiskParams,
    y0: jnp.ndarray,
    dtype=jnp.float32,
    density_scale=1.0,
    intensity_scale=1.0,
    spectral: bool = False,
):
    """Composite the K recorded crossings front-to-back:
    ((r, g, b) channel rows, transmittance).

    Crossing slots fill in march order, so slot 0 is nearest the camera;
    standard alpha-over accumulation (chunks/disk.ts:108-111). With
    ``spectral`` the Page-Thorne + Planck/CIE LUT chain shades each
    crossing (build_disk_luts) instead of the analytic NT + Tanner-Helland
    ramp.

    All per-slot math runs on (N,) rows: the crossing records are
    transposed back to their native (K, N) march layout (the march carries
    them that way, so XLA cancels the double transpose) — column slices of
    an (N, K) array have a 1-sublane degenerate tile layout on TPU and ran
    8x under hardware speed (the r2->r3 1080p profile).
    """
    # Conserved impact parameter lambda = L_z/E = -p_phi/p_t from the
    # *initial* state (exactly conserved along the ray). The barrier stops
    # XLA from rewriting the transpose back into (N, 8) column slices,
    # whose 1-sublane degenerate tile layout ran ~8x under hardware speed.
    y0t = jax.lax.optimization_barrier(y0.T)
    lam = -y0t[7] / jnp.where(jnp.abs(y0t[4]) < 1e-12, -1.0, y0t[4])
    return shade_crossings_rows(
        bh, disk, result.cross_r.T, result.cross_phi.T, result.cross_t.T,
        result.n_crossings, lam, dtype, density_scale, intensity_scale,
        spectral,
    )


def shade_crossings_rows(
    bh: Kerr,
    disk: DiskParams,
    cross_r,     # (K, N) march-native crossing rows
    cross_phi,
    cross_t,
    n_crossings,
    lam,         # (N,) conserved impact parameter L_z/E per ray
    dtype=jnp.float32,
    density_scale=1.0,
    intensity_scale=1.0,
    spectral: bool = False,
    spectral_coeffs=None,
):
    """Row-native core of shade_disk_crossings (same composite).

    ``spectral_coeffs``: optional host-precomputed Chebyshev tables
    (spectral_kernel_tables) — when present, the spectral path evaluates
    them (disk_emission_cheb_rows, bit-equal to the fused kernel's slot)
    instead of building the f64 LUTs in-trace.
    """
    k_slots, n = cross_r.shape
    rgb = tuple(jnp.zeros((n,), dtype=dtype) for _ in range(3))
    trans = jnp.ones((n,), dtype=dtype)
    use_cheb = spectral and spectral_coeffs is not None
    luts = build_disk_luts(bh, disk, dtype) if spectral and not use_cheb else None
    if use_cheb:
        m_s = bh.mass.astype(dtype)
        a_s = bh.spin.astype(dtype)
        r_in_s = bh.isco().astype(dtype)
    for k in range(k_slots):
        filled = k < n_crossings
        if use_cheb:
            c_rgb, c_alpha, valid = disk_emission_cheb_rows(
                disk, m_s, a_s, r_in_s, spectral_coeffs,
                cross_r[k], cross_phi[k], cross_t[k], lam,
                dtype, density_scale, intensity_scale,
                octaves=3 if k == 0 else 1,
            )
        elif spectral:
            c_rgb, c_alpha, valid = disk_emission_lut_rows(
                disk, bh, luts, cross_r[k], cross_phi[k], cross_t[k], lam,
                dtype, density_scale, intensity_scale,
                octaves=3 if k == 0 else 1,
            )
        else:
            c_rgb, c_alpha, valid = disk_emission_rows(
                disk, bh, cross_r[k], cross_phi[k], cross_t[k], lam,
                dtype, density_scale, intensity_scale,
                octaves=3 if k == 0 else 1,
            )
        w = jnp.where(filled & valid, trans * c_alpha, 0.0)
        rgb = tuple(acc + w * c for acc, c in zip(rgb, c_rgb))
        trans = jnp.where(filled & valid, trans * (1.0 - c_alpha), trans)
    return rgb, trans


# ---------------------------------------------------------------------------
# Background starfield (chunks/background.ts parity)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class JetParams:
    """Relativistic jet cones along the spin axis (chunks/disk.ts:117-155).

    Static config; the march accumulates jet emission per step only when the
    feature is enabled (a traced-variant toggle like the reference's
    ENABLE_JETS #define, with the jets-require-disk rule in configs).
    """

    beta: float = 0.92           # bulk flow speed (chunks/disk.ts: beta=0.92)
    beaming_exponent: float = 3.5
    core_radius: float = 0.6     # cone radius at the base, in M
    opening_slope: float = 0.22  # dr_cone / d|z|
    z_min: float = 1.2           # emission window along the axis
    z_max: float = 24.0
    density: float = 0.012
    turbulence: float = 0.5


def jet_emission_step(jets: JetParams, r, st, ct, ph, dr, dth, dph, dlam, dtype):
    """Per-step jet volume sample in the march's (8, N) layout: (3, N).

    Cheap by design (runs inside the march): cone test + Gaussian radial
    profile + 1-octave noise + Doppler beaming against the local ray
    direction. Optically thin (additive, no alpha). ``st``/``ct`` are
    sin/cos(theta) supplied by the march (it tracks u = cos(theta) natively).
    """
    z = r * ct
    rho = jnp.abs(r * st)
    az = jnp.abs(z)
    cone_r = jets.core_radius + jets.opening_slope * az
    in_cone = (az > jets.z_min) & (az < jets.z_max) & (rho < 2.5 * cone_r)
    profile = jnp.exp(-(rho / jnp.maximum(cone_r, 1e-3)) ** 2)

    # Ray direction cosine along the jet flow (+-z with the flow sign).
    v_z = dr * ct - r * st * dth
    v_rho = dr * st + r * ct * dth
    v_ph = r * st * dph
    v_mag = jnp.sqrt(v_z * v_z + v_rho * v_rho + v_ph * v_ph + 1e-12)
    # The jet on the +z side flows +z, on -z flows -z; the *observed* photon
    # travels opposite to the camera ray -> beaming for flow toward camera.
    cos_psi = -jnp.sign(z) * v_z / v_mag
    gamma = 1.0 / jnp.sqrt(1.0 - jets.beta * jets.beta)
    delta = 1.0 / (gamma * (1.0 - jets.beta * jnp.clip(cos_psi, -1.0, 1.0)))
    beam = delta ** jets.beaming_exponent

    noise = value_noise2(az * 0.8, jnp.mod(ph, 2.0 * jnp.pi) * 2.0 + az)
    turb = 1.0 - jets.turbulence + jets.turbulence * (0.5 + noise)

    mag = jnp.where(in_cone, jets.density * dlam * profile * turb * beam,
                    0.0).astype(dtype)
    # Channel tuple (not a stacked (3, N) array): shape-agnostic, so the
    # Pallas march kernels accumulate the same expression on (S, L) tiles.
    return (0.62 * mag, 0.74 * mag, 1.0 * mag)


@dataclasses.dataclass(frozen=True)
class StarfieldParams:
    density: float = 0.0015       # stars per cell at the fine scale
    brightness: float = 1.4
    nebula: float = 0.12
    cells: float = 160.0          # angular cell frequency


def escape_direction_rows(rows, bh: Kerr):
    """Unit Cartesian direction rows (dx, dy, dz) of an escaped ray.

    ``rows``: the 8 state rows (t, r, th, ph, p_t, p_r, p_th, p_ph), each
    (N,). At the escape radius spacetime is nearly flat: the local
    orthonormal components are (p^r, r p^theta, r sin(theta) p^phi) rotated
    by the position angles. The contravariant momentum uses the sparse
    ingoing-KS components (ops/ks_kernel.ks_rhs) instead of a materialized
    (N, 4, 4) metric + einsum — minor-dim-4 tensor ops run at 4/128 lane
    occupancy on TPU.
    """
    _, r, th, ph, pt, pr, pth, pph = rows
    s = jnp.sin(th)
    s2 = jnp.maximum(s * s, 1e-12)
    m = bh.mass.astype(r.dtype)
    a = bh.spin.astype(r.dtype)
    sig = r * r + a * a * jnp.cos(th) ** 2
    delta = r * r - 2.0 * m * r + a * a
    inv_sig = 1.0 / sig
    h = 2.0 * m * r * inv_sig
    # Sparse ingoing-KS contravariant rows (ks_kernel.ks_rhs):
    v_r = h * pt + delta * inv_sig * pr + a * inv_sig * pph
    v_th = r * (pth * inv_sig)
    v_ph = r * s * (a * inv_sig * pr + pph * inv_sig / s2)
    st, ct = s, jnp.cos(th)
    sp, cp = jnp.sin(ph), jnp.cos(ph)
    # Spherical basis -> Cartesian.
    dx = v_r * st * cp + v_th * ct * cp - v_ph * sp
    dy = v_r * st * sp + v_th * ct * sp + v_ph * cp
    dz = v_r * ct - v_th * st
    inv_n = 1.0 / jnp.sqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-30))
    return dx * inv_n, dy * inv_n, dz * inv_n


def escape_direction_u_rows(rows_u, bh: Kerr):
    """escape_direction_rows on u-chart rows (t, r, u, ph, p_t, p_r, p_u,
    p_phi) — the march's native form: sin(theta) = sqrt(1 - u^2) and
    p_theta = -p_u sin(theta) replace the per-ray theta trig (only the
    phi sin/cos remain)."""
    _, r, u, ph, pt, pr, pu, pph = rows_u
    u = jnp.clip(u, -1.0, 1.0)
    w = jnp.maximum(1.0 - u * u, 1e-12)
    s = jnp.sqrt(w)
    m = bh.mass.astype(r.dtype)
    a = bh.spin.astype(r.dtype)
    sig = r * r + a * a * u * u
    delta = r * r - 2.0 * m * r + a * a
    inv_sig = 1.0 / sig
    h = 2.0 * m * r * inv_sig
    v_r = h * pt + delta * inv_sig * pr + a * inv_sig * pph
    v_th = -r * pu * s * inv_sig          # r p^theta with p_th = -p_u s
    v_ph = r * s * (a * inv_sig * pr + pph * inv_sig / w)
    st, ct = s, u
    sp, cp = jnp.sin(ph), jnp.cos(ph)
    dx = v_r * st * cp + v_th * ct * cp - v_ph * sp
    dy = v_r * st * sp + v_th * ct * sp + v_ph * cp
    dz = v_r * ct - v_th * st
    inv_n = 1.0 / jnp.sqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-30))
    return dx * inv_n, dy * inv_n, dz * inv_n


def escape_direction(y, bh: Kerr):
    """(..., 3) convenience wrapper over escape_direction_rows."""
    rows = tuple(y[..., i] for i in range(8))
    dx, dy, dz = escape_direction_rows(rows, bh)
    return jnp.stack([dx, dy, dz], axis=-1).astype(y.dtype)


def starfield_rows(dx, dy, dz, params: StarfieldParams = StarfieldParams()):
    """Two-scale hashed starfield + fbm nebula (chunks/background.ts:3-30).

    Direction rows (dx, dy, dz) in, channel rows (r, g, b) out — full-tile
    TPU layout (see blackbody_ramp_rows).
    """
    dtype = dx.dtype
    # Equal-area-ish angular coordinates to hash on. atan2_approx: shared
    # polynomial form (Mosaic-lowerable) so the fused kernel and jnp paths
    # compute identical star positions.
    u = atan2_approx(dy, dx)
    v = jnp.clip(dz, -1.0, 1.0)

    out = [jnp.zeros_like(u, dtype=jnp.float32) for _ in range(3)]
    for freq, scale in ((params.cells, 1.0), (params.cells * 0.35, 2.2)):
        cu = jnp.floor(u * freq)
        cv = jnp.floor(v * freq)
        h = hash21(cu, cv)
        star = (h < params.density * scale * 300.0).astype(jnp.float32)
        fu = u * freq - cu - 0.5
        fv = v * freq - cv - 0.5
        spot = jnp.exp(-(fu * fu + fv * fv) * 40.0)
        temp = 3000.0 + 12000.0 * hash21(cu + 7, cv + 13)
        color = blackbody_ramp_rows(temp)
        h_mag = hash21(cu + 31, cv + 5)
        w = star * spot * (h_mag * h_mag * h_mag)
        out = [acc + w * c for acc, c in zip(out, color)]
    nebula = fbm2(u * 3.0, v * 3.0, octaves=4)
    neb2 = nebula * nebula
    neb_rows = (0.35 * neb2, 0.2 * neb2, 0.5 * nebula * jnp.sqrt(nebula))
    return tuple(
        (params.brightness * acc + params.nebula * nc).astype(dtype)
        for acc, nc in zip(out, neb_rows)
    )


def starfield(direction, params: StarfieldParams = StarfieldParams()):
    """(..., 3) convenience wrapper over starfield_rows."""
    rows = starfield_rows(
        direction[..., 0], direction[..., 1], direction[..., 2], params
    )
    return jnp.stack(rows, axis=-1)
