"""Fused render megakernel: ray birth -> precull -> march -> shading, one
Pallas program per 32x128-pixel tile, entirely in VMEM.

The staged pipeline (camera_rays_u -> capture_mask_u -> pallas_march_u ->
shade_march_rows) streams every intermediate — rays (64 MB), termination
radii, the full MarchResult (~200 MB), radiance rows — through HBM between
programs; at 1080p that glue measured ~10 ms/frame against ~14 ms of march
(tools/probe_stages.py, r4). This kernel keeps a tile's entire lifetime
resident in VMEM: pixel coordinates come from the 2-D grid position, the
ray is built from ~30 SMEM scalars (camera_scalars), the shadow precull
evaluates the same Chebyshev critical curve from SMEM coefficients, the
march loop is the shared ops/pallas_march.march_tile, and the disk /
starfield / photon-ring composite writes three (H, W) radiance planes —
the kernel's only HBM traffic.

Writing row-major planes through a 2-D grid also deletes the
to/from_block_order relayouts: the BlockSpec index map IS the tile
decomposition (the reference's screen-tile queue, _legacy_src/tiling.rs).

Shading twins: the disk slot composite mirrors shading.shade_crossings_rows
/ disk_emission_rows (same expressions, r_in passed as a scalar because
Mosaic cannot lower the ISCO's cbrt/arccos); the spectral path evaluates
shading.spectral_cheb_coeffs series by Clenshaw instead of LUT gathers
(no per-lane dynamic gather on TPU); the starfield and escape direction
call the exact shading.py functions. Parity with the jnp path is asserted
in tests/test_fused.py.

Forward-only (like the march kernel): AD paths keep the jnp march.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blackhole_simulation_tpu.ops.ks_kernel import ks_renormalize_pr
from blackhole_simulation_tpu.ops.pallas_march import (
    LANE,
    SUB,
    _cdiv,
    march_tile,
)
from blackhole_simulation_tpu.render.precull import _CHEB_ERR, _CHEB_K
from blackhole_simulation_tpu.render.shading import (
    SPECTRAL_CHEB_K,
    SPECTRAL_T_HI,
    SPECTRAL_T_LO,
    _powi,
    _smooth,
    blackbody_ramp_rows,
    disk_emission_rows,
    equatorial_g_factor,
    escape_direction_u_rows,
    fbm2,
    starfield_rows,
)

# SMEM parameter-row layout (f32 scalars; coefficient blocks appended).
_P_M = 0          # mass
_P_A = 1          # signed spin
_P_RH = 2         # event horizon r+
_P_RPH = 3        # prograde photon sphere
_P_ISCO = 4       # prograde ISCO (disk inner edge)
_P_STOPR = 5      # precull stop radius
_P_HORTHR = 6     # horizon_factor * r_h termination radius
_P_R0 = 7         # camera r
_P_U0 = 8         # camera u = cos(theta)
_P_S0 = 9         # camera sin(theta)
_P_PH0 = 10       # camera phi
_P_K1 = 11        # tan(fov/2) * aspect
_P_K2 = 12        # tan(fov/2)
_P_ROLLC = 13
_P_ROLLS = 14
_P_JX = 15        # sub-pixel jitter
_P_JY = 16
_P_C0 = 17        # 4 KS-lowered tetrad coefficient 4-vectors: 17..32
_P_CR = 21
_P_CTH = 25
_P_CPH = 29
_P_CHEB_MID = 33  # precull critical-curve Chebyshev domain
_P_CHEB_HALF = 34
_P_LAM_LO = 35
_P_LAM_HI = 36
_P_FLIP = 37      # sign(a) isometry flip for the precull lam
_P_ACHEB = 38     # |a| clamped to the Chebyshev fit's validated range
_P_INV_LOGR = 39  # 1 / log(r_out / r_in) (spectral t-shape domain)
_P_ETA = 40                       # precull eta_c coeffs, _CHEB_K wide
_P_TSHAPE = _P_ETA + _CHEB_K      # spectral t-shape coeffs
_P_RGB = _P_TSHAPE + SPECTRAL_CHEB_K   # 3 x SPECTRAL_CHEB_K rgb coeffs
# Shadow-overlay block (fragment.glsl.ts:279-325 in-kernel): Gaussian line
# width + the 2*_OVERLAY_N-point closed Bardeen polyline (alpha, beta,
# valid) in celestial coordinates — zeros when the feature is off.
_OVERLAY_N = 32                   # half-curve points (overlay.py n_pts)
_P_OVW = _P_RGB + 3 * SPECTRAL_CHEB_K
_P_OAL = _P_OVW + 1
_P_OBE = _P_OAL + 2 * _OVERLAY_N
_P_OVA = _P_OBE + 2 * _OVERLAY_N
# NRS far-field block (models/nrs.py in-kernel): b_min, theta_obs/pi, and
# the flat 4x16 MLP weight buffer (nrs_flat_weights layout) — zeros when
# the feature is off.
_P_NRS_BMIN = _P_OVA + 2 * _OVERLAY_N
_P_NRS_TH = _P_NRS_BMIN + 1
_P_NRS_W = _P_NRS_TH + 1
_NRS_FLAT = (3 * 16 + 16) + 2 * (16 * 16 + 16) + (16 * 3 + 3)  # 659
_P_TOTAL = _P_NRS_W + _NRS_FLAT
_P_PAD = _cdiv(_P_TOTAL, 128) * 128


# Unrolled-list Clenshaw shared with the jnp spectral twin (one DAG).
from blackhole_simulation_tpu.render.shading import (  # noqa: E402
    cheb_clenshaw as _clenshaw,
)


def _clenshaw_smem(params_ref, base: int, K: int, t):
    """Clenshaw over SMEM coefficients via a fori_loop with dynamic scalar
    reads. The unrolled form held K live scalars per series across the
    composite (4 slots x 4 series x 16 = 256 loads): Mosaic's scheduler
    went superlinear and the spectral kernel compiled in ~140 s vs ~5 s
    analytic; this loop form compiles flat and costs ~2 vector FMAs per
    coefficient at run time (identical arithmetic order, so it stays
    bit-equal to _clenshaw / precull._cheb_eval)."""

    def body(n, carry):
        b1, b2 = carry
        j = K - 1 - n
        c = params_ref[0, base + j]
        return 2.0 * t * b1 - b2 + c, b1

    # carry seeded from t itself: a replicated zeros constant trips a
    # Mosaic relayout check when carried through the loop
    b1, b2 = jax.lax.fori_loop(0, K - 1, body, (t * 0.0, t * 0.0))
    return t * b1 - b2 + params_ref[0, base]


def _render_kernel(params_ref, *out_refs, cfg, features, disk,
                   stars, jet_params, width, height, approx_recip,
                   precull_on, nrs_on=False):
    band_on = cfg.refine_band > 0.0
    if band_on:
        r_ref, g_ref, b_ref, band_ref = out_refs
    else:
        r_ref, g_ref, b_ref = out_refs
    dt = r_ref.dtype
    F = lambda v: jnp.asarray(v, dt)
    sp = lambda i: params_ref[0, i]

    m = sp(_P_M)
    a = sp(_P_A)
    r_h = sp(_P_RH)
    r_ph = sp(_P_RPH)
    r_in = sp(_P_ISCO)

    shape = (SUB, LANE)
    gi = pl.program_id(0)
    gj = pl.program_id(1)
    iy = (jax.lax.broadcasted_iota(jnp.int32, shape, 0)
          + gi * SUB).astype(dt)
    ix = (jax.lax.broadcasted_iota(jnp.int32, shape, 1)
          + gj * LANE).astype(dt)

    # --- camera ray (camera_rays_u twin, from camera_scalars scalars) ---
    nx = (ix + 0.5 + sp(_P_JX)) / F(width) * 2.0 - 1.0
    ny = 1.0 - (iy + 0.5 + sp(_P_JY)) / F(height) * 2.0
    cx = nx * sp(_P_K1)
    cy = ny * sp(_P_K2)
    cx, cy = (cx * sp(_P_ROLLC) - cy * sp(_P_ROLLS),
              cx * sp(_P_ROLLS) + cy * sp(_P_ROLLC))
    inv_norm = F(1.0) / jnp.sqrt(1.0 + cx * cx + cy * cy)
    n_r = -inv_norm
    n_th = -cy * inv_norm
    n_ph = -cx * inv_norm
    p = [sp(_P_C0 + j) + n_r * sp(_P_CR + j) + n_th * sp(_P_CTH + j)
         + n_ph * sp(_P_CPH + j) for j in range(4)]
    inv = F(1.0) / (-p[0])
    s0 = sp(_P_S0)
    pr = p[1] * inv
    pu = -(p[2] * inv) / s0
    pph = p[3] * inv

    zero = jnp.zeros(shape, dt)
    r_row = zero + sp(_P_R0)
    u_row = zero + sp(_P_U0)
    ph_row = zero + sp(_P_PH0)
    pt_ = F(-1.0)

    # Null projection at birth (march_rows twin).
    pr = ks_renormalize_pr(m, a, r_row, u_row, pt_, pr, pu, pph)

    if cfg.start_jitter > 0.0:
        # Blue-noise-decorrelated march start (march_rows twin).
        from blackhole_simulation_tpu.ops.pallas_march import (
            start_offset_rows,
        )

        t0j, r_row, u_row, ph_row, pr, pu, _ = start_offset_rows(
            m, a, r_h, r_ph, cfg, approx_recip,
            (jnp.zeros(shape, dt), r_row, u_row, ph_row, pr, pu, pph),
        )
        zero_t = t0j
    else:
        zero_t = jnp.zeros(shape, dt)

    # --- shadow precull (capture_mask_u twin; eta_c from SMEM Chebyshev) ---
    hor_thr = sp(_P_HORTHR)
    if precull_on or band_on or nrs_on:
        flip = sp(_P_FLIP)
        lam = flip * pph           # inv_e = 1 with p_t = -1
        w0 = 1.0 - u_row * u_row
        s2 = jnp.maximum(w0, F(1e-12))
        c2 = u_row * u_row
        q = pu * pu * w0 + c2 * (pph * pph / s2 - a * a)
        eta = q
        t_dom = jnp.clip(
            (lam - sp(_P_CHEB_MID)) / sp(_P_CHEB_HALF), F(-1.0), F(1.0)
        )
        cheb_raw = _clenshaw_smem(params_ref, _P_ETA, _CHEB_K, t_dom)
    if band_on:
        # Critical-band metric plane (precull.band_metric_values — same
        # expression DAG): the refinement pass compacts the pixels where
        # this is below MarchConfig.refine_band and re-marches them fine.
        # The optional pole criterion folds in on the same scale.
        from blackhole_simulation_tpu.render.precull import (
            band_metric_values,
            fold_pole_metric,
            pole_w_min_values,
        )

        d_band = band_metric_values(
            m, eta, cheb_raw, lam, sp(_P_LAM_LO), sp(_P_LAM_HI)
        )
        if cfg.refine_pole_w > 0.0:
            d_band = fold_pole_metric(
                d_band, pole_w_min_values(m, a, lam, eta),
                cfg.refine_band, cfg.refine_pole_w,
            )
        band_ref[...] = d_band
    if precull_on:
        eta_crit = cheb_raw - F(_CHEB_ERR) * m * m
        margin = F(0.04)
        inside = eta < eta_crit * (1.0 - margin) - margin * m * m
        in_range = (lam > sp(_P_LAM_LO)) & (lam < sp(_P_LAM_HI))
        ssq = r_row * r_row + a * a * c2
        delta = r_row * r_row - 2.0 * m * r_row + a * a
        dr_dlam = (2.0 * m * r_row * pt_ + delta * pr + a * pph) / ssq
        dead = in_range & inside & (eta >= F(0.0)) & (dr_dlam < F(0.0))
        thr = jnp.where(dead, sp(_P_STOPR), hor_thr)
    else:
        thr = zero + hor_thr

    if nrs_on:
        # NRS far-field march skip IN-KERNEL (models/nrs.nrs_far_field_rows
        # twin; VERDICT r4 item 4): rays whose total impact parameter
        # b = sqrt(eta + lam^2) exceeds b_min die at birth — the trained
        # MLP supplies their deflected escape direction in the composite.
        b_tot = jnp.sqrt(jnp.maximum(eta + lam * lam, F(1e-12)))
        far = b_tot > sp(_P_NRS_BMIN)
        thr = jnp.where(far, F(1e9), thr)

    # --- march (shared VMEM tile loop) ---
    rows0 = (zero_t, r_row, u_row, ph_row, pr, pu, pph)
    if cfg.multistep and not features.jets:
        from blackhole_simulation_tpu.ops.pallas_march import march_tile_ab3

        t, r, u, ph, pr_f, pu_f, hit, steps, cr, cp, ct, nc, rmin, jet = (
            march_tile_ab3(m, a, r_h, r_ph, thr, rows0, cfg, approx_recip)
        )
    else:
        t, r, u, ph, pr_f, pu_f, hit, steps, cr, cp, ct, nc, rmin, jet = (
            march_tile(
                m, a, r_h, r_ph, thr, rows0, cfg, approx_recip,
                jets=jet_params if features.jets else None,
            )
        )

    # --- composite (shade_march_rows twin) ---
    from blackhole_simulation_tpu.render.march import HIT_ESCAPE

    escaped = hit == HIT_ESCAPE
    lam_row = pph  # -p_phi / p_t with p_t = -1
    rgb = (zero, zero, zero)
    trans = zero + F(1.0)
    if features.disk:
        from blackhole_simulation_tpu.geometry.metrics import KS, Kerr

        bh_s = Kerr(mass=m, spin=a, chart=KS)
        for k in range(cfg.max_crossings):
            filled = k < nc
            octaves = 3 if k == 0 else 1
            if features.spectral_lut:
                c_rgb, c_alpha, valid = _disk_slot_spectral(
                    params_ref, sp(_P_INV_LOGR), disk, m, a, r_in,
                    cr[k], cp[k], ct[k], lam_row, dt, octaves,
                )
            else:
                c_rgb, c_alpha, valid = disk_emission_rows(
                    disk, bh_s, cr[k], cp[k], ct[k], lam_row, dt,
                    octaves=octaves, r_in=r_in,
                )
            wgt = jnp.where(filled & valid, trans * c_alpha, F(0.0))
            rgb = tuple(acc + wgt * c for acc, c in zip(rgb, c_rgb))
            trans = jnp.where(filled & valid, trans * (1.0 - c_alpha), trans)

    if features.starfield:
        from blackhole_simulation_tpu.geometry.metrics import KS, Kerr

        bh_s = Kerr(mass=m, spin=a, chart=KS)
        dummy = (0.0, 100.0, 0.0, 0.0, -1.0, -1.0, 0.0, 0.0)
        fin = (t, r, u, ph, zero + pt_, pr_f, pu_f, pph)
        srows = tuple(
            jnp.where(escaped, fin[i], F(dummy[i])) for i in range(8)
        )
        bg = starfield_rows(*escape_direction_u_rows(srows, bh_s),
                            params=stars)
        w_bg = jnp.where(escaped, trans, F(0.0))
        rgb = tuple(c + w_bg * b for c, b in zip(rgb, bg))

    if features.jets:
        # Optically-thin jets accumulated per step inside the march loop
        # (VERDICT r3 item 5: the full-featured scene runs the fast path).
        rgb = tuple(c + j for c, j in zip(rgb, jet))

    if features.photon_ring_glow:
        near = jnp.exp(-14.0 * rmin / jnp.maximum(r_ph, F(1e-3)))
        glow = jnp.where(escaped, 0.6 * near, F(0.0))
        order = jnp.clip(nc, 0, 3).astype(dt) / 3.0
        warm = (1.0, 0.82, 0.55)
        cool = (0.82, 0.88, 1.0)
        rgb = tuple(
            c + glow * (F(w) + order * F(k - w))
            for c, w, k in zip(rgb, warm, cool)
        )

    if nrs_on and features.starfield:
        # Surrogate background for the far-field rays: the 4x16 MLP
        # (weights in SMEM) predicts the deflection angle; the incoming
        # direction Rodrigues-rotates about the orbital-plane normal and
        # samples the starfield — the exact nrs_far_field_rows recipe.
        from blackhole_simulation_tpu.geometry.metrics import KS, Kerr

        bh_n = Kerr(mass=m, spin=a, chart=KS)
        birth = (jnp.zeros(shape, dt), zero + sp(_P_R0), u_row, ph_row,
                 zero + pt_, pr, pu, pph)
        vx, vy, vz = escape_direction_u_rows(birth, bh_n)
        r0s = sp(_P_R0)
        s0r = sp(_P_S0)
        u0r = sp(_P_U0)
        px = r0s * s0r * jnp.cos(ph_row)
        py = r0s * s0r * jnp.sin(ph_row)
        pz = zero + r0s * u0r

        # MLP forward (nrs_apply twin). Layer 1's theta/spin inputs are
        # scalars, so only the b-channel is a vector FMA per unit.
        wref = lambda i: params_ref[0, _P_NRS_W + i]
        bn = b_tot * F(1.0 / 40.0)
        thn = sp(_P_NRS_TH)
        h = []
        for j in range(16):
            acc = (bn * wref(0 * 16 + j)
                   + (thn * wref(1 * 16 + j) + a * wref(2 * 16 + j)
                      + wref(48 + j)))
            h.append(jnp.tanh(acc))
        off = 64
        for _layer in range(2):
            h2 = []
            for j in range(16):
                acc = zero + wref(off + 256 + j)  # bias
                for i in range(16):
                    acc = acc + h[i] * wref(off + i * 16 + j)
                h2.append(jnp.tanh(acc))
            h = h2
            off += 272
        alpha_d = zero + wref(off + 48 + 0)  # output bias, deflection slot
        for i in range(16):
            alpha_d = alpha_d + h[i] * wref(off + i * 3 + 0)

        nxr = py * vz - pz * vy
        nyr = pz * vx - px * vz
        nzr = px * vy - py * vx
        inv_n = F(1.0) / jnp.sqrt(
            jnp.maximum(nxr * nxr + nyr * nyr + nzr * nzr, F(1e-20))
        )
        nxr, nyr, nzr = nxr * inv_n, nyr * inv_n, nzr * inv_n
        ca = jnp.cos(alpha_d)
        sa = jnp.sin(alpha_d)
        cxr = nyr * vz - nzr * vy
        cyr = nzr * vx - nxr * vz
        czr = nxr * vy - nyr * vx
        bg_far = starfield_rows(vx * ca + cxr * sa, vy * ca + cyr * sa,
                                vz * ca + czr * sa, params=stars)
        rgb = tuple(jnp.where(far, b_, c) for c, b_ in zip(rgb, bg_far))

    if features.shadow_overlay:
        # Analytic Bardeen critical-curve overlay IN-KERNEL (VERDICT r4
        # item 4; fragment.glsl.ts:279-325): the ray's conserved (lam, eta)
        # map to celestial (alpha, beta) — overlay.pixel_celestial_coords'
        # exact expressions with p_t = -1 — and the distance to the
        # 2*_OVERLAY_N-point SMEM polyline drives a Gaussian line weight.
        # Conserved quantities are invariant along the geodesic, so birth
        # rows (pu, pph, u_row post-renorm) give the exact values.
        s0o = sp(_P_S0)
        u0c = sp(_P_U0)
        w0o = 1.0 - u_row * u_row
        s2o = jnp.maximum(w0o, F(1e-12))
        etao = pu * pu * w0o + u_row * u_row * (pph * pph / s2o - a * a)
        alpha_p = -pph / s0o
        cot0 = u0c / s0o
        beta_sq = etao + a * a * u0c * u0c - pph * pph * cot0 * cot0
        beta_p = jnp.sign(pu) * jnp.sqrt(jnp.maximum(beta_sq, F(0.0)))
        deficit = jnp.maximum(-beta_sq, F(0.0))

        big = F(1e30)
        n2 = 2 * _OVERLAY_N

        def seg(i, dmin):
            j = jnp.where(i + 1 == n2, 0, i + 1)
            ax = params_ref[0, _P_OAL + i]
            ay = params_ref[0, _P_OBE + i]
            bx = params_ref[0, _P_OAL + j]
            by = params_ref[0, _P_OBE + j]
            ok = (params_ref[0, _P_OVA + i] > 0.5) & (
                params_ref[0, _P_OVA + j] > 0.5
            )
            dx, dy = bx - ax, by - ay
            len_sq = dx * dx + dy * dy
            t = jnp.clip(
                ((alpha_p - ax) * dx + (beta_p - ay) * dy)
                / jnp.maximum(len_sq, F(1e-20)),
                F(0.0), F(1.0),
            )
            ex = alpha_p - (ax + t * dx)
            ey = beta_p - (ay + t * dy)
            d = ex * ex + ey * ey
            return jnp.minimum(dmin, jnp.where(ok, d, big))

        dmin = jax.lax.fori_loop(0, n2, seg, zero + big) + deficit
        wdt = sp(_P_OVW)
        wgt = 1.2 * jnp.exp(-dmin / jnp.maximum(wdt * wdt, F(1e-12)))
        line = (0.15, 1.0, 0.35)  # overlay.py color default
        rgb = tuple(c + wgt * F(col) for c, col in zip(rgb, line))

    r_ref[...] = rgb[0]
    g_ref[...] = rgb[1]
    b_ref[...] = rgb[2]


def _disk_slot_spectral(params_ref, inv_logr, disk, m, a, r_in, r_c,
                        phi_c, t_c, lam, dt, octaves):
    """Spectral (Page-Thorne + Planck/CIE) slot shading, Chebyshev form:
    builds the coefficient scalar lists from SMEM and evaluates the shared
    slot DAG (shading.spectral_slot_core — also behind the jnp refinement
    twin disk_emission_cheb_rows, so the two stay bit-equal)."""
    from blackhole_simulation_tpu.render.shading import spectral_slot_core

    t_coeffs = [params_ref[0, _P_TSHAPE + j] for j in range(SPECTRAL_CHEB_K)]
    rgb_coeffs = [
        [params_ref[0, _P_RGB + c * SPECTRAL_CHEB_K + j]
         for j in range(SPECTRAL_CHEB_K)]
        for c in range(3)
    ]
    return spectral_slot_core(
        disk, m, a, r_in, inv_logr, t_coeffs, rgb_coeffs,
        r_c, phi_c, t_c, lam, dt, octaves,
    )


@functools.partial(jax.jit, static_argnames=("scene_static", "interpret"))
def _pallas_render(params_row, scene_static, interpret):
    cfg, features, disk, stars, jet_params, width, height, nrs_on = (
        scene_static
    )
    hp = _cdiv(height, SUB) * SUB
    wp = _cdiv(width, LANE) * LANE
    grid = (hp // SUB, wp // LANE)
    kernel = functools.partial(
        _render_kernel,
        cfg=cfg,
        features=features,
        disk=disk,
        stars=stars,
        jet_params=jet_params,
        width=width,
        height=height,
        approx_recip=cfg.approx_recip and not interpret,
        precull_on=cfg.shadow_precull,
        nrs_on=nrs_on,
    )
    n_planes = 4 if cfg.refine_band > 0.0 else 3
    out_shapes = tuple(
        jax.ShapeDtypeStruct((hp, wp), jnp.float32) for _ in range(n_planes)
    )
    out_spec = pl.BlockSpec((SUB, LANE), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        planes = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=(out_spec,) * n_planes,
            out_shape=out_shapes,
            interpret=interpret,
        )(params_row)
    return planes


def pallas_render_sample(scene, jitter, dtype=jnp.float32):
    """Linear radiance via the fused kernel — drop-in for the staged
    render_sample pipeline (render/pipeline.py dispatches here when
    MarchConfig.fused is on and no per-step jet accumulation is needed).
    Returns ((H*W, 3) radiance, band) where ``band`` is the (H*W,) critical-
    band metric plane when MarchConfig.refine_band > 0, else None."""
    from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
    from blackhole_simulation_tpu.render.camera import camera_scalars
    from blackhole_simulation_tpu.render.precull import _eta_crit_cheb_coeffs
    from blackhole_simulation_tpu.render.shading import (
        build_disk_luts,
        spectral_cheb_coeffs,
    )

    cam = scene.camera
    cfg = scene.march_cfg
    bh = Kerr(
        mass=scene.bh.mass.astype(dtype),
        spin=scene.bh.spin.astype(dtype),
        chart=KS,
    )
    m = bh.mass
    a = bh.spin

    c0, c_r, c_th, c_ph, k1, k2, roll_c, roll_s = camera_scalars(
        cam, bh, dtype
    )
    u0 = jnp.cos(cam.theta).astype(dtype)
    s0 = jnp.sqrt(jnp.maximum(1.0 - jnp.cos(cam.theta) ** 2, 1e-12)).astype(dtype)
    jx = jnp.asarray(jitter[0] if jitter is not None else 0.0, dtype)
    jy = jnp.asarray(jitter[1] if jitter is not None else 0.0, dtype)

    r_h = bh.event_horizon()
    hor_thr = cfg.horizon_factor * r_h
    isco = bh.isco()
    if cfg.precull_keep_disk:
        stop_r = jnp.maximum(jnp.maximum(isco, cfg.record_r_min), hor_thr)
    else:
        stop_r = jnp.asarray(1e9, dtype)

    # Precull critical curve on the clamped-spin validated range
    # (capture_mask_u prologue).
    flip = jnp.where(a < 0.0, -1.0, 1.0).astype(dtype)
    a_cheb = jnp.clip(jnp.abs(a), 1e-3 * m, 0.999 * m)
    eta_coeffs, cheb_mid, cheb_half, lam_lo, lam_hi = _eta_crit_cheb_coeffs(
        m, a_cheb
    )

    if scene.features.spectral_lut and scene.features.disk:
        if scene.spectral_coeffs is not None:
            # Host-precomputed tables (Scene.create): avoids compiling the
            # f64 Page-Thorne integral through the TPU toolchain (~340 s
            # measured in this environment).
            tc, rc, il = scene.spectral_coeffs
            t_coeffs = jnp.asarray(tc, dtype)
            rgb_coeffs = jnp.asarray(rc, dtype)
            inv_logr = jnp.asarray(il, dtype)
        else:
            luts = build_disk_luts(bh, scene.disk, dtype)
            t_coeffs, rgb_coeffs = spectral_cheb_coeffs(luts)
            inv_logr = (1.0 / jnp.log(luts[0][-1] / luts[0][0])).astype(dtype)
    else:
        t_coeffs = jnp.zeros((SPECTRAL_CHEB_K,), dtype)
        rgb_coeffs = jnp.zeros((3, SPECTRAL_CHEB_K), dtype)
        inv_logr = jnp.asarray(1.0, dtype)

    if scene.features.shadow_overlay:
        # In-kernel Bardeen curve (render/overlay.py twin): polyline +
        # Gaussian width, shipped as SMEM scalars.
        from blackhole_simulation_tpu.physics.shadow import bardeen_shadow

        o_al, o_be, o_va = bardeen_shadow(
            m, a, theta_obs=cam.theta, n=_OVERLAY_N
        )
        pix_b = (cam.fov / cam.height * cam.r).astype(dtype)
        o_w = jnp.maximum(0.06 * m, 1.5 * pix_b)
        overlay_block = jnp.concatenate([
            o_w[None].astype(dtype),
            o_al.astype(dtype),
            o_be.astype(dtype),
            o_va.astype(dtype),
        ])
    else:
        overlay_block = jnp.zeros((1 + 6 * _OVERLAY_N,), dtype)

    nrs_on = scene.features.nrs_far_field and scene.nrs_params is not None
    if nrs_on:
        b_min = max(
            12.0,
            scene.disk.outer_radius * 1.2 if scene.features.disk else 12.0,
        )
        # traceable flat weights (nrs_flat_weights layout; params may be
        # tracers here)
        flat_w = jnp.concatenate([
            jnp.asarray(t, dtype).ravel()
            for (w_, b_) in scene.nrs_params for t in (w_, b_)
        ])
        nrs_block = jnp.concatenate([
            jnp.asarray([b_min], dtype),
            jnp.reshape(cam.theta / jnp.pi, (1,)).astype(dtype),
            flat_w,
        ])
    else:
        nrs_block = jnp.zeros((2 + _NRS_FLAT,), dtype)

    head = jnp.stack([
        m, a, r_h, bh.photon_sphere().astype(dtype), isco, stop_r, hor_thr,
        cam.r.astype(dtype), u0, s0, cam.phi.astype(dtype),
        k1, k2, roll_c, roll_s, jx, jy,
        c0[0], c0[1], c0[2], c0[3],
        c_r[0], c_r[1], c_r[2], c_r[3],
        c_th[0], c_th[1], c_th[2], c_th[3],
        c_ph[0], c_ph[1], c_ph[2], c_ph[3],
        cheb_mid, cheb_half, lam_lo, lam_hi, flip, a_cheb, inv_logr,
    ]).astype(jnp.float32)
    row = jnp.concatenate([
        head,
        eta_coeffs.astype(jnp.float32),
        t_coeffs.astype(jnp.float32),
        rgb_coeffs.reshape(-1).astype(jnp.float32),
        overlay_block.astype(jnp.float32),
        nrs_block.astype(jnp.float32),
    ])
    row = jnp.pad(row, (0, _P_PAD - row.shape[0])).reshape(1, _P_PAD)

    scene_static = (
        cfg, scene.features, scene.disk, scene.stars, scene.jet_params,
        cam.width, cam.height, nrs_on,
    )
    interpret = jax.default_backend() != "tpu"
    planes = _pallas_render(row, scene_static, interpret)
    h, w = cam.height, cam.width
    rgb = jnp.stack([pl_[:h, :w].reshape(-1) for pl_ in planes[:3]], axis=-1)
    band = planes[3][:h, :w].reshape(-1) if len(planes) > 3 else None
    return rgb, band
