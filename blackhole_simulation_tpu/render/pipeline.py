"""The render pipeline: scene -> supersampled image, one jitted program.

The TPU analogue of the reference's frame loop (src/hooks/useAnimation.ts +
WebGL/WebGPU renderers), with TAA replaced by supersampled accumulation:
N Halton-jittered sub-pixel samples are rendered in one batched pass and
averaged (the north-star requirement), instead of amortizing across frames.

Composition order mirrors fragment.glsl.ts:224-331: background starfield for
escaped rays, disk radiance accumulated during the march, photon-ring glow,
horizon blackout that preserves foreground disk, then post (bloom + ACES).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
from blackhole_simulation_tpu.render.camera import (
    Camera,
    camera_rays,
    camera_rays_u,
)
from blackhole_simulation_tpu.render.march import (
    HIT_ESCAPE,
    MarchConfig,
    MarchResult,
    MarchRows,
    march,
    march_rows,
)
from blackhole_simulation_tpu.render.post import PostParams, tonemap
from blackhole_simulation_tpu.render.shading import (
    DiskParams,
    JetParams,
    StarfieldParams,
    escape_direction_rows,
    escape_direction_u_rows,
    shade_crossings_rows,
    shade_disk_crossings,
    starfield_rows,
)


@dataclasses.dataclass(frozen=True)
class Features:
    """Feature toggles — the reference's #define conditional compilation
    (src/shaders/manager.ts:57-83). Static fields select traced branches;
    the jit cache keys on them exactly like the shader variant cache."""

    disk: bool = True
    starfield: bool = True
    photon_ring_glow: bool = True
    jets: bool = False  # requires disk (the ShaderManager rule, manager.ts:57-73)
    # Physics-LUT shading chain: Page-Thorne T(r) + Planck/CIE blackbody
    # lookups (render/shading.build_disk_luts) instead of the analytic
    # NT-shape + Tanner-Helland ramp — the reference's disk/spectrum LUT
    # textures (disk.rs:175-201, spectrum.rs:76-102, renderer.ts:433-464).
    spectral_lut: bool = False
    # Debug overlay: composite the analytic Bardeen critical curve over the
    # marched image (render/overlay.py), the reference's u_shadowCurve
    # distance-to-polyline overlay (fragment.glsl.ts:279-325).
    shadow_overlay: bool = False
    # NRS far-field march skip (the reference's surrogate roadmap,
    # _legacy_src/training.rs + shaders/compute/mlp.wgsl): rays with
    # impact parameter beyond the disk's reach take their escape direction
    # from the trained MLP (models/nrs.nrs_far_field_rows) and die at
    # birth instead of marching — a win for wide-fov scenes where whole
    # tiles are far-field. Needs Scene.nrs_params (trained weights);
    # staged path only (no MLP in the fused kernel).
    nrs_far_field: bool = False

    def __post_init__(self):
        if self.jets and not self.disk:
            object.__setattr__(self, "jets", False)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["bh", "camera", "spectral_coeffs", "nrs_params"],
    meta_fields=["disk", "jet_params", "stars", "features", "march_cfg", "post"],
)
@dataclasses.dataclass(frozen=True)
class Scene:
    """Full scene description. bh/camera are differentiable pytree leaves;
    the rest are static config. ``spectral_coeffs``: host-precomputed
    Chebyshev tables for the fused kernel's Page-Thorne + Planck/CIE
    shading (shading.spectral_kernel_tables) — data leaves so jit treats
    them as inputs; None when the spectral feature is off or the scene was
    built directly (the fused path then falls back to the in-trace build)."""

    bh: Kerr
    camera: Camera
    disk: DiskParams = DiskParams()
    jet_params: JetParams = JetParams()
    stars: StarfieldParams = StarfieldParams()
    features: Features = Features()
    march_cfg: MarchConfig = MarchConfig()
    post: PostParams = PostParams()
    spectral_coeffs: tuple | None = None
    # Trained NRS weights (models/nrs.train_nrs params pytree) for the
    # far-field skip; None disables Features.nrs_far_field.
    nrs_params: tuple | None = None

    @classmethod
    def create(cls, mass=1.0, spin=0.9, camera=None, **kw):
        bh = Kerr(mass=jnp.asarray(mass), spin=jnp.asarray(spin), chart=KS)
        scene = cls(bh=bh, camera=camera or Camera.create(), **kw)
        if (
            scene.spectral_coeffs is None
            and scene.features.spectral_lut
            and scene.features.disk
            and scene.march_cfg.fused
        ):
            from blackhole_simulation_tpu.render.shading import (
                spectral_kernel_tables,
            )

            scene = dataclasses.replace(
                scene,
                spectral_coeffs=spectral_kernel_tables(
                    float(mass), float(spin), scene.disk
                ),
            )
        return scene


def ensure_spectral_coeffs(scene: Scene) -> Scene:
    """Backfill host-precomputed spectral Chebyshev tables on any scene that
    needs them but was built without (the ``dataclasses.replace`` footgun,
    VERDICT r4): called at the public jit boundaries (render /
    render_radiance), where bh.mass/spin are concrete — the cached host f64
    build (shading.spectral_kernel_tables) then replaces the ~340 s in-trace
    TPU compile of the Page-Thorne LUT builder. A scene whose parameters are
    already tracers (render nested in an outer jit) is returned unchanged —
    the traced fallback still works, it is just slow to compile."""
    import jax.core as _core

    needs = (
        scene.spectral_coeffs is None
        and scene.features.spectral_lut
        and scene.features.disk
        and scene.march_cfg.fused
    )
    if not needs:
        return scene
    if isinstance(scene.bh.mass, _core.Tracer) or isinstance(
        scene.bh.spin, _core.Tracer
    ):
        return scene
    from blackhole_simulation_tpu.render.shading import spectral_kernel_tables

    return dataclasses.replace(
        scene,
        spectral_coeffs=spectral_kernel_tables(
            float(scene.bh.mass), float(scene.bh.spin), scene.disk
        ),
    )


def fused_path_active(scene: Scene) -> bool:
    """True when render_sample dispatches to the fused megakernel — which
    then handles the shadow overlay (and NRS far-field skip) IN-KERNEL
    (ops/pallas_render.py), so render() must not composite the overlay a
    second time."""
    return scene.march_cfg.use_pallas and scene.march_cfg.fused


def _halton(i: int, base: int) -> float:
    f, r = 1.0, 0.0
    while i > 0:
        f /= base
        r += f * (i % base)
        i //= base
    return r


def halton_jitters(n: int):
    """n Halton(2,3) sub-pixel offsets in [-0.5, 0.5]^2 (compute.wgsl.ts:135-157)."""
    return jnp.array(
        [[_halton(i + 1, 2) - 0.5, _halton(i + 1, 3) - 0.5] for i in range(n)]
    )


def shade_sample_rows(
    result: MarchResult,
    bh: Kerr,
    scene: Scene,
    dtype,
    y0: jnp.ndarray,
    density_scale=1.0,
    intensity_scale=1.0,
):
    """Compose one sub-sample's radiance as (r, g, b) channel rows.

    All composition runs on (N,) channel rows (shading.blackbody_ramp_rows
    rationale: (N, 3)/(N, 8)-minor layouts run at 3/128 lane occupancy on
    TPU); callers stack to (N, 3) once at the end — after any pixel
    reordering, so block-order renders reorder 3 rows instead of the whole
    MarchResult.
    """
    escaped = result.hit == HIT_ESCAPE
    n = result.hit.shape[0]
    if scene.features.disk:
        rgb, trans = shade_disk_crossings(
            result, bh, scene.disk, y0, dtype, density_scale, intensity_scale,
            spectral=scene.features.spectral_lut,
        )
    else:
        rgb = tuple(jnp.zeros((n,), dtype=dtype) for _ in range(3))
        trans = jnp.ones((n,), dtype=dtype)

    if scene.features.starfield:
        # Evaluate the background only from escaped-ray states; captured rays
        # get a fixed dummy far-field state so no garbage (or NaN gradient)
        # flows through the masked-out lanes (0 * NaN poisons both passes).
        # state.T is the march's native row layout (XLA cancels the double
        # transpose); the dummy substitution happens per row.
        dummy = (0.0, 100.0, 1.5707964, 0.0, -1.0, -1.0, 0.0, 0.0)
        st = result.state.T
        rows = tuple(
            jnp.where(escaped, st[i], jnp.asarray(dummy[i], dtype))
            for i in range(8)
        )
        bg = starfield_rows(*escape_direction_rows(rows, bh), params=scene.stars)
        # Background shows through remaining transmittance on escaped rays
        # only; captured rays keep the horizon black behind any foreground
        # disk (fragment.glsl.ts:270-274).
        w_bg = jnp.where(escaped, trans, 0.0)
        rgb = tuple(c + w_bg * b for c, b in zip(rgb, bg))

    if scene.features.jets:
        # Optically-thin jets: additive on top (chunks/disk.ts:117-155).
        jt = result.jet_radiance.T  # (3, N) march-native rows
        rgb = tuple(c + jt[i] for i, c in enumerate(rgb))

    if scene.features.photon_ring_glow:
        # Photon-ring glow from the RECORDED march minimum of |r - r_ph|
        # (fragment.glsl.ts:198-200, 246-257): e^{-k d_min} on ESCAPING rays
        # only — captured rays are blacked out by the horizon exactly as the
        # reference's horizon blackout (fragment.glsl.ts:270-274), so the
        # ring is the thin bright band of near-critical winding rays, not an
        # interior haze. Higher-order rings tint by the recorded crossing
        # count (the reference's photon-crossing counter).
        r_ph = bh.photon_sphere().astype(dtype)
        near = jnp.exp(-14.0 * result.r_min_ph / jnp.maximum(r_ph, 1e-3))
        glow = jnp.where(escaped, 0.6 * near, 0.0)
        # Ring-order tint: direct image warm, higher orders shift cool (the
        # reference's crossing-order ring coloring) — blended arithmetically
        # (a per-ray table gather is a 2M-lane dynamic gather on TPU).
        order = jnp.clip(result.n_crossings, 0, 3).astype(dtype) / 3.0
        warm = (1.0, 0.82, 0.55)
        cool = (0.82, 0.88, 1.0)
        rgb = tuple(
            c + glow * (w + order * (k - w))
            for c, w, k in zip(rgb, warm, cool)
        )
    return rgb


def shade_sample(result, bh, scene, dtype, y0, density_scale=1.0,
                 intensity_scale=1.0) -> jnp.ndarray:
    """(N, 3) convenience wrapper over shade_sample_rows."""
    rgb = shade_sample_rows(
        result, bh, scene, dtype, y0, density_scale, intensity_scale
    )
    return jnp.stack(rgb, axis=-1)


def shade_march_rows(
    rows: MarchRows,
    bh: Kerr,
    scene: Scene,
    dtype,
    lam,
    density_scale=1.0,
    intensity_scale=1.0,
):
    """Row-native twin of shade_sample_rows: consumes MarchRows directly —
    zero relayouts between the march and the composite (the r3 profile paid
    ~3 ms/frame of (8,N)<->(N,8)/(K,N)<->(N,K) copies at 1080p).

    ``lam``: the (N,) conserved impact parameter L_z/E row.
    """
    escaped = rows.hit == HIT_ESCAPE
    n = rows.hit.shape[0]
    if scene.features.disk:
        rgb, trans = shade_crossings_rows(
            bh, scene.disk, rows.cross_r, rows.cross_phi, rows.cross_t,
            rows.n_crossings, lam, dtype, density_scale, intensity_scale,
            spectral=scene.features.spectral_lut,
            spectral_coeffs=scene.spectral_coeffs,
        )
    else:
        rgb = tuple(jnp.zeros((n,), dtype=dtype) for _ in range(3))
        trans = jnp.ones((n,), dtype=dtype)

    if scene.features.starfield:
        # Captured rays get a fixed far-field dummy state (u-form: theta =
        # pi/2 -> u = 0, p_u = 0) so no garbage/NaN flows through masked
        # lanes (see shade_sample_rows).
        dummy = (0.0, 100.0, 0.0, 0.0, -1.0, -1.0, 0.0, 0.0)
        st = rows.state_u
        srows = tuple(
            jnp.where(escaped, st[i], jnp.asarray(dummy[i], dtype))
            for i in range(8)
        )
        bg = starfield_rows(*escape_direction_u_rows(srows, bh),
                            params=scene.stars)
        w_bg = jnp.where(escaped, trans, 0.0)
        rgb = tuple(c + w_bg * b for c, b in zip(rgb, bg))

    if scene.features.jets:
        rgb = tuple(c + rows.jet_radiance[i] for i, c in enumerate(rgb))

    if scene.features.photon_ring_glow:
        r_ph = bh.photon_sphere().astype(dtype)
        near = jnp.exp(-14.0 * rows.r_min_ph / jnp.maximum(r_ph, 1e-3))
        glow = jnp.where(escaped, 0.6 * near, 0.0)
        order = jnp.clip(rows.n_crossings, 0, 3).astype(dtype) / 3.0
        warm = (1.0, 0.82, 0.55)
        cool = (0.82, 0.88, 1.0)
        rgb = tuple(
            c + glow * (w + order * (k - w))
            for c, w, k in zip(rgb, warm, cool)
        )
    return rgb


def refine_critical_band(
    scene: Scene,
    cfg: MarchConfig,
    bh: Kerr,
    dtype,
    jitter,
    rgb,
    band,
    pix_ids=None,
):
    """Critical-band refinement pass (VERDICT r4 item 1): compact the rays
    whose conserved (lambda, eta) are within ``cfg.refine_band`` of the
    Bardeen critical curve (precull.band_metric_values — the step-size-
    sensitive capture/escape boundary), re-march them as ONE dense batch at
    ``cfg.refine_step_rate`` with a ``cfg.refine_max_steps`` budget, shade
    them through the standard composite, and overwrite their pixels.

    ``rgb``: (N, 3) radiance in any pixel order; ``band``: (N,) metric in
    the same order; ``pix_ids``: row-major pixel id per position (None =
    identity). The compaction is the ray-level form of the reference's
    screen-tile queue (_legacy_src/tiling.rs): the ~0.5-2% chaotic pixels
    stop dictating the whole frame's step rate.
    """
    from blackhole_simulation_tpu.render.camera import camera_rays_u

    from blackhole_simulation_tpu.render.march import refinement_config

    n = band.shape[0]
    k = min(cfg.refine_budget, n)
    # top_k of -band = the k MOST chaotic pixels, already cost-sorted
    # ascending in the metric — so the compacted Pallas tiles are
    # cost-coherent (each tile pays its slowest ray; grouping like-cost
    # rays lets all but the hottest tiles exit early — the ray-level form
    # of the reference's cost-sorted tile queue). An overflowing band
    # degrades by dropping its LEAST chaotic pixels, the right policy.
    # (nonzero+argsort measured ~10x slower in-pipeline on TPU.)
    h, w = scene.camera.height, scene.camera.width
    blk = 4
    if h % blk == 0 and w % blk == 0 and k % (blk * blk) == 0 and k >= 2048:
        # Two-stage selection: a full-plane top_k costs ~4 ms at 1080p;
        # reducing to 4x4-block minima first shrinks the sort 16x, and a
        # 2x block overprovision keeps the final per-pixel top_k exact
        # unless more than 2k band pixels exist (then the least chaotic
        # spill — same overflow policy as the budget itself).
        bb = band.reshape(h // blk, blk, w // blk, blk).min(axis=(1, 3))
        kb = min(2 * k // (blk * blk), bb.size)
        _, bsel = jax.lax.top_k(-bb.reshape(-1), kb)
        by = bsel // (w // blk)
        bx = bsel % (w // blk)
        dy = jnp.arange(blk)
        cand = ((by[:, None, None] * blk + dy[None, :, None]) * w
                + bx[:, None, None] * blk + dy[None, None, :]).reshape(-1)
        neg, ci = jax.lax.top_k(-jnp.take(band, cand), k)
        sel = jnp.take(cand, ci)
    else:
        neg, sel = jax.lax.top_k(-band, k)
    sel = jnp.where(-neg < cfg.refine_band, sel, n)
    sel_c = jnp.minimum(sel, n - 1)
    ids = sel_c if pix_ids is None else jnp.take(pix_ids, sel_c)

    rays_sel = camera_rays_u(scene.camera, bh, pix_ids=ids, jitter=jitter,
                             dtype=dtype)
    cfg_fine = refinement_config(cfg)
    jets = scene.jet_params if scene.features.jets else None
    rows_f = march_rows(rays_sel, bh, cfg_fine, jets=jets)
    lam_sel = -rays_sel[7] / jnp.where(
        jnp.abs(rays_sel[4]) < 1e-12, -1.0, rays_sel[4]
    )
    rgb_f = shade_march_rows(rows_f, bh, scene, dtype, lam_sel)
    # Out-of-band fill entries carry sel == n: dropped by the scatter.
    return rgb.at[sel].set(jnp.stack(rgb_f, axis=-1), mode="drop")


def render_sample(scene: Scene, jitter, dtype=jnp.float32) -> jnp.ndarray:
    """Render one jittered sub-sample: (H*W, 3) linear radiance.

    Fully row-native (VERDICT r3 / perf): rays are BORN as (8, N) u-chart
    rows with p_t normalized to -1 (camera_rays_u), the march runs and
    returns rows (march_rows), and the composite consumes rows
    (shade_march_rows) — the only packed/relayout step left is restoring
    row-major pixel order for the 3 radiance rows on the Pallas path.
    """
    bh = Kerr(
        mass=scene.bh.mass.astype(dtype),
        spin=scene.bh.spin.astype(dtype),
        chart=KS,
    )
    jets = scene.jet_params if scene.features.jets else None
    cfg = scene.march_cfg
    if cfg.shadow_precull:
        # Jets accumulate per-step emission all the way to the horizon, so
        # early-stopping culled rays would lose real radiance; the disk
        # feature decides whether culled rays must keep marching to the
        # ISCO for their foreground crossings (see MarchConfig).
        cfg = dataclasses.replace(
            cfg,
            shadow_precull=not scene.features.jets,
            precull_keep_disk=scene.features.disk,
        )
    use_pallas = cfg.use_pallas and jets is None
    h, w = scene.camera.height, scene.camera.width
    if cfg.use_pallas and cfg.fused:
        # Fully-fused megakernel: the whole sample in one Pallas program
        # (ops/pallas_render.py), INCLUDING per-step jet accumulation in
        # its march loop AND the NRS far-field skip / shadow overlay
        # (VERDICT r4 item 4: every Features combination runs fused). The
        # scene must carry cfg with any precull adjustments applied, so
        # rebuild it here.
        from blackhole_simulation_tpu.ops.pallas_render import (
            pallas_render_sample,
        )

        scene_f = dataclasses.replace(scene, march_cfg=cfg)
        rgb, band = pallas_render_sample(scene_f, jitter, dtype)
        if band is not None:
            rgb = refine_critical_band(
                scene_f, cfg, bh, dtype, jitter, rgb, band
            )
        return rgb
    if use_pallas:
        # March AND shade in pixel-block order (shading is pure per-ray, so
        # order is irrelevant), then restore row-major order for just the 3
        # radiance rows. Rays are born in block order (camera_rays_u over
        # block-ordered pixel ids, which XLA constant-folds).
        from blackhole_simulation_tpu.ops.pallas_march import (
            from_block_order,
            to_block_order,
        )

        ids = to_block_order(jnp.arange(h * w, dtype=jnp.int32), h, w)
    else:
        ids = None
    rays_u = camera_rays_u(scene.camera, bh, pix_ids=ids, jitter=jitter,
                           dtype=dtype)
    nrs_on = (
        scene.features.nrs_far_field
        and scene.nrs_params is not None
        and jets is None
    )
    thr = None
    if nrs_on:
        from blackhole_simulation_tpu.models.nrs import nrs_far_field_rows
        from blackhole_simulation_tpu.render.march import precull_threshold

        # Far = beyond any visible disk crossing (min radius ~ b - M), so
        # the skip is lossless for the disk; the surrogate supplies the
        # background direction.
        b_min = max(
            12.0,
            scene.disk.outer_radius * 1.2 if scene.features.disk else 12.0,
        )
        far, far_dirs = nrs_far_field_rows(
            scene.nrs_params, rays_u, bh, b_min=b_min
        )
        thr = jnp.where(
            far, jnp.asarray(1e9, dtype), precull_threshold(rays_u, bh, cfg)
        )
    rows = march_rows(rays_u, bh, cfg, jets=jets, thr=thr)
    # Conserved impact parameter lambda = L_z/E = -p_phi/p_t; camera_rays_u
    # normalizes p_t to -1, but compute it generally (2 cheap row ops) so
    # externally-built rays keep working.
    lam = -rays_u[7] / jnp.where(jnp.abs(rays_u[4]) < 1e-12, -1.0, rays_u[4])
    rgb = shade_march_rows(rows, bh, scene, dtype, lam)
    if nrs_on and scene.features.starfield:
        bg_far = starfield_rows(*far_dirs, params=scene.stars)
        rgb = tuple(jnp.where(far, b_, c) for c, b_ in zip(rgb, bg_far))
    if use_pallas:
        rgb = tuple(from_block_order(c, h, w) for c in rgb)
    out = jnp.stack(rgb, axis=-1)
    if cfg.refine_band > 0.0:
        # Staged-path refinement: the band metric comes from the born rays'
        # conserved quantities (the fused path reads it off the kernel's
        # band plane instead). Output is row-major here, so pix_ids is the
        # identity for the jnp path and the block-order map otherwise.
        from blackhole_simulation_tpu.render.precull import (
            critical_band_metric_u,
        )

        band = critical_band_metric_u(
            bh.mass, bh.spin, rays_u,
            refine_band=cfg.refine_band, refine_pole_w=cfg.refine_pole_w,
        )
        if use_pallas:
            band = from_block_order(band, h, w)
        out = refine_critical_band(scene, cfg, bh, dtype, jitter, out, band)
    return out


def render_sample_scaled(scene: Scene, jitter=None, dtype=jnp.float32,
                         density_scale=1.0, intensity_scale=1.0):
    """render_sample through the jnp rows path with traced disk scales —
    the differentiable entry the inverse path and the disk-parameter
    gradient gate use (density/t_peak enter as multiplicative scales on
    the static DiskParams, parallel/train._forward convention)."""
    bh = Kerr(
        mass=scene.bh.mass.astype(dtype),
        spin=scene.bh.spin.astype(dtype),
        chart=KS,
    )
    rays_u = camera_rays_u(scene.camera, bh, jitter=jitter, dtype=dtype)
    rows = march_rows(rays_u, bh, scene.march_cfg)
    lam = -rays_u[7] / jnp.where(jnp.abs(rays_u[4]) < 1e-12, -1.0, rays_u[4])
    rgb = shade_march_rows(
        rows, bh, scene, dtype, lam,
        density_scale=density_scale, intensity_scale=intensity_scale,
    )
    return jnp.stack(rgb, axis=-1)


@partial(jax.jit, static_argnames=("n_samples", "dtype"))
def _render_jit(scene: Scene, n_samples: int = 1, dtype=jnp.float32) -> jnp.ndarray:
    cam = scene.camera
    jitters = halton_jitters(n_samples).astype(dtype)

    if n_samples == 1:
        acc = render_sample(scene, None, dtype)
    else:
        def body(carry, jit_off):
            return carry + render_sample(scene, jit_off, dtype), None

        init = jnp.zeros((cam.width * cam.height, 3), dtype=dtype)
        acc, _ = jax.lax.scan(body, init, jitters)
        acc = acc / n_samples

    if scene.features.shadow_overlay and not fused_path_active(scene):
        # Analytic Bardeen curve over the marched image, blended before tone
        # mapping exactly as the reference does (fragment.glsl.ts:279-331).
        # The overlay is geometric (jitter-independent): computed once from
        # the unjittered center rays. The fused megakernel composites the
        # identical curve IN-KERNEL instead (VERDICT r4 item 4).
        from blackhole_simulation_tpu.render.overlay import shadow_overlay

        bh = Kerr(
            mass=scene.bh.mass.astype(dtype),
            spin=scene.bh.spin.astype(dtype),
            chart=KS,
        )
        rays0 = camera_rays(cam, bh, dtype=dtype)
        # ~1.5 pixels of impact parameter (b ~ r0 * angle), floored at
        # 0.06 M so the line stays thin at high resolution.
        pix_b = (cam.fov / cam.height * cam.r).astype(dtype)
        width = jnp.maximum(0.06 * bh.mass.astype(dtype), 1.5 * pix_b)
        acc = shadow_overlay(acc, rays0, bh, cam.theta, dtype, line_width=width)

    img = acc.reshape(cam.height, cam.width, 3)
    return tonemap(img, scene.post)


def render(scene: Scene, n_samples: int = 1, dtype=jnp.float32) -> jnp.ndarray:
    """Render the scene to a tone-mapped (H, W, 3) image.

    ``n_samples`` Halton-jittered sub-pixel samples are marched in one
    batched program (scan over samples keeps peak memory at one sample) and
    averaged — supersampled accumulation replacing the reference's TAA.
    Spectral scenes built without host coefficients are lazily backfilled
    here, before jit (ensure_spectral_coeffs).
    """
    return _render_jit(ensure_spectral_coeffs(scene), n_samples, dtype)


@partial(jax.jit, static_argnames=("dtype",))
def _render_radiance_jit(scene: Scene, dtype=jnp.float32) -> jnp.ndarray:
    cam = scene.camera
    acc = render_sample(scene, None, dtype)
    return acc.reshape(cam.height, cam.width, 3)


def render_radiance(scene: Scene, dtype=jnp.float32) -> jnp.ndarray:
    """Un-tonemapped single-sample radiance (H, W, 3) — the differentiable
    target used by inverse rendering and oracle validation. Lazily
    backfills spectral coefficients (ensure_spectral_coeffs) before jit."""
    return _render_radiance_jit(ensure_spectral_coeffs(scene), dtype)


@jax.jit
def oracle_render(scene: Scene) -> jnp.ndarray:
    """f64 oracle radiance (H, W, 3): the adaptive-RKF45 reference
    integrator (geodesic/oracle.py, mirroring gravitas-core
    geodesic/mod.rs:180-253) driving the SAME shading code as the fast
    path. The BASELINE correctness gate compares render_radiance against
    this (tests/test_oracle_gate.py)."""
    from blackhole_simulation_tpu.geodesic.oracle import oracle_march

    dtype = jnp.float64
    bh = Kerr(
        mass=scene.bh.mass.astype(dtype),
        spin=scene.bh.spin.astype(dtype),
        chart=KS,
    )
    cam = scene.camera
    rays = camera_rays(cam, bh, dtype=dtype)
    result = oracle_march(rays, bh, scene.march_cfg)
    acc = shade_sample(result, bh, scene, dtype, rays)
    return acc.reshape(cam.height, cam.width, 3)
