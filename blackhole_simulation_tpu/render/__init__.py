"""Rendering: camera, fast masked march, shading, supersampling, post.

The TPU fast path (reference: src/shaders/ + src/rendering/), validated
against the f64 geodesic oracle.
"""

from blackhole_simulation_tpu.render.camera import (
    Camera,
    bl_to_ks_momentum,
    camera_rays,
    camera_rays_indexed,
    zamo_tetrad,
)
from blackhole_simulation_tpu.render.march import (
    HIT_ESCAPE,
    HIT_HORIZON,
    HIT_NONE,
    MarchConfig,
    MarchResult,
    march,
)
from blackhole_simulation_tpu.render.shading import (
    DiskParams,
    JetParams,
    StarfieldParams,
    blackbody_ramp,
    disk_emission,
    escape_direction,
    fbm2,
    shade_disk_crossings,
    starfield,
)
from blackhole_simulation_tpu.render.post import PostParams, aces, bloom, tonemap
from blackhole_simulation_tpu.render.pipeline import (
    Features,
    Scene,
    halton_jitters,
    oracle_render,
    render,
    render_radiance,
)

__all__ = [
    "Camera",
    "bl_to_ks_momentum",
    "camera_rays",
    "camera_rays_indexed",
    "zamo_tetrad",
    "HIT_ESCAPE",
    "HIT_HORIZON",
    "HIT_NONE",
    "MarchConfig",
    "MarchResult",
    "march",
    "DiskParams",
    "JetParams",
    "StarfieldParams",
    "blackbody_ramp",
    "disk_emission",
    "escape_direction",
    "fbm2",
    "shade_disk_crossings",
    "starfield",
    "PostParams",
    "aces",
    "bloom",
    "tonemap",
    "Features",
    "Scene",
    "halton_jitters",
    "oracle_render",
    "render",
    "render_radiance",
]
