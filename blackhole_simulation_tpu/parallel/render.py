"""Sharded rendering: rays data-parallel over the device mesh.

The march is embarrassingly parallel across rays (SURVEY.md §2.4: the GPU
per-pixel parallelism maps to ray-axis sharding), so the forward pass needs
no collectives at all — ``shard_map`` splits the ray batch, each device
marches its shard, and the image is reassembled by the output sharding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
from blackhole_simulation_tpu.render.camera import camera_rays
from blackhole_simulation_tpu.render.march import march
from blackhole_simulation_tpu.render.pipeline import Scene, shade_sample
from blackhole_simulation_tpu.render.post import tonemap


def shard_rays_spec(mesh: Mesh) -> NamedSharding:
    """Rays (N, 8) shard along N over every mesh axis."""
    return NamedSharding(mesh, P(mesh.axis_names, None))


def _pad_to(n: int, multiple: int) -> int:
    return (n + multiple - 1) // multiple * multiple


@partial(jax.jit, static_argnames=("mesh", "dtype"))
def render_sharded(scene: Scene, mesh: Mesh, dtype=jnp.float32) -> jnp.ndarray:
    """Render the scene with rays sharded over ``mesh``; returns the
    tone-mapped (H, W, 3) image (replicated). Ray construction is jitted
    alongside the march, so XLA partitions it with the same sharding — no
    host-side scatter.
    """
    cam = scene.camera
    n_pix = cam.width * cam.height
    n_dev = mesh.devices.size
    n_pad = _pad_to(n_pix, n_dev)

    bh = Kerr(mass=scene.bh.mass.astype(dtype), spin=scene.bh.spin.astype(dtype), chart=KS)

    rays = camera_rays(cam, bh, dtype=dtype)
    rays = jnp.pad(rays, ((0, n_pad - n_pix), (0, 0)))
    # Padding rays start at r = 0 -> born inside the horizon -> terminate at
    # step 0; they cost nothing and are cropped after the gather.

    spec = P(mesh.axis_names, None)

    def shard_fn(ray_shard):
        result = march(ray_shard, bh, scene.march_cfg)
        return shade_sample(result, bh, scene, dtype, ray_shard)

    rgb = shard_map(
        shard_fn, mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False
    )(rays)
    img = rgb[:n_pix].reshape(cam.height, cam.width, 3)
    return tonemap(img, scene.post)
