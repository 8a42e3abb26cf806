"""Sharded rendering: rays data-parallel over the device mesh.

The march is embarrassingly parallel across rays (SURVEY.md §2.4: the GPU
per-pixel parallelism maps to ray-axis sharding), so the forward pass needs
no collectives at all — ``shard_map`` splits the ray batch, each device
marches its shard, and the image is reassembled by the output sharding.

Feature parity with the single-device path (VERDICT r2 item 8): Halton
supersampling (``n_samples``) accumulates inside the sharded program, and
the Pallas tile-resident kernel runs per shard — rays are regrouped into
pixel-block order GLOBALLY (ops/pallas_march.to_block_order), then padded
so every shard owns whole kernel tiles.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from blackhole_simulation_tpu.geometry.metrics import KS, Kerr
from blackhole_simulation_tpu.render.camera import camera_rays_u
from blackhole_simulation_tpu.render.march import march_rows
from blackhole_simulation_tpu.render.pipeline import (
    Scene,
    halton_jitters,
    shade_march_rows,
)
from blackhole_simulation_tpu.render.post import tonemap


def shard_rays_spec(mesh: Mesh) -> NamedSharding:
    """Rays (N, 8) shard along N over every mesh axis."""
    return NamedSharding(mesh, P(mesh.axis_names, None))


def _pad_to(n: int, multiple: int) -> int:
    return (n + multiple - 1) // multiple * multiple


@partial(jax.jit, static_argnames=("mesh", "n_samples", "dtype"))
def render_sharded(
    scene: Scene, mesh: Mesh, n_samples: int = 1, dtype=jnp.float32
) -> jnp.ndarray:
    """Render the scene with rays sharded over ``mesh``; returns the
    tone-mapped (H, W, 3) image (replicated). Ray construction is jitted
    alongside the march, so XLA partitions it with the same sharding — no
    host-side scatter. ``n_samples`` Halton-jittered sub-pixel samples
    accumulate per shard (a lax.scan, peak memory one sample), exactly like
    the single-device render().
    """
    cam = scene.camera
    h, w = cam.height, cam.width
    n_pix = w * h
    n_dev = mesh.devices.size

    cfg = scene.march_cfg
    if cfg.shadow_precull:
        import dataclasses as _dc

        cfg = _dc.replace(
            cfg,
            shadow_precull=not scene.features.jets,
            precull_keep_disk=scene.features.disk,
        )
    use_pallas = cfg.use_pallas and not scene.features.jets

    bh = Kerr(
        mass=scene.bh.mass.astype(dtype), spin=scene.bh.spin.astype(dtype), chart=KS
    )

    if use_pallas:
        from blackhole_simulation_tpu.ops.pallas_march import (
            TILE,
            from_block_order,
            to_block_order,
        )

        # Block-order globally, then give every shard whole kernel tiles.
        pad_unit = n_dev * TILE
    else:
        pad_unit = n_dev

    spec = P(mesh.axis_names, None)

    # Row-native shard body: the same camera_rays_u -> march_rows ->
    # shade_march_rows pipeline as the single-device render_sample, so
    # sharded and single-device images share one ulp stream (rays shard as
    # (8, N) rows along N).
    spec_rows = P(None, mesh.axis_names)

    def shard_fn(rays_u):
        rows = march_rows(rays_u, bh, cfg)
        lam = -rays_u[7] / jnp.where(
            jnp.abs(rays_u[4]) < 1e-12, -1.0, rays_u[4]
        )
        rgb = shade_march_rows(rows, bh, scene, dtype, lam)
        return jnp.stack(rgb, axis=-1)

    sharded = shard_map(
        shard_fn, mesh=mesh, in_specs=(spec_rows,), out_specs=spec,
        check_vma=False,
    )

    def one_sample(jitter):
        rays = camera_rays_u(cam, bh, jitter=jitter, dtype=dtype)  # (8, N)
        if use_pallas:
            rays = to_block_order(rays.T, h, w).T
        n = rays.shape[1]
        n_pad = _pad_to(n, pad_unit)
        rays = jnp.pad(rays, ((0, 0), (0, n_pad - n)))
        # Padding rays start at r = 0 -> dead at step 0; cropped below.
        rgb = sharded(rays)[:n]
        if use_pallas:
            rgb = from_block_order(rgb, h, w)
        return rgb

    if n_samples == 1:
        acc = one_sample(None)
    else:
        jitters = halton_jitters(n_samples).astype(dtype)

        def body(carry, jit_off):
            return carry + one_sample(jit_off), None

        acc, _ = jax.lax.scan(body, jnp.zeros((n_pix, 3), dtype=dtype), jitters)
        acc = acc / n_samples

    img = acc.reshape(h, w, 3)
    return tonemap(img, scene.post)


def gather_image(img: jnp.ndarray) -> jnp.ndarray:
    """Multi-host image gather (SURVEY §5.8: DCN only for the final gather).

    Under a multi-host run each process holds its addressable shards of the
    replicated image; this materializes the full array on every host via
    jax.experimental.multihost_utils. Identity in single-process runs.
    """
    if jax.process_count() == 1:
        return img
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(img, tiled=False)
