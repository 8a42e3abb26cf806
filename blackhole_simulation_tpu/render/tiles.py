"""Screen-tile scheduler for progressive rendering.

TPU re-design of the reference's tile machinery — the legacy Rust
TileManager priority queue (physics-engine/_legacy_src/tiling.rs) and the
WGSL TiledRayBatch wavefront queue (src/shaders/compute.wgsl.ts /
types.wgsl.ts): the screen is split into fixed tiles, tiles are prioritized
(center-weighted at first; by accumulated image variance once data exists),
and each ``next_batch`` returns a fixed-size batch of tiles whose rays are
rendered as ONE dense (batch*tile_area,) ray tensor via
camera.camera_rays_indexed — static shapes, so every pass reuses one
compiled program. ``ProgressiveRenderer`` drives batches until the frame
converges, writing into a persistent accumulation image.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from blackhole_simulation_tpu.render.camera import Camera, camera_rays_indexed
from blackhole_simulation_tpu.render.march import MarchConfig, march
from blackhole_simulation_tpu.render.pipeline import Scene, shade_sample


@dataclasses.dataclass(frozen=True)
class TileGrid:
    width: int
    height: int
    tile: int = 64

    @property
    def nx(self) -> int:
        return -(-self.width // self.tile)

    @property
    def ny(self) -> int:
        return -(-self.height // self.tile)

    @property
    def n_tiles(self) -> int:
        return self.nx * self.ny

    def pixel_ids(self, tile_ids: np.ndarray) -> np.ndarray:
        """Flat row-major pixel ids for a batch of tiles: (B, tile*tile).
        Edge tiles clamp out-of-frame pixels to their last in-frame row/col
        (duplicated work instead of dynamic shapes)."""
        ty, tx = np.divmod(np.asarray(tile_ids, np.int64), self.nx)
        dy, dx = np.meshgrid(
            np.arange(self.tile), np.arange(self.tile), indexing="ij"
        )
        py = np.minimum(ty[:, None, None] * self.tile + dy, self.height - 1)
        px = np.minimum(tx[:, None, None] * self.tile + dx, self.width - 1)
        return (py * self.width + px).reshape(len(ty), -1)


class TileManager:
    """Priority tile queue (tiling.rs TileManager).

    Initial priority is center-weighted (the black hole sits at frame
    center); after a pass, ``report`` feeds per-tile luminance variance back
    so detailed tiles (photon ring, disk edge) are revisited first when
    refining with more samples.
    """

    def __init__(self, grid: TileGrid):
        self.grid = grid
        ty, tx = np.divmod(np.arange(grid.n_tiles), grid.nx)
        cy, cx = (grid.ny - 1) / 2.0, (grid.nx - 1) / 2.0
        self._priority = -np.hypot(ty - cy, tx - cx)  # center first
        self._pending = list(np.argsort(-self._priority))
        self._seen_variance = np.zeros(grid.n_tiles)

    @property
    def pending(self) -> int:
        return len(self._pending)

    def next_batch(self, size: int) -> np.ndarray:
        """Pop up to ``size`` tiles; pads by repeating the last tile so the
        batch shape (and the compiled program) is always the same."""
        if not self._pending:
            return np.empty(0, dtype=np.int64)
        take = self._pending[:size]
        self._pending = self._pending[size:]
        if len(take) < size:
            take = take + [take[-1]] * (size - len(take))
        return np.asarray(take, dtype=np.int64)

    def report(self, tile_ids: np.ndarray, variance: np.ndarray) -> None:
        """Feed measured per-tile variance back into priorities."""
        self._seen_variance[np.asarray(tile_ids)] = np.asarray(variance)

    def refine_queue(self, frac: float = 0.25) -> None:
        """Requeue the top-``frac`` highest-variance tiles for another pass."""
        n = max(1, int(self.grid.n_tiles * frac))
        order = np.argsort(-self._seen_variance)[:n]
        self._pending = list(order)


class ProgressiveRenderer:
    """Render a scene tile-batch by tile-batch into an accumulation image.

    One compiled program per (batch_tiles, tile) shape; every call to
    ``step()`` marches batch_tiles*tile^2 rays. The accumulated image is
    identical (on covered pixels) to pipeline.render_radiance because both
    shade the same march.
    """

    def __init__(self, scene: Scene, tile: int = 64, batch_tiles: int = 8):
        cam = scene.camera
        self.scene = scene
        self.grid = TileGrid(cam.width, cam.height, tile)
        self.manager = TileManager(self.grid)
        self.batch_tiles = batch_tiles
        self.image = np.zeros((cam.height, cam.width, 3), np.float32)
        self.covered = np.zeros(cam.height * cam.width, bool)
        self._render = jax.jit(self._render_ids)

    def _render_ids(self, scene: Scene, pix_ids: jnp.ndarray) -> jnp.ndarray:
        bh = scene.bh
        rays = camera_rays_indexed(
            scene.camera, bh, pix_ids, dtype=jnp.float32
        )
        cfg = scene.march_cfg
        if cfg.use_pallas:
            # Tile batches are already compact; no pixel-block reorder needed.
            cfg = dataclasses.replace(cfg, use_pallas=jax.default_backend() == "tpu")
        result = march(rays, bh, cfg)
        return shade_sample(result, bh, scene, jnp.float32, rays)

    def step(self) -> bool:
        """Render one batch of tiles. Returns False when nothing is pending."""
        ids = self.manager.next_batch(self.batch_tiles)
        if ids.size == 0:
            return False
        pix = self.grid.pixel_ids(ids)  # (B, T*T)
        rgb = np.asarray(self._render(self.scene, jnp.asarray(pix.reshape(-1))))
        rgb = rgb.reshape(len(ids), -1, 3)
        flat = self.image.reshape(-1, 3)
        var = np.zeros(len(ids))
        for i, tid in enumerate(ids):
            flat[pix[i]] = rgb[i]
            self.covered[pix[i]] = True
            luma = rgb[i] @ np.array([0.25, 0.5, 0.25])
            var[i] = float(np.var(luma))
        self.manager.report(ids, var)
        return True

    def render_all(self) -> np.ndarray:
        while self.step():
            pass
        return self.image
