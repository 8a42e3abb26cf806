"""Distributed execution: device mesh, ray sharding, SPMD inverse rendering.

Designed fresh for TPU (the reference has no multi-device runtime —
SURVEY.md §2.4/§5.8): rays/tiles are data-parallel over a ``jax.sharding.Mesh``
via ``shard_map``; tiny scene-parameter gradients are all-reduced with
``psum`` over ICI; host orchestration uses ``jax.distributed`` +
multihost utils. The reference's SharedArrayBuffer layout maps to: scalars as
jit arguments, LUTs as device-resident arrays.
"""

from blackhole_simulation_tpu.parallel.mesh import (
    make_host_chip_mesh,
    make_mesh,
    local_device_count,
    initialize_multihost,
)
from blackhole_simulation_tpu.parallel.render import (
    gather_image,
    render_sharded,
    shard_rays_spec,
)
from blackhole_simulation_tpu.parallel.train import (
    InverseParams,
    init_opt_state,
    make_inverse_step,
    make_fd_inverse_step,
    make_ad_inverse_step,
    fd_inverse_render,
    ad_inverse_render,
    inverse_render,
)

__all__ = [
    "make_host_chip_mesh",
    "make_mesh",
    "local_device_count",
    "initialize_multihost",
    "gather_image",
    "render_sharded",
    "shard_rays_spec",
    "InverseParams",
    "init_opt_state",
    "make_inverse_step",
    "make_fd_inverse_step",
    "make_ad_inverse_step",
    "fd_inverse_render",
    "ad_inverse_render",
    "inverse_render",
]
