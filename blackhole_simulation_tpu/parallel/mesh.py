"""Device-mesh construction and multi-host initialization.

The TPU-native replacement for the reference's worker/SAB runtime
(SURVEY.md §5.8): a 1-D ``devices`` mesh (or 2-D ``hosts x chips``) over
which rays shard; collectives ride ICI within a slice.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def local_device_count() -> int:
    return jax.local_device_count()


def make_mesh(n_devices: int | None = None, axis_name: str = "devices") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def make_host_chip_mesh(axis_names=("hosts", "chips")) -> Mesh:
    """2-D hosts x local-chips mesh for multi-host slices: DP over both axes
    for rays; parameter psum reduces over chips (ICI) then hosts (DCN-free
    within a TPU slice)."""
    n_hosts = jax.process_count()
    n_local = jax.local_device_count()
    devs = np.asarray(jax.devices()).reshape(n_hosts, n_local)
    return Mesh(devs, axis_names)


def initialize_multihost(coordinator: str | None = None, num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """jax.distributed bring-up with retry (multi-host init can race).

    No-op when running single-process (the common dev path).
    """
    if num_processes is None or num_processes <= 1:
        return
    last = None
    for _ in range(3):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_processes,
                process_id=process_id,
            )
            return
        except Exception as e:  # pragma: no cover - env-specific
            last = e
    raise RuntimeError(f"multi-host init failed after retries: {last}")
