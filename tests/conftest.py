"""Test config: force an 8-virtual-device CPU platform BEFORE jax initializes.

Multi-chip sharding tests run on this virtual mesh (the TPU-build analogue of
the reference's mock-GL test backend, src/__tests__/rendering/pipeline-e2e.test.ts).

Note: the sandbox exports JAX_PLATFORMS=axon (a tunneled real TPU whose init
takes minutes), so we must *overwrite* — not setdefault — and also update the
jax config in case jax was already imported by site customization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
