"""Test configuration: force an 8-virtual-device CPU platform.

Real multi-chip TPU hardware is unavailable in CI; sharding tests run on a
simulated 8-device CPU mesh exactly as SURVEY.md section 4 prescribes.

NOTE: this environment's sitecustomize imports jax at interpreter startup
(axon TPU plugin), which freezes env-derived config before conftest runs —
so setting os.environ here is NOT enough; we must update jax.config
directly.  XLA_FLAGS is still read at backend-init time, which happens
lazily on first device use, so setting it here works."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
