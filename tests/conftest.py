"""Test configuration: force an 8-virtual-device CPU platform.

Real multi-chip TPU hardware is unavailable in CI; the sharding tests run on
a simulated 8-device CPU mesh exactly as SURVEY.md section 4 prescribes.
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Determinism + sane threading for CI boxes.
os.environ.setdefault("JAX_ENABLE_X64", "0")
