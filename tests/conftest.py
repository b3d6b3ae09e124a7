"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so that all mesh/sharding code
paths (shard_map over ICI-style meshes) are exercised without TPU hardware.
Must be set before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep CI deterministic and quiet.
os.environ.setdefault("JAX_ENABLE_X64", "0")
