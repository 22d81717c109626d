"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on `xla_force_host_platform_device_count=8` CPU devices (the
driver separately dry-runs the multi-chip path via __graft_entry__).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# fp64 for numeric golden tests (the reference solver is double-precision
# Eigen); production TPU path runs fp32 — dtype is a parameter throughout.
jax.config.update("jax_enable_x64", True)
