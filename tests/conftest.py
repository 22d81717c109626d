"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on `xla_force_host_platform_device_count=8` CPU devices (the
driver separately dry-runs the multi-chip path via __graft_entry__).
"""

import os

# Force CPU: the session environment may preset JAX_PLATFORMS to the
# (tunneled, slow for eager dispatch) TPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# fp64 for numeric golden tests (the reference solver is double-precision
# Eigen); production TPU path runs fp32 — dtype is a parameter throughout.
jax.config.update("jax_enable_x64", True)

# XLA compiles are expensive on this 2-core host; persist them across runs.
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
