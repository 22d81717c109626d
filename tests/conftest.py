"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on `xla_force_host_platform_device_count=8` CPU devices (the
driver separately dry-runs the multi-chip path via __graft_entry__).

This host injects a tunneled-TPU PJRT plugin (sitecustomize on PYTHONPATH)
and sets JAX_PLATFORMS=axon; `jax.config.update("jax_platforms", "cpu")`
overrides both in-process, giving local CPU devices with fast local compiles.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# fp64 for numeric golden tests (the reference solver is double-precision
# Eigen); production TPU path runs fp32 — dtype is a parameter throughout.
jax.config.update("jax_enable_x64", True)

# Persist XLA compiles across runs. Platform-specific dir: cache entries are
# machine-code AOT results; mixing hosts (remote TPU-side compile service vs
# local CPU) causes SIGILL on load.
os.makedirs("/tmp/jax_cache_cpu", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.05)
