"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on `xla_force_host_platform_device_count=8` CPU devices (the
driver separately dry-runs the multi-chip path via __graft_entry__).

NOTE: this host injects a tunneled-TPU PJRT plugin into every interpreter via
PYTHONPATH sitecustomize, which overrides JAX_PLATFORMS — so the conftest
re-execs pytest once with a stripped environment to get real local CPU
devices (fast local compiles, deterministic fp64).
"""

import os
import sys

if os.environ.get("DPGO_TPU_CPU_REEXEC") != "1" and (
    "axon" in os.environ.get("PYTHONPATH", "")
    or os.environ.get("JAX_PLATFORMS", "") != "cpu"
):
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    env["DPGO_TPU_CPU_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# fp64 for numeric golden tests (the reference solver is double-precision
# Eigen); production TPU path runs fp32 — dtype is a parameter throughout.
jax.config.update("jax_enable_x64", True)

# Persist XLA compiles across runs. Platform-specific dir: cache entries are
# machine-code AOT results; mixing hosts (remote TPU-side compile service vs
# local CPU) causes SIGILL on load.
os.makedirs("/tmp/jax_cache_cpu", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
