"""Host environment helpers.

This machine injects a tunneled-TPU PJRT plugin into every Python process via
``PYTHONPATH`` sitecustomize, overriding ``JAX_PLATFORMS``. Tests and CPU dev
runs need real local CPU devices (virtual 8-device mesh, fast local
compiles), which requires stripping that injection *before* the interpreter
imports jax — hence re-exec.
"""

from __future__ import annotations

import os
import sys

_REEXEC_FLAG = "DPGO_TPU_CPU_REEXEC"


def ensure_cpu_devices(num_devices: int = 8) -> None:
    """Re-exec the current process on the plain CPU backend with
    ``num_devices`` virtual devices, unless already there. Call before
    importing jax."""
    if os.environ.get(_REEXEC_FLAG) == "1":
        return
    if sys.argv and sys.argv[0] == "-c":
        raise RuntimeError(
            "ensure_cpu_devices() cannot re-exec a `python -c` command; "
            "run from a script file, or launch with "
            "PYTHONPATH= JAX_PLATFORMS=cpu DPGO_TPU_CPU_REEXEC=1"
        )
    pythonpath = os.environ.get("PYTHONPATH", "")
    needs_strip = "axon" in pythonpath
    needs_cpu = os.environ.get("JAX_PLATFORMS", "") != "cpu"
    if not (needs_strip or needs_cpu):
        os.environ.setdefault(
            "XLA_FLAGS",
            f"--xla_force_host_platform_device_count={num_devices}",
        )
        return
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={num_devices}"
        ).strip()
    env[_REEXEC_FLAG] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)
