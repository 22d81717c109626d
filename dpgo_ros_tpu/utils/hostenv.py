"""Host environment helpers.

This machine injects a tunneled-TPU PJRT plugin into every Python process via
``PYTHONPATH`` sitecustomize and sets ``JAX_PLATFORMS=axon``. Tests and CPU
dev runs need real local CPU devices (virtual 8-device mesh, fast local
compiles); ``jax.config.update("jax_platforms", "cpu")`` overrides the
injection in-process — call :func:`ensure_cpu_devices` before any jax use.
"""

from __future__ import annotations

import os


def ensure_cpu_devices(num_devices: int = 8) -> None:
    """Select the local CPU backend with ``num_devices`` virtual devices.

    Must be called before the first jax backend use (importing jax is fine).
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={num_devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def host_compute():
    """Context manager routing small host-prep JAX programs to the local CPU
    backend.

    On this class of deployment the TPU is reached through a remote
    compile/dispatch service where even a trivial program costs tens of
    seconds to first-compile; initialization helpers (per-robot odometry
    chains, frame alignment) are many tiny distinct-shape programs, which
    made engine setup ~10x slower than the solve itself. Local CPU compiles
    are milliseconds. No-op when the default backend is already CPU or no
    CPU backend exists.
    """
    import contextlib

    import jax

    if jax.default_backend() == "cpu":
        return contextlib.nullcontext()
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:
        return contextlib.nullcontext()
    return jax.default_device(cpu)
