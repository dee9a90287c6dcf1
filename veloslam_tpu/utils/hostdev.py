"""Host-CPU JAX device access for latency-bound finalize work.

On the tunneled TPU backend every post-readback dispatch costs
milliseconds-to-seconds of round-trip latency, while the end-of-session
graph solves are a few hundred KB of math — the right placement for them
is the host CPU, whatever the accelerator is (same design rule as the
pure-numpy trajectory correction, runtime/pipeline._correct_trajectory).

The session environment pins ``JAX_PLATFORMS=axon`` via sitecustomize, so
the CPU platform is not registered by default; `ensure_cpu_platform()`
appends it BEFORE the backend initializes (a no-op afterwards, or when
CPU is already the default).  `cpu_device()` returns the CPU device or
None when unavailable — callers degrade to the default backend.
"""

from __future__ import annotations


def ensure_cpu_platform() -> None:
    """Append 'cpu' to the platform list if the backend is not yet
    initialized (call as early as possible in entry points)."""
    import os

    plats = os.environ.get("JAX_PLATFORMS", "")
    if not plats or "cpu" in plats.split(","):
        return
    import jax

    try:
        jax.config.update("jax_platforms", plats + ",cpu")
    except Exception:
        pass


def cpu_device():
    """The first CPU jax device, or None if the CPU platform is not
    registered in this process."""
    import jax

    try:
        return jax.devices("cpu")[0]
    except Exception:
        return None
