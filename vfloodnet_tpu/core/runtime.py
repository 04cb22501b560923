"""Runtime/backend resilience.

The TPU tunnel in dev environments can wedge in ways that make
``jax.devices()`` HANG rather than raise — and once a hung backend init is
in-flight, the whole process is stuck (the init lock never releases). So the
accelerator probe runs in a short-lived subprocess; if it fails or times
out, the parent switches to the CPU backend *before* touching any device.

CLIs call :func:`ensure_backend` first thing.
"""

from __future__ import annotations

import os
import subprocess
import sys
import warnings

_PROBE = "import jax; jax.devices(); print('ok')"


def ensure_backend(probe_timeout: float = 120.0, attempts: int = 2) -> str:
    """Probe the configured accelerator in a subprocess; fall back to CPU on
    failure/timeout. Returns the platform name that will be used. Must be
    called before any jax device usage in this process.

    Backend init through the relay can take >60 s right after another
    process releases the device, so the probe is patient and retries once
    (``VFLOOD_PROBE_TIMEOUT`` overrides the per-attempt timeout)."""
    if os.environ.get("VFLOOD_FORCE_CPU") == "1":
        import jax
        jax.config.update("jax_platforms", "cpu")
        return "cpu"
    if os.environ.get("VFLOOD_NO_PROBE") == "1":
        return os.environ.get("JAX_PLATFORMS", "default")
    probe_timeout = float(os.environ.get("VFLOOD_PROBE_TIMEOUT",
                                         probe_timeout))
    why = []
    for _ in range(max(1, attempts)):
        try:
            res = subprocess.run([sys.executable, "-c", _PROBE],
                                 capture_output=True, timeout=probe_timeout)
            if res.returncode == 0 and b"ok" in res.stdout:
                return os.environ.get("JAX_PLATFORMS", "default")
            why.append(f"rc={res.returncode} "
                       f"stderr={res.stderr[-300:]!r}")
        except subprocess.TimeoutExpired:
            why.append(f"timeout>{probe_timeout:.0f}s")
    warnings.warn("accelerator backend unavailable or hung "
                  f"({'; '.join(why)}); falling back to the CPU backend")
    import jax
    jax.config.update("jax_platforms", "cpu")
    return "cpu"
