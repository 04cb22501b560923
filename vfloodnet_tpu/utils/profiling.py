"""Profiling / observability helpers.

Counterpart of the reference's wall-clock-only telemetry (myutils/system.py)
plus proper device tracing: ``trace`` wraps ``jax.profiler`` (view with
TensorBoard / xprof), ``device_memory_stats`` replaces the CUDA memory
printer (myutils/system.py:92-97).
"""

from __future__ import annotations

import contextlib
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/trace'): run()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> Dict[str, float]:
    """Device memory telemetry in MB (bytes_in_use / peak / limit when the
    backend reports them)."""
    device = device or jax.devices()[0]
    stats = device.memory_stats() or {}
    mb = 1024 * 1024
    out = {}
    for key in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
        if key in stats:
            out[key.replace("bytes", "mb")] = stats[key] / mb
    return out


def print_mem(prefix: str = "") -> None:
    stats = device_memory_stats()
    parts = ", ".join(f"{k}={v:.1f}" for k, v in stats.items())
    print(f"{prefix}device memory: {parts or 'n/a'}")
