"""Profiling / observability helpers.

Counterpart of the reference's wall-clock-only telemetry (myutils/system.py)
plus proper device tracing: ``trace`` wraps ``jax.profiler`` (view with
TensorBoard / xprof), ``device_memory_stats`` replaces the CUDA memory
printer (myutils/system.py:92-97).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import numpy as np


def force(x):
    """Materialize ``x``'s computation NOW; returns a host scalar.

    The axon relay resolves ``jax.block_until_ready`` before remote
    completion (execution is lazy until a D2H fetch), so
    ``block_until_ready`` is a dispatch fence, NOT a compute fence — a
    chained 8192^3 bf16 matmul "measures" 0.04 ms under it (150x chip
    peak) while a forced fetch shows the true ~5.5 ms. This fetches one
    element of ``x``, which forces the whole producing chain to execute.
    Costs one D2H round-trip (~30-45 ms fixed): amortize over chained
    iterations and subtract :func:`fetch_floor` when you need absolutes.
    """
    arr = jax.tree_util.tree_leaves(x)[0]
    idx = (0,) * arr.ndim
    return np.asarray(arr[idx]) if arr.ndim else np.asarray(arr)


def fetch_floor(x, reps: int = 3) -> float:
    """Median seconds for a :func:`force` of an ALREADY-materialized value —
    the fixed D2H round-trip cost to subtract from chained timings. Call
    right after a ``force(x)`` of the same value."""
    ts = []
    for _ in range(reps):
        t0 = time.time()
        force(x)
        ts.append(time.time() - t0)
    return float(np.median(ts))


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
