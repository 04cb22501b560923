"""Compilation-cache setup for CLIs and benchmarks."""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir: str = None) -> None:
    """Enable the persistent compilation cache (big graphs compile slowly on
    the remote-compile path; cached executables shave repeat runs)."""
    jax.config.update("jax_compilation_cache_dir",
                      cache_dir or _DEFAULT_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
