"""Backend-resilience helper tests."""

import os

from vfloodnet_tpu.core import runtime


def test_force_cpu_env(monkeypatch):
    monkeypatch.setenv("VFLOOD_FORCE_CPU", "1")
    assert runtime.ensure_backend() == "cpu"


def test_probe_failure_falls_back(monkeypatch):
    monkeypatch.delenv("VFLOOD_FORCE_CPU", raising=False)
    monkeypatch.setattr(runtime, "_PROBE", "import sys; sys.exit(3)")
    assert runtime.ensure_backend(probe_timeout=30) == "cpu"
