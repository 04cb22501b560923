"""Timing and averaging meters + run provenance.

Capability parity with the reference's myutils/system.py:10-79 (AvgMeter,
FrameSecondMeter, gct, save_scripts), framework-agnostic (no torch).
"""

from __future__ import annotations

import os
import shutil
import time
from datetime import datetime
from typing import Optional


class AvgMeter:
    """Windowed running average (reference myutils/system.py:10-37)."""

    def __init__(self, window: int = -1):
        self.window = window
        self.reset()

    def reset(self):
        self.avg = 0.0
        self.sum = 0.0
        self.cnt = 0
        self.vals = []

    def update(self, val: float, n: int = 1):
        self.cnt += n
        self.sum += val * n
        if self.window > 0:
            self.vals.extend([val] * n)
            self.vals = self.vals[-self.window:]
            self.avg = sum(self.vals) / len(self.vals)
        else:
            self.avg = self.sum / self.cnt


class FrameSecondMeter:
    """Frames-per-second meter (reference myutils/system.py:40-53)."""

    def __init__(self):
        self.st = time.time()
        self.frame_n = 0
        self.fps: Optional[float] = None

    def add_frame_n(self, n: int):
        self.frame_n += n

    def end(self) -> float:
        self.et = time.time()
        self.fps = self.frame_n / max(self.et - self.st, 1e-9)
        return self.fps


def gct(fmt: str = "%Y-%m-%d %H:%M:%S") -> str:
    return datetime.now().strftime(fmt)


def save_scripts(log_dir: str, src_root: str = ".") -> None:
    """Snapshot the framework sources into the run log dir for provenance
    (reference myutils/system.py:68-79)."""
    dst = os.path.join(log_dir, "scripts")
    os.makedirs(dst, exist_ok=True)
    for dirpath, dirnames, filenames in os.walk(src_root):
        dirnames[:] = [d for d in dirnames
                       if d not in {".git", "__pycache__", "output", "logs",
                                    "records", "assets", ".pytest_cache"}]
        for fn in filenames:
            if fn.endswith(".py"):
                rel = os.path.relpath(os.path.join(dirpath, fn), src_root)
                target = os.path.join(dst, rel)
                os.makedirs(os.path.dirname(target), exist_ok=True)
                shutil.copyfile(os.path.join(dirpath, fn), target)
