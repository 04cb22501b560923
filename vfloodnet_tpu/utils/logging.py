"""Structured metric logging (JSONL).

Replaces the reference's print-only telemetry (SURVEY.md §5 "Metrics /
logging"): one JSON object per event appended to ``metrics.jsonl`` in the
run's log dir — trivially greppable / loadable with pandas.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricWriter:
    def __init__(self, log_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, filename)
        self._fh = open(self.path, "a", buffering=1)

    def write(self, event: str, step: Optional[int] = None,
              **metrics: Any) -> None:
        rec: Dict[str, Any] = {"t": round(time.time(), 3), "event": event}
        if step is not None:
            rec["step"] = int(step)
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._fh.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        self._fh.close()
