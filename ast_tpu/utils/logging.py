"""Structured metric logging.

The reference's only observability is stdout prints with emoji markers
(SURVEY.md §5). Here: a JSONL metric stream (machine-readable, append-only,
crash-safe) plus the same human-readable console line; TensorBoard users can
point the profiler at utils.profiling.capture_trace."""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: Optional[str] = None, console=print):
        self.console = console
        self._fh = None
        if log_dir is not None:
            os.makedirs(log_dir, exist_ok=True)
            self._fh = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def log(self, step: int, metrics: Dict[str, float],
            prefix: str = "") -> None:
        record = {"step": int(step), "time": time.time(),
                  **{k: float(v) for k, v in metrics.items()}}
        if self._fh is not None:
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()
        if prefix:
            shown = " ".join(f"{k}={float(v):.4f}" for k, v in metrics.items())
            self.console(f"{prefix} step={step} {shown}")

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
