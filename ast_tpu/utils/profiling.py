"""Tracing / profiling hooks.

The reference has no profiling at all (SURVEY.md §5 — print statements only).
Here: jax.profiler integration (TensorBoard-compatible traces), named trace
annotations for pipeline stages, and a lightweight step timer for training
logs."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(name: str):
    """Annotate a region in the device trace (shows up in TensorBoard)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def capture_trace(log_dir: str):
    """Capture a full profiler trace for TensorBoard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock timing of named phases (host side)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync: Optional[object] = None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1) for k in self.totals}

    def report(self, log=print) -> None:
        for k, v in sorted(self.summary().items()):
            log(f"  {k}: {v * 1000:.2f} ms/call ({self.counts[k]} calls)")
