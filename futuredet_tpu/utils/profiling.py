"""Tracing / profiling utilities.

Replaces the reference's IterTimerHook + flops_counter observability
(SURVEY.md §5): jax.profiler traces (XLA + TPU timeline viewable in
TensorBoard/Perfetto), step timers, and device memory stats.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, int]:
    """Per-device live-bytes (equivalent of the reference's max-GPU-memory
    log column, TextLoggerHook:24-31)."""
    out = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = stats.get("bytes_in_use", 0)
    return out


class StepTimer:
    """data/compute wall-time accumulator (ref IterTimerHook:6-24)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self._t0: Optional[float] = None
        self._key: Optional[str] = None

    @contextlib.contextmanager
    def phase(self, key: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[key] = (self.totals.get(key, 0.0)
                                + time.perf_counter() - t0)

    def summary_and_reset(self) -> Dict[str, float]:
        out, self.totals = self.totals, {}
        return out
