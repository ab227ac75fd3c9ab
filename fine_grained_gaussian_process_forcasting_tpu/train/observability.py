"""Tracing, step timing, and metrics logging.

The reference's observability is print statements plus npy loss curves
(SURVEY.md s5); this module adds the TPU-native equivalents: a
``jax.profiler`` trace context for real profiles, a wall-clock step timer
with steps/sec summaries, and a JSONL metrics logger.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Iterator, List, Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard/XProf) when
    ``log_dir`` is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timing of (already-dispatched) steps; call ``tick`` after
    each blocking step boundary."""

    def __init__(self) -> None:
        self._t0 = time.perf_counter()
        self._durations: List[float] = []

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self._t0
        self._t0 = now
        self._durations.append(dt)
        return dt

    @property
    def steps_per_sec(self) -> float:
        if not self._durations:
            return 0.0
        # drop the first tick (compile)
        ds = self._durations[1:] or self._durations
        return len(ds) / sum(ds)


class MetricsLogger:
    """Append-only JSONL metrics (the npy-loss-curve upgrade)."""

    def __init__(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path

    def log(self, step: int, **metrics) -> None:
        rec: Dict = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
