"""Profiling/tracing subsystem.

The reference has none (SURVEY.md §5.1 — wall-clock prints only); here
tracing is first-class: ``TraceCapture`` wraps ``jax.profiler`` trace
collection (viewable in TensorBoard / Perfetto), and ``StepTimer`` keeps an
online step-time/throughput summary the trainer logs.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax


class TraceCapture:
    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self._active = False

    def start(self):
        jax.profiler.start_trace(self.log_dir)
        self._active = True

    def stop(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()


@dataclass
class StepTimer:
    """Online step timing: call ``tick()`` around each step."""

    warmup: int = 2
    times: List[float] = field(default_factory=list)
    _t0: Optional[float] = None
    _count: int = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    @property
    def p50(self) -> float:
        if not self.times:
            return float("nan")
        s = sorted(self.times)
        return s[len(s) // 2]

    def throughput(self, items_per_step: int) -> float:
        return items_per_step / self.mean if self.times else float("nan")
