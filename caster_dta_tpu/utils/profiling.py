"""Tracing and throughput instrumentation.

The reference has no profiler (SURVEY §5: progress prints only,
train_model.py:546,612,651). Here profiling is first-class: XLA/TPU traces
via jax.profiler (viewable in TensorBoard/Perfetto/xprof) and running
throughput counters in the units the benchmarks use (edges/s, pairs/s).
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/tb'): run_steps()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the trace timeline (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@dataclass
class ThroughputMeter:
    """Running edges/s / pairs/s counters for the train loop.

    Call ``step(n_edges, n_pairs)`` once per optimizer step *after* the step's
    results are ready (or rely on the next call's timestamp — dispatch is
    async, so per-step boundaries are approximate; totals are exact).
    """

    window: int = 50
    _t: list = field(default_factory=list)
    _edges: list = field(default_factory=list)
    _pairs: list = field(default_factory=list)
    total_edges: int = 0
    total_pairs: int = 0
    total_steps: int = 0
    _t0: Optional[float] = None

    def step(self, n_edges: int, n_pairs: int) -> None:
        now = time.perf_counter()
        if self._t0 is None:
            self._t0 = now
        self.total_edges += int(n_edges)
        self.total_pairs += int(n_pairs)
        self.total_steps += 1
        self._t.append(now)
        self._edges.append(int(n_edges))
        self._pairs.append(int(n_pairs))
        if len(self._t) > self.window + 1:
            self._t.pop(0), self._edges.pop(0), self._pairs.pop(0)

    @property
    def edges_per_s(self) -> float:
        """Windowed edges/s (0 until two steps recorded)."""
        if len(self._t) < 2:
            return 0.0
        dt = self._t[-1] - self._t[0]
        return float(sum(self._edges[1:]) / dt) if dt > 0 else 0.0

    @property
    def pairs_per_s(self) -> float:
        if len(self._t) < 2:
            return 0.0
        dt = self._t[-1] - self._t[0]
        return float(sum(self._pairs[1:]) / dt) if dt > 0 else 0.0

    def summary(self) -> dict:
        wall = (self._t[-1] - self._t0) if (self._t and self._t0) else 0.0
        return {
            "steps": self.total_steps,
            "wall_s": round(wall, 3),
            "edges_per_s": round(self.edges_per_s, 1),
            "pairs_per_s": round(self.pairs_per_s, 1),
            "total_edges": self.total_edges,
            "total_pairs": self.total_pairs,
        }


class StepTimer:
    """Blocking per-section wall timer for coarse host-side breakdowns
    (data loading vs device step vs logging)."""

    def __init__(self):
        self.totals: dict = {}
        self.counts: dict = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> dict:
        return {k: {"total_s": round(v, 4), "calls": self.counts[k],
                    "mean_ms": round(1e3 * v / self.counts[k], 3)}
                for k, v in sorted(self.totals.items())}
