"""Observability: structured metrics logging + profiler hooks.

The reference has print()-only diagnostics and no profiler (SURVEY.md
sections 5.1/5.5). Here: JSONL metrics (one line per epoch), throughput
counters, and jax.profiler trace capture around chosen epochs.
"""
from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from typing import Optional

import jax


class MetricsLogger:
    """Append-only JSONL metrics log + console mirror."""

    def __init__(self, path: str, echo=print):
        self.path = path
        self.echo = echo
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._t0 = time.time()

    def log(self, step: int, **metrics):
        rec = {"step": step, "wall_s": round(time.time() - self._t0, 3)}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return rec


@contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextmanager
def annotate(name: str):
    """Named region visible in profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


class Throughput:
    """Rays/s (and steps/s) moving counters."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.perf_counter()
        self.rays = 0
        self.steps = 0

    def add(self, n_rays: int):
        self.rays += n_rays
        self.steps += 1

    def rates(self):
        dt = max(time.perf_counter() - self.t0, 1e-9)
        return {"rays_per_s": self.rays / dt, "steps_per_s": self.steps / dt}
