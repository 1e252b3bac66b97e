"""Observability: wall-clock phase timing + metrics + jax.profiler hooks.

TPU-native replacement for the reference's homemade `Printer` logger
(`utils.py:24-95`) and scattered timing comments (SURVEY.md §5): a
phase-scoped timer with rolling averages, metric aggregation with the
reference's 95% confidence interval (`utils.py:1215-1239`), and thin
wrappers over jax.profiler for on-demand XLA traces.
"""

from __future__ import annotations

import collections
import contextlib
import time
import jax
import numpy as np


class Printer:
    """Rolling-average wall-clock logger (`utils.py:24-95` semantics)."""

    def __init__(self, avg_window: int = 20):
        self.avg_window = avg_window
        self._last = time.perf_counter()
        self._windows: dict[str, collections.deque] = {}

    def print(self, label: str, is_silent: bool = False) -> float:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        w = self._windows.setdefault(label, collections.deque(maxlen=self.avg_window))
        w.append(dt)
        if not is_silent:
            print(f"[{label}] {dt*1e3:.1f} ms (avg {np.mean(w)*1e3:.1f} ms over {len(w)})")
        return dt

    @contextlib.contextmanager
    def phase(self, label: str, is_silent: bool = False):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        w = self._windows.setdefault(label, collections.deque(maxlen=self.avg_window))
        w.append(dt)
        if not is_silent:
            print(f"[{label}] {dt*1e3:.1f} ms (avg {np.mean(w)*1e3:.1f} ms over {len(w)})")

    def summary(self) -> dict[str, float]:
        return {k: float(np.mean(w)) for k, w in self._windows.items()}


def confidence_interval_95(values) -> float:
    """1.96·σ/√N half-width (`utils.py:1215-1239`)."""
    v = np.asarray(values)
    return float(1.96 * v.std() / np.sqrt(len(v)))


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture an XLA/xprof trace for the enclosed block (the TPU-native
    replacement for the reference's manual timing comments)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricTracker:
    """Accumulate scalar metrics; report mean ± 95% CI like the reference's
    design_obj / MAE / RMSE records (`inverse_design_diffusion_1d.py:316-345`)."""

    def __init__(self):
        self._data: dict[str, list] = collections.defaultdict(list)

    def add(self, **metrics):
        for k, v in metrics.items():
            self._data[k].append(float(v))

    def report(self) -> dict[str, tuple[float, float]]:
        return {
            k: (float(np.mean(v)), confidence_interval_95(v)) for k, v in self._data.items()
        }
