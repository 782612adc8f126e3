"""Profiling / runtime metrics (SURVEY.md §5.1 parity).

The reference exposes EasyTimer wall-clock phases + buffer runtime/memory
logs (muzero_collector.py:394,456; entry/utils.py:914-1005). TPU-native
equivalents: a phase timer that feeds the ExperimentLogger, and a
jax.profiler trace context for deep dives (view with TensorBoard or xprof).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class PhaseTimer:
    """Accumulates wall-clock per named phase; drain with ``snapshot()``."""

    def __init__(self):
        self._tot: Dict[str, float] = defaultdict(float)
        self._cnt: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._tot[name] += time.perf_counter() - t0
            self._cnt[name] += 1

    def snapshot(self, reset: bool = True) -> Dict[str, float]:
        out = {}
        for k in list(self._tot):
            out[f"{k}_time_avg"] = self._tot[k] / max(self._cnt[k], 1)
            out[f"{k}_time_total"] = self._tot[k]
        if reset:
            self._tot.clear()
            self._cnt.clear()
        return out


@contextlib.contextmanager
def jax_trace(log_dir: str):
    """Capture a jax.profiler trace (device + host) under ``log_dir``.

    Usage::
        with jax_trace(f"{exp}/log/profile"):
            train_step(...)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def buffer_metrics(buffer) -> Dict[str, float]:
    """Buffer occupancy/throughput counters (reference
    log_buffer_memory_usage / log_buffer_run_time, entry/utils.py:914-1005)."""
    metrics = dict(
        transitions=float(buffer.num_transitions),
        episodes=float(buffer.num_episodes),
        pushed_transitions=float(getattr(buffer, "_pushed_transitions", 0)),
    )
    try:
        import sys

        metrics["approx_bytes"] = float(
            sum(e.obs.nbytes + e.actions.nbytes + e.child_visits.nbytes for e in buffer._episodes)
        )
    except Exception:
        pass
    return metrics
