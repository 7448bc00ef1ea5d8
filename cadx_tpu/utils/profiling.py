"""Tracing / profiling utilities (SURVEY.md section 5: the reference has
none — only a wall-clock "Training Time" string).

- StageTimer: per-stage wall times with device sync, for pipeline
  breakdowns.
- trace(): jax.profiler trace context writing a TensorBoard-loadable
  profile.
- throughput(): forced-execution throughput measurement. On tunneled
  runtimes a host fetch costs ~30ms even for finished results, so
  iterations are enqueued async and synced once (see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


class StageTimer:
    """Collects {stage: seconds}; every exit syncs outstanding device work."""

    def __init__(self):
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_value is not None:
                jax.block_until_ready(sync_value)
            self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.times.values())
        lines = [f"{k}: {v*1000:.1f} ms ({v/max(total,1e-12)*100:.0f}%)"
                 for k, v in sorted(self.times.items(), key=lambda kv: -kv[1])]
        lines.append(f"total: {total*1000:.1f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace scope (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def throughput(fn: Callable, *args, iters: int = 10, items_per_call: int = 1):
    """(items/sec, sec/call) with async enqueue + single end sync.

    `fn` must return a small array/scalar whose fetch forces execution.
    """
    float(jax.device_get(fn(*args)).sum())  # warm/compile
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(jax.device_get(outs[-1]).sum())
    per_call = (time.perf_counter() - t0) / iters
    return items_per_call / per_call, per_call
