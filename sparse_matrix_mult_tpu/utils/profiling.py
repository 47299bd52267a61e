"""Timing and profiling helpers.

The reference had no profiling subsystem; its tests carried ad-hoc
``time_execution`` wrappers (``/root/reference/tests/test_with_dense.py:8-12``).
Here timing is a first-class utility that understands JAX's async dispatch
(``block_until_ready``) and can capture ``jax.profiler`` device traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax

__all__ = ["time_execution", "Timer", "device_trace"]


def time_execution(func: Callable, *args, sync: bool = True, **kwargs):
    """Run ``func`` and return ``(result, seconds)``, syncing device work."""
    start = time.perf_counter()
    result = func(*args, **kwargs)
    if sync:
        try:
            result = jax.block_until_ready(result)
        except Exception:
            pass  # non-JAX results (scipy/numpy) are already synchronous
    return result, time.perf_counter() - start


class Timer:
    """Accumulating named timer for benchmark loops."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def mean(self, name: str) -> float:
        return self.totals[name] / max(self.counts.get(name, 0), 1)

    def report(self) -> str:
        lines = [
            f"{k}: total {v:.6f}s over {self.counts[k]} calls "
            f"(mean {self.mean(k):.6f}s)"
            for k, v in sorted(self.totals.items())
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a ``jax.profiler`` trace around a code block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
