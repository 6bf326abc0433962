"""Stage timing and profiler hooks.

The reference sprinkles ad-hoc ``time.time()`` prints through every stage
(`transform.py:47-54`, `process.py:24-46`). This is the one utility behind
all of ours, plus an optional `jax.profiler` trace context for TPU traces
(SURVEY.md §5 tracing requirement).
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict


class StageTimer:
    """Accumulating named stage timer.

    >>> t = StageTimer()
    >>> with t("analysis"): ...
    >>> t.report()
    """

    def __init__(self):
        self.times = OrderedDict()
        self.counts = OrderedDict()

    @contextlib.contextmanager
    def __call__(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self, print_fn=print):
        total = sum(self.times.values())
        for name, t in self.times.items():
            print_fn(f"{name:24s} {t:8.3f}s  ({self.counts[name]}x, "
                     f"{100 * t / max(total, 1e-12):5.1f}%)")
        print_fn(f"{'total':24s} {total:8.3f}s")
        return total

    def as_dict(self):
        return dict(self.times)


@contextlib.contextmanager
def device_trace(logdir):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
