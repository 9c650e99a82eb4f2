"""Wall-clock timers for step logging and benchmarks.

Reference parity: common/utils.py:102-139 (`Timer` context manager; the
reference used `time.clock()`, removed in py3.8 — we use perf_counter).
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class Timer:
    """Context-manager stopwatch; `.elapsed` in seconds after exit."""

    def __init__(self, logger=None, message: str = ""):
        self._logger = logger
        self._message = message
        self.elapsed = 0.0

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._start
        if self._logger is not None:
            self._logger.info(f"{self._message} took {self.elapsed * 1000:.2f} ms")
        return False


@contextmanager
def timeit(logger, message: str):
    t = Timer(logger, message)
    with t:
        yield t


class RateTracker:
    """Tracks items/sec over a sliding window of step timings."""

    def __init__(self, window: int = 50):
        self._window = window
        self._times = []

    def update(self, n_items: int) -> None:
        self._times.append((time.perf_counter(), n_items))
        if len(self._times) > self._window:
            self._times.pop(0)

    def rate(self) -> float:
        if len(self._times) < 2:
            return 0.0
        t0, _ = self._times[0]
        t1, _ = self._times[-1]
        items = sum(n for _, n in self._times[1:])
        dt = t1 - t0
        return items / dt if dt > 0 else 0.0
