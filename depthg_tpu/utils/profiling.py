"""Profiling / observability helpers (SURVEY.md §5: the reference has none).

* ``StepTimer`` — rolling per-step wall-time + images/sec, host-side, zero
  device sync (call ``tick`` after the async dispatch; pair with a periodic
  ``block_until_ready`` at log boundaries).
* ``trace`` — context manager around ``jax.profiler`` emitting a TensorBoard-
  compatible trace directory (works on TPU; viewable with xprof/TensorBoard).
* ``log_jsonl`` — append structured metrics to a jsonl run log.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import deque


class StepTimer:
    def __init__(self, window: int = 50):
        self.times: deque = deque(maxlen=window)
        self.last = None

    def tick(self) -> float | None:
        now = time.perf_counter()
        dt = None
        if self.last is not None:
            dt = now - self.last
            self.times.append(dt)
        self.last = now
        return dt

    @property
    def steps_per_sec(self) -> float:
        if not self.times:
            return 0.0
        return len(self.times) / sum(self.times)

    def images_per_sec(self, batch_size: int) -> float:
        return self.steps_per_sec * batch_size


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Capture a jax profiler trace for the enclosed block."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_jsonl(path: str, record: dict):
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")
