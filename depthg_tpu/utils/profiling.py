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


def dispatch_rtt(repeats: int = 5) -> float:
    """Median dispatch+fetch round-trip (seconds) of a trivial jitted
    program — the constant to subtract from dependent-chain timings so host
    RPC latency (tunneled runtimes: ~30 ms/call) cannot inflate device
    numbers. The ONE calibration shared by ``bench.py`` and
    ``scripts/crf_fidelity_study.py``; hand-rolled copies would drift and
    make their ms columns silently incomparable."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _trivial(x):
        return x * 2.0

    float(_trivial(jnp.float32(1.0)))  # compile outside the timed reps
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        float(_trivial(jnp.float32(1.0)))
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def hlo_flops(compiled) -> float:
    """Executed-flop count from a compiled computation's ``cost_analysis()``,
    normalizing the list-of-dicts vs dict return across jax versions."""
    cost = compiled.cost_analysis()
    return float((cost[0] if isinstance(cost, (list, tuple)) else cost)
                 .get("flops", 0.0))


def median_time(fn, repeats: int = 5) -> float:
    """Median wall time of ``fn()`` over ``repeats`` calls (seconds).
    Pair with ``dispatch_rtt`` subtraction for dependent-chain loops."""
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]
