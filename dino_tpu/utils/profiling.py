"""Profiling/tracing subsystem.

The reference's only tracing is the dormant MetricLogger timing printout
(utils.py:348-400).  Here profiling is first-class: a perfetto-compatible
device trace via jax.profiler plus named host-side annotations, and a simple
step timer that pairs with utils.meters.MetricLogger.
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/dino_tpu_trace",
                 create_perfetto_link: bool = False) -> Iterator[str]:
    """Capture an XLA device trace (view in perfetto / tensorboard).

    with device_trace("/tmp/trace"):
        model.predict(frame)
    """
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timer that forces device completion at mark points.

    Usage:
        timer = StepTimer()
        for batch in loader:
            out = step(batch)
            timer.mark(out)         # blocks on `out`, records the interval
        print(timer.summary())
    """

    def __init__(self):
        self.times = []
        self._last: Optional[float] = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def mark(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        dt = 0.0 if self._last is None else now - self._last
        if self._last is not None:
            self.times.append(dt)
        self._last = now
        return dt

    def summary(self) -> dict:
        import numpy as np
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {"steps": len(arr), "mean_s": float(arr.mean()),
                "p50_s": float(np.percentile(arr, 50)),
                "p95_s": float(np.percentile(arr, 95)),
                "total_s": float(arr.sum())}
