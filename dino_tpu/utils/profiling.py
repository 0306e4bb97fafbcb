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


def hbm_stats(device=None) -> Optional[dict]:
    """Device-memory telemetry for one chip (HBM on TPU).

    Returns ``{"bytes_in_use", "peak_bytes_in_use", "bytes_limit",
    "utilization"}`` (utilization = in-use / limit), or ``None`` when the
    backend doesn't expose memory_stats (the virtual CPU mesh).  The
    reference's equivalent telemetry is torch.cuda.max_memory_allocated in
    the dormant MetricLogger (utils.py:395-399); here it is a first-class
    utility — fit() attaches it to every epoch's metrics, so OOM headroom
    is visible in the training log (peak_bytes_in_use is the process
    lifetime peak, not a per-epoch peak).
    """
    if device is None:
        devices = jax.local_devices()
        if not devices:
            return None
        device = devices[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats or "bytes_in_use" not in stats:
        return None
    limit = stats.get("bytes_limit", 0)
    in_use = stats["bytes_in_use"]
    return {
        "bytes_in_use": int(in_use),
        "peak_bytes_in_use": int(stats.get("peak_bytes_in_use", in_use)),
        "bytes_limit": int(limit),
        "utilization": float(in_use / limit) if limit else 0.0,
    }


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
