"""data.prefetch: ordered, exception-propagating, leak-free host pipelining."""
import threading
import time

import pytest

from dino_tpu.data.prefetch import prefetched


def test_prefetch_ordered_and_complete():
    seen = []
    for i, batch in prefetched(range(20), lambda i: i * i, depth=3):
        seen.append((i, batch))
    assert seen == [(i, i * i) for i in range(20)]


def test_prefetch_overlaps_loading():
    """While the consumer 'computes', the worker loads ahead: total time
    approaches max(load, compute) per item, not the sum."""
    def load(i):
        time.sleep(0.05)
        return i

    t0 = time.monotonic()
    for _, _ in prefetched(range(8), load, depth=2):
        time.sleep(0.05)  # the 'device step'
    elapsed = time.monotonic() - t0
    # serial would be >= 0.80s; pipelined ~0.45s.  Generous bound for CI.
    assert elapsed < 0.70, f"no overlap: {elapsed:.2f}s"


def test_prefetch_propagates_loader_error():
    def load(i):
        if i == 3:
            raise ValueError("bad batch")
        return i

    seen = []
    with pytest.raises(ValueError, match="bad batch"):
        for i, b in prefetched(range(10), load, depth=2):
            seen.append(b)
    assert seen == [0, 1, 2]


def test_prefetch_early_break_stops_worker():
    n_before = threading.active_count()
    loaded = []

    def load(i):
        loaded.append(i)
        return i

    for i, _ in prefetched(range(1000), load, depth=2):
        if i == 5:
            break
    deadline = time.monotonic() + 5.0
    while threading.active_count() > n_before and time.monotonic() < deadline:
        time.sleep(0.01)
    assert threading.active_count() <= n_before
    # the worker stopped near the break point, not at item 999
    assert len(loaded) < 20
