"""Host-side pipelining: load batch k+1 while the device runs step k.

The supervised loop already overlaps via ``dataset.batched_loader``'s
prefetch thread; this is the generic utility for loops that index their
own work (the DINO pretrain CLI walks a permutation per epoch and keys
crop randomness by (seed, epoch, image-index), so the loader is a pure
function of the step index and prefetching cannot change the pixel
stream — determinism is untouched, only the overlap changes).

The reference has no equivalent (its loaders are torch DataLoader worker
processes, pl_torch_modules.py:354); on TPU the natural shape is a
bounded single-worker pipeline: JAX dispatch releases the GIL while the
chip runs, so even on a 1-core host the decode/augment work of the next
step hides behind the device time of the current one.  One worker keeps
ordering trivial and the loader rng-stream untouched.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Tuple, TypeVar

T = TypeVar("T")


def prefetched(items: Iterable[T], load: Callable[[T], object],
               depth: int = 2) -> Iterator[Tuple[T, object]]:
    """Yield ``(item, load(item))`` in order, loading up to ``depth`` ahead
    on a background thread.

    A loader exception is re-raised at the consuming ``next()`` call (the
    step that would have used the batch), not swallowed.  Abandoning the
    iterator (break / exception in the loop body) stops the worker: the
    generator's ``finally`` sets a cancel event and drains the bounded
    queue so the blocked worker observes it and exits — no leaked threads
    across repeated calls in one process.
    """
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    cancel = threading.Event()
    _END = object()

    def worker():
        try:
            for it in items:
                if cancel.is_set():
                    return
                batch = load(it)
                while not cancel.is_set():
                    try:
                        q.put((it, batch, None), timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as exc:  # surfaced on the consumer side
            while not cancel.is_set():
                try:
                    q.put((None, None, exc), timeout=0.1)
                    break
                except queue.Full:
                    continue
        finally:
            while not cancel.is_set():
                try:
                    q.put(_END, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, name="dt-prefetch", daemon=True)
    t.start()
    try:
        while True:
            got = q.get()
            if got is _END:
                return
            it, batch, exc = got
            if exc is not None:
                raise exc
            yield it, batch
    finally:
        cancel.set()
        while True:  # unblock a worker stuck on a full queue
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join(timeout=5.0)
