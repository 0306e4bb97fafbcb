"""Asynchronous checkpoint writes — serialization off the critical path.

The sync savers (io.save_checkpoint, resume.save_train_state) block the
train loop for the full npz write; at pretrain scale (hundreds of MB of
student+teacher+moments) that is many step-times of stall per epoch.  The
reference has no equivalent (PL writes synchronously in-loop).

``AsyncCheckpointer`` splits a save into the part that MUST be synchronous
and the part that needn't be:

  * ``jax.device_get`` of every array leaf happens inline in ``save*()``.
    This is required for correctness, not just latency: the train steps
    donate their input buffers, so a device array handed to a background
    thread may be invalidated by the very next step call.  The snapshot is
    one HBM->host copy.
  * file serialization + atomic rename run on a single worker thread; a
    single FIFO queue serializes writes, so saves to the same path are
    last-write-wins in submission order and a reader never observes
    reordering.

A failed background write (full disk, bad path) is re-raised on the next
``save*()`` / ``wait()`` call — checkpoints must fail loudly, not rot
silently.  ``wait()`` drains the queue; call it before reading a file this
writer produced, at clean shutdown (also wired to ``atexit``), and before
any cross-host barrier that publishes the file to other ranks.
"""
from __future__ import annotations

import atexit
import os
import queue
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np

from dino_tpu.checkpointing import io as ck_io
from dino_tpu.checkpointing import resume as ck_resume


def _snapshot(tree: Any) -> Any:
    """Device arrays -> host numpy, leaving non-arrays untouched."""
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


class AsyncCheckpointer:
    def __init__(self, name: str = "ckpt-writer"):
        self._q: "queue.Queue" = queue.Queue()
        self._error: Optional[BaseException] = None
        self._lock = threading.Lock()
        self._closed = False
        self._worker = threading.Thread(target=self._run, name=name,
                                        daemon=True)
        self._worker.start()
        atexit.register(self.wait)

    # -- worker -----------------------------------------------------------
    def _run(self) -> None:
        while True:
            job = self._q.get()
            if job is None:
                self._q.task_done()
                return
            fn, args = job
            try:
                fn(*args)
            except BaseException as e:  # surfaced on the next save/wait
                with self._lock:
                    self._error = e
            finally:
                self._q.task_done()

    def _check_error(self) -> None:
        with self._lock:
            err, self._error = self._error, None
        if err is not None:
            raise RuntimeError("async checkpoint write failed") from err

    def _check_open(self) -> None:
        if self._closed:
            raise RuntimeError("AsyncCheckpointer is closed")

    # -- public API ---------------------------------------------------------
    def save_train_state(self, path: str, state: Dict[str, Any],
                         run_variables: Optional[Dict[str, Any]] = None
                         ) -> None:
        """Async twin of resume.save_train_state (same file format; the
        atomic tmp+rename there means a crash mid-write never tears the
        previous checkpoint)."""
        self._check_open()
        self._check_error()
        state = _snapshot(state)
        self._q.put((ck_resume.save_train_state, (path, state,
                                                  dict(run_variables or {}))))

    def save_checkpoint(self, path: str, params: Any,
                        hparams: Dict[str, Any]) -> None:
        """Async twin of io.save_checkpoint (model + hparams npz)."""
        self._check_open()
        self._check_error()
        self._q.put((ck_io.save_checkpoint, (path, _snapshot(params),
                                             dict(hparams))))

    def wait(self) -> None:
        """Block until every queued write has landed; re-raise failures."""
        self._q.join()
        self._check_error()

    def close(self) -> None:
        if self._closed:
            return
        self.wait()
        self._closed = True
        self._q.put(None)
        self._worker.join()
