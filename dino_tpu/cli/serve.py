"""dt-serve: minimal HTTP segmentation server (stdlib only).

The deployment daemon the reference leaves to the user (its serving story is
an in-process `DINOSeg.predict()` call, pl_torch_modules.py:276-300).  Serves
either a checkpoint (live model) or an AOT artifact from `dt-export`:

    dt-serve results/3_mlp_finetuned.ckpt.npz --port 8080 --resolution 480
    dt-serve predict.shlo --port 8080          # artifact: only jax needed

Endpoints:
  GET  /healthz            -> JSON status + serving contract
  GET  /stats              -> JSON request counters, recent-latency p50/p95,
                              dynamic-batch round-size histogram
  POST /predict            -> request body: JPEG/PNG image bytes
                              response: .npy bytes of the int32 label map
                              (the compatibility default)
  POST /predict?format=npy8 -> response: .npy bytes of the SAME labels as
                              uint8 — 4x fewer response bytes, the
                              first-order win in the bandwidth-limited
                              regime PERF.md's round-4 sweep measured
                              (labels always fit: n_classes <= 255).
                              Also selectable via the request header
                              ``Accept: application/x-npy-uint8``.
  POST /predict?format=png -> response: colorized PNG (VOC palette)
  POST /predict?format=pngl -> response: grayscale PNG of the raw labels
                              (lossless zlib: smallest wire format, the
                              client reads values back as class ids)

By default requests are single-flight: they serialize through one device
program via a lock.  ``--max_batch N`` turns on server-side DYNAMIC
BATCHING: concurrent /predict requests that arrive within
``--batch_timeout_ms`` coalesce into one predict_batch device program —
the measured serving optimum on a v5e chip is batch 3 at 480px (PERF.md),
so a loaded daemon should run ``--max_batch 3`` (or the artifact's baked
batch).  Same-shape frames share a program; batch sizes pad up to
power-of-two buckets capped at max_batch (a full round runs the exact
max_batch program) so the compile cache stays O(log max_batch) per shape.
"""
from __future__ import annotations

import argparse
import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional


def _cache_entries(cache_dir: str) -> int:
    """Number of persisted XLA executables under ``cache_dir`` (recursive —
    the cache may shard into subdirectories)."""
    import os
    total = 0
    for _, _, files in os.walk(cache_dir):
        total += sum(1 for f in files if f.endswith("-cache"))
    return total


def _enable_compile_cache(cache_dir: str) -> None:
    """Point XLA's persistent compilation cache at ``cache_dir``.

    Must run before the first compile AND before the backend client
    initializes (on PJRT-plugin backends a later config change silently
    drops the writes — main() calls this before building the backend).
    min-compile-time and min-entry-size drop to 0 so even the small
    per-resolution predict programs persist.

    Measure before trusting: on this sandbox's toolchain the warm path
    LOST to recompiling for predict-sized programs (the deserialized
    executable defers a first-execution cost larger than the compile it
    saves — PERF.md "persistent compile cache", round 5).  /healthz's
    cold_start.first_infer_s with and without the flag is the decision
    number for a given host.
    """
    import os
    import jax
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _bucket(n: int, max_batch: int = 1) -> int:
    """Padded batch size for an n-request round: next power of two
    (O(log max_batch) programs per shape) capped at max_batch — a full
    --max_batch 3 round runs the exact batch-3 program (the measured
    optimum the flag targets), not a padded batch-4 one."""
    pow2 = 1 << (n - 1).bit_length()
    return min(pow2, max_batch) if max_batch > 1 else pow2


def _build_backend(path: str, resolution: int, precision, max_batch: int = 1):
    """Returns (predict_fn: uint8 HWC -> int2d map,
                predict_many: [uint8 HWC same shape] -> [int2d maps],
                info dict)."""
    import numpy as np
    if path.endswith((".shlo", ".stablehlo")):
        from dino_tpu.serving import load_exported_predict
        t0 = time.perf_counter()
        served = load_exported_predict(path)
        t_load = time.perf_counter() - t0
        # the deserialized program knows its true input shape even when the
        # .json sidecar is missing — fall back to its avals so a batch-N or
        # differently-shaped artifact still serves
        want = (served.contract["input"]["shape"] if served.contract
                else list(served.exported.in_avals[0].shape))
        art_batch = want[0]
        # cold start measured AT startup with a warmup inference: the
        # robot-deployment number (power-on -> first label map), and the
        # first real request then hits a warm program
        t1 = time.perf_counter()
        np.asarray(served(np.zeros(want, np.uint8)))
        t_first = time.perf_counter() - t1
        cold = {"artifact_load_s": round(t_load, 3),
                "first_infer_s": round(t_first, 3),
                "total_cold_start_s": round(t_load + t_first, 3)}
        print(f"dt-serve: artifact cold start {cold['total_cold_start_s']}s "
              f"(load {cold['artifact_load_s']}s + first inference "
              f"{cold['first_infer_s']}s)")
        if art_batch > 1:
            print(f"dt-serve: artifact is batch-{art_batch}; single frames "
                  "will be tiled to fill the batch (export with "
                  "--batch-size 1 for latency serving, or --max_batch "
                  f"{art_batch} to fill it with concurrent requests)")

        def fit(img):
            if list(img.shape) != want[1:]:
                from PIL import Image
                img = np.asarray(Image.fromarray(img).resize(
                    (want[2], want[1])))
            return img

        def predict_many(imgs):
            out = []
            for i in range(0, len(imgs), art_batch):
                chunk = [fit(im) for im in imgs[i:i + art_batch]]
                n = len(chunk)
                chunk += [chunk[-1]] * (art_batch - n)  # fill the fixed batch
                res = served(np.ascontiguousarray(np.stack(chunk)))
                out.extend(np.asarray(res)[:n])
            return out

        info = {"backend": "artifact", "artifact": path,
                "contract": served.contract, "cold_start": cold,
                "input_hw": (want[1], want[2])}
        return (lambda img: predict_many([img])[0]), predict_many, info
    from dino_tpu import DINOSeg
    t0 = time.perf_counter()
    model = DINOSeg.load_from_checkpoint(path)
    model.set_resolution(resolution)
    t_load = time.perf_counter() - t0

    def predict(img):
        return model.predict(img, precision=precision)

    # warm the predict program at STARTUP (same contract as the artifact
    # backend above): the robot-deployment cold start is power-on -> first
    # label map, and with --compile_cache the first-inference time below is
    # the direct hit/miss measurement (compile ~tens of s, cache read ~1 s)
    t1 = time.perf_counter()
    np.asarray(predict(np.zeros((resolution, resolution, 3), np.uint8)))
    t_first = time.perf_counter() - t1
    cold = {"model_load_s": round(t_load, 3),
            "first_infer_s": round(t_first, 3),
            "total_cold_start_s": round(t_load + t_first, 3)}

    def predict_many(imgs):
        batch = np.stack(imgs)
        n = batch.shape[0]
        bucket = _bucket(n, max_batch)
        if bucket != n:
            batch = np.concatenate(
                [batch, np.repeat(batch[-1:], bucket - n, axis=0)])
        return list(model.predict_batch(batch, precision=precision)[:n])

    info = {"backend": "model", "checkpoint": path,
            "resolution": resolution,
            "precision": precision or model.precision,
            "n_classes": model.n_classes,
            "cold_start": cold,
            "input_hw": (resolution, resolution)}
    return predict, predict_many, info


class _Stats:
    """Thread-safe serving counters behind GET /stats.

    Latencies keep the last 512 requests (a ring, so the percentiles track
    CURRENT behavior, not the lifetime mix); the batch histogram counts how
    full the dynamic-batching rounds actually run — the direct check of
    whether --max_batch/--batch_timeout_ms are doing anything under the
    observed request rate.
    """

    def __init__(self):
        import collections
        self._lock = threading.Lock()
        self._lat_ms = collections.deque(maxlen=512)
        self._requests = 0
        self._errors = 0
        self._rounds: dict = {}
        self._t0 = time.monotonic()

    def record(self, ms: float, error: bool = False) -> None:
        with self._lock:
            self._requests += 1
            if error:
                self._errors += 1
            else:
                self._lat_ms.append(ms)

    def record_round(self, n: int) -> None:
        with self._lock:
            self._rounds[n] = self._rounds.get(n, 0) + 1

    def snapshot(self) -> dict:
        with self._lock:
            lats = sorted(self._lat_ms)
            out = {
                "requests": self._requests,
                "errors": self._errors,
                "uptime_s": round(time.monotonic() - self._t0, 1),
                "batch_rounds": {str(k): v
                                 for k, v in sorted(self._rounds.items())},
            }
            if lats:
                out["latency_ms"] = {
                    "p50": round(lats[len(lats) // 2], 2),
                    "p95": round(lats[min(len(lats) - 1,
                                          int(len(lats) * 0.95))], 2),
                    "window": len(lats),
                }
            return out


class _Batcher:
    """Dynamic request batching: a dispatcher thread drains the request
    queue up to (max_batch, timeout) per round, groups frames by shape, and
    answers each round with one batched device program per group.  Request
    threads block on a per-request event; errors propagate to exactly the
    requests that caused them (whole group, since the program is shared)."""

    def __init__(self, predict_many, max_batch: int, timeout_s: float,
                 stats: Optional["_Stats"] = None):
        self._predict_many = predict_many
        self._max = max_batch
        self._timeout = timeout_s
        self._stats = stats
        self._q: "queue.Queue" = queue.Queue()
        threading.Thread(target=self._loop, daemon=True,
                         name="dt-serve-batcher").start()

    def __call__(self, img):
        done = threading.Event()
        box: dict = {}
        self._q.put((img, done, box))
        done.wait()
        if "error" in box:
            raise box["error"]
        return box["labels"]

    def _loop(self):
        while True:
            items = [self._q.get()]
            # the ENTIRE round body sits under one BaseException net: any
            # raise escaping this dispatcher thread (a KeyboardInterrupt
            # delivered mid-predict, a MemoryError grouping the round, a
            # bug in stats recording) would kill it silently and every
            # request already drained off the queue — plus all future ones
            # — would block forever on done.wait().  Fail the drained
            # waiters with a visible error and keep the loop alive: a
            # poisoned backend then answers 500s instead of hanging the
            # server.  (Process-level interrupts land on the main thread,
            # which shuts the server down normally.)
            try:
                deadline = time.monotonic() + self._timeout
                while len(items) < self._max:
                    left = deadline - time.monotonic()
                    if left <= 0:
                        break
                    try:
                        items.append(self._q.get(timeout=left))
                    except queue.Empty:
                        break
                groups: dict = {}
                for it in items:
                    groups.setdefault(tuple(it[0].shape), []).append(it)
                for group in groups.values():
                    if self._stats is not None:
                        self._stats.record_round(len(group))
                    try:
                        labels = self._predict_many([g[0] for g in group])
                        if len(labels) != len(group):
                            # zip() would silently skip the unmatched
                            # requests and leave their waiters blocked
                            # forever — turn a short return into a
                            # visible per-group failure instead
                            raise RuntimeError(
                                f"predict_many returned {len(labels)} "
                                f"results for a group of {len(group)}")
                        for (_, done, box), lab in zip(group, labels):
                            box["labels"] = lab
                            done.set()
                    except BaseException as exc:
                        # per-group: errors propagate to exactly the
                        # requests whose shared program raised
                        err = (exc if isinstance(exc, Exception) else
                               RuntimeError(f"batcher interrupted: {exc!r}"))
                        for _, done, box in group:
                            box["error"] = err
                            done.set()
            except BaseException as exc:
                err = (exc if isinstance(exc, Exception)
                       else RuntimeError(f"batcher interrupted: {exc!r}"))
                for it in items:
                    _, done, box = it
                    if not done.is_set():
                        box["error"] = err
                        done.set()


def make_server(path: str, host: str = "127.0.0.1", port: int = 8080,
                resolution: int = 480, precision=None, max_batch: int = 1,
                batch_timeout_ms: float = 3.0,
                host_resize: bool = False,
                compile_cache: Optional[str] = None) -> ThreadingHTTPServer:
    import numpy as np
    from PIL import Image

    if compile_cache:
        _enable_compile_cache(compile_cache)
        entries_before = _cache_entries(compile_cache)
    predict, predict_many, info = _build_backend(path, resolution, precision,
                                                 max_batch)
    if compile_cache:
        # hit/miss detection: the persistent cache WRITES a new entry on
        # every compile and writes nothing on a hit, so "no new entries
        # across the startup warmup" + "cache was non-empty" = warm start.
        # first_infer_s in cold_start is the corresponding measurement.
        entries_after = _cache_entries(compile_cache)
        info["compile_cache"] = {
            "dir": compile_cache,
            "entries_before": entries_before,
            "entries_after": entries_after,
            "warm_hit": entries_before > 0 and entries_after == entries_before,
        }
    # warm the native decoder at STARTUP: a cold checkout builds the C++
    # library with g++ (up to ~2 min) behind get_lib()'s lock — paying it
    # inside the first request would stall that client (and everyone
    # queued on the lock) while the cold-start telemetry above claims the
    # server is warm
    import time as _time
    t0 = _time.perf_counter()
    from dino_tpu.data import native_loader
    native_available = native_loader.get_lib() is not None
    build_s = _time.perf_counter() - t0
    info["native_decode"] = native_available
    if build_s > 0.1:
        info.setdefault("cold_start", {})["native_loader_build_s"] = round(
            build_s, 3)
    if host_resize:
        # honest flag: without the native library the resize would
        # silently not happen (PIL fallback decodes full-size; the device
        # resizes as usual) — report what will actually run
        info["host_resize"] = native_available
        if not native_available:
            print("dt-serve: --host_resize requested but the native "
                  "decoder is unavailable; frames upload full-size")
    lock = threading.Lock()
    stats = _Stats()
    batcher = (_Batcher(predict_many, max_batch, batch_timeout_ms / 1e3,
                        stats=stats)
               if max_batch > 1 else None)
    info["max_batch"] = max_batch

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet access log
            pass

        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            route = self.path.split("?")[0]
            if route == "/healthz":
                self._send(200, json.dumps({"ok": True, **info}).encode(),
                           "application/json")
            elif route == "/stats":
                self._send(200, json.dumps(stats.snapshot()).encode(),
                           "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path.split("?")[0] != "/predict":
                self._send(404, b"not found", "text/plain")
                return
            t_req = time.monotonic()
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                # JPEG request bodies decode through the native C++ loader
                # (ctypes releases the GIL, so the ThreadingHTTPServer's
                # request threads decode on real parallel cores — the
                # single-core PIL decode was the measured dynamic-batching
                # bottleneck, PERF.md); PNG or decode failure falls back
                from dino_tpu.data.native_loader import (decode_bytes,
                                                         decode_resize_bytes)
                img = None
                if host_resize:
                    # decode+resize natively to the backend's input shape
                    # (model resolution, or the artifact contract's H x W):
                    # the upload to the device shrinks (a camera frame is
                    # usually larger) at the cost of u8 rounding before
                    # normalization (rare near-tie argmax flips vs the
                    # on-device float resize) — see --help
                    img = decode_resize_bytes(body, *info["input_hw"])
                if img is None:
                    img = decode_bytes(body)
                if img is None:
                    img = np.asarray(
                        Image.open(io.BytesIO(body)).convert("RGB"))
                if batcher is not None:  # dynamic batching (module docstring)
                    labels = np.asarray(batcher(img))
                else:
                    with lock:  # single-flight through the device
                        labels = np.asarray(predict(img))
            except Exception as exc:  # bad image, shape mismatch, ...
                stats.record((time.monotonic() - t_req) * 1e3, error=True)
                self._send(400, json.dumps(
                    {"error": str(exc)}).encode(), "application/json")
                return
            stats.record((time.monotonic() - t_req) * 1e3)
            query = (self.path.split("?") + [""])[1]
            fmt = None
            for part in query.split("&"):
                if part.startswith("format="):
                    fmt = part[len("format="):]
            if fmt is None and "application/x-npy-uint8" in (
                    self.headers.get("Accept") or ""):
                fmt = "npy8"
            if fmt == "png":
                from dino_tpu.utils.viz import label2rgb
                buf = io.BytesIO()
                Image.fromarray(label2rgb(labels)).save(buf, format="PNG")
                self._send(200, buf.getvalue(), "image/png")
            elif fmt == "pngl":
                # raw labels as a grayscale PNG: zlib-lossless, the
                # smallest wire format (labels fit uint8, n_classes <= 255)
                buf = io.BytesIO()
                Image.fromarray(labels.astype(np.uint8), mode="L").save(
                    buf, format="PNG")
                self._send(200, buf.getvalue(), "image/png")
            elif fmt == "npy8" and labels.max(initial=0) <= 255:
                buf = io.BytesIO()
                np.save(buf, labels.astype(np.uint8))
                self._send(200, buf.getvalue(), "application/x-npy-uint8")
            else:
                # compatibility default: int32 .npy, the round-1 contract
                buf = io.BytesIO()
                np.save(buf, labels)
                self._send(200, buf.getvalue(), "application/octet-stream")

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("model", help="checkpoint (.npz/.ckpt) or artifact (.shlo)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--resolution", type=int, default=480)
    p.add_argument("--precision", default=None,
                   choices=["bf16", "fp32", "int8"])
    p.add_argument("--max_batch", type=int, default=1,
                   help="dynamic batching: coalesce up to N concurrent "
                        "requests into one device program (3 is the "
                        "measured 480px serving optimum, PERF.md); "
                        "1 = single-flight")
    p.add_argument("--batch_timeout_ms", type=float, default=3.0,
                   help="how long the batcher waits to fill a batch after "
                        "the first request arrives")
    p.add_argument("--host_resize", action="store_true",
                   help="decode+resize request bodies to the model "
                        "resolution on the host (native C++ bilinear) "
                        "before upload: shrinks the host->device frame "
                        "bytes — the first-order cost on a bandwidth-"
                        "limited device link — at the cost of uint8 "
                        "rounding before normalization (rare near-tie "
                        "argmax flips vs the on-device float resize)")
    p.add_argument("--compile_cache", default=None, metavar="DIR",
                   help="persistent XLA compile cache directory: the first "
                        "run persists the compiled executables; later cold "
                        "starts read them back instead of recompiling. "
                        "MEASURE IT on your host: /healthz reports "
                        "hit/miss and cold_start.first_infer_s, and on "
                        "some toolchains the warm path loses to the "
                        "recompile (PERF.md 'persistent compile cache')")
    args = p.parse_args(argv)
    server = make_server(args.model, args.host, args.port, args.resolution,
                         args.precision, max_batch=args.max_batch,
                         batch_timeout_ms=args.batch_timeout_ms,
                         host_resize=args.host_resize,
                         compile_cache=args.compile_cache)
    print(f"dt-serve: listening on http://{args.host}:{args.port} "
          f"(POST /predict, GET /healthz)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
