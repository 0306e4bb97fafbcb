#!/usr/bin/env python
"""Serving wire-format sweep (round 5): response bytes vs req/s.

Round 4 measured bytes-on-the-wire as the serving bottleneck in the
bandwidth-limited link regime and fixed the upload side (--host_resize)
and the device->host hop (uint8 label wire) — but the HTTP response still
shipped int32 .npy.  This sweep measures the response-side fix: the same
winning config (--max_batch 1 --host_resize, 6 concurrent clients, JPEG
POST bodies, 480px ViT-S/8 3-block) against the three response formats:

    npy    (int32 .npy — the compatibility default, 922 KB/frame)
    npy8   (uint8 .npy — 4x smaller, ?format=npy8 / Accept header)
    pngl   (lossless grayscale label PNG — smallest, content-dependent)

Also measures the --compile_cache cold start: dt-serve startup
first-inference time on a cold cache (= the XLA compile) vs a warm one
(= the disk read), the round-4 "pair the artifact with a persistent
compile cache" follow-through.

Usage: python tools/bench_serve_wire.py [--seconds 20] [--clients 6]
"""
import argparse
import io
import json
import os
import shutil
import sys
import tempfile
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def throughput(port: int, body: bytes, query: str, seconds: float,
               clients: int) -> dict:
    stop = time.monotonic() + seconds
    counts = [0] * clients
    nbytes = [0] * clients

    def worker(i):
        url = f"http://127.0.0.1:{port}/predict{query}"
        while time.monotonic() < stop:
            req = urllib.request.Request(url, data=body, method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                nbytes[i] = len(r.read())
            counts[i] += 1

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(clients)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.monotonic() - t0
    return {"req_s": round(sum(counts) / dt, 2),
            "resp_bytes": max(nbytes)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--clients", type=int, default=6)
    ap.add_argument("--skip_cache", action="store_true",
                    help="skip the compile-cache cold-start legs")
    args = ap.parse_args(argv)

    from PIL import Image
    from tests import free_port
    from dino_tpu import DINOSeg
    from dino_tpu.cli.serve import make_server

    tmp = tempfile.mkdtemp(prefix="dtserve_bench_")
    try:
        model = DINOSeg(head="mlp", n_blocks=3, n_classes=7,
                        random_init=True, seed=0)
        ckpt = os.path.join(tmp, "m.ckpt.npz")
        model.save(ckpt)

        rs = np.random.RandomState(0)
        frame = rs.randint(0, 255, (480, 640, 3), np.uint8)  # camera-sized
        buf = io.BytesIO()
        Image.fromarray(frame).save(buf, format="JPEG", quality=92)
        body = buf.getvalue()

        port = free_port()
        server = make_server(ckpt, port=port, resolution=480,
                             max_batch=1, host_resize=True)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        # warm each format's program + response path once
        for q in ("", "?format=npy8", "?format=pngl"):
            throughput(port, body, q, 2.0, 2)
        rows = []
        for name, q in (("npy_int32", ""), ("npy8", "?format=npy8"),
                        ("pngl", "?format=pngl")):
            r = throughput(port, body, q, args.seconds, args.clients)
            rows.append({"format": name, **r})
            print(json.dumps(rows[-1]))
        server.shutdown()

        if args.skip_cache:
            return
        # --- compile-cache cold start -----------------------------------
        # fresh-process measurement is the honest one (in-process caches
        # would fake the hit); run a child python per leg
        import subprocess
        cache = os.path.join(tmp, "xla_cache")
        code = (
            "import json,sys;"
            "from dino_tpu.cli.serve import _build_backend,"
            "_enable_compile_cache,_cache_entries;"
            f"_enable_compile_cache({cache!r});"
            f"n0=_cache_entries({cache!r});"
            f"p,pm,info=_build_backend({ckpt!r},480,None,1);"
            "print(json.dumps({'first_infer_s':"
            "info['cold_start']['first_infer_s'],"
            f"'entries_before':n0,'entries_after':_cache_entries({cache!r})"
            "}))"
        )
        env = dict(os.environ)
        for leg in ("cold", "warm"):
            out = subprocess.run([sys.executable, "-c", code], env=env,
                                 capture_output=True, text=True, timeout=600,
                                 cwd=os.path.dirname(os.path.dirname(
                                     os.path.abspath(__file__))))
            line = out.stdout.strip().splitlines()[-1]
            print(json.dumps({"compile_cache_leg": leg,
                              **json.loads(line)}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
