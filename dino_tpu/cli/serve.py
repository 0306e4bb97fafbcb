"""dt-serve: minimal HTTP segmentation server (stdlib only).

The deployment daemon the reference leaves to the user (its serving story is
an in-process `DINOSeg.predict()` call, pl_torch_modules.py:276-300).  Serves
either a checkpoint (live model) or an AOT artifact from `dt-export`:

    dt-serve results/3_mlp_finetuned.ckpt.npz --port 8080 --resolution 480
    dt-serve predict.shlo --port 8080          # artifact: only jax needed

Endpoints:
  GET  /healthz            -> JSON status + serving contract
  POST /predict            -> request body: JPEG/PNG image bytes
                              response: .npy bytes of the int label map
  POST /predict?format=png -> response: colorized PNG (VOC palette)

Single-flight: requests serialize through one device program (the TPU runs
one program at a time anyway); throughput deployments should batch client-
side via predict_batch / exported batch artifacts instead.
"""
from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _build_backend(path: str, resolution: int, precision):
    """Returns (predict_fn: uint8 HWC -> int2d map, info dict)."""
    import numpy as np
    if path.endswith((".shlo", ".stablehlo")):
        from dino_tpu.serving import load_exported_predict
        served = load_exported_predict(path)
        # the deserialized program knows its true input shape even when the
        # .json sidecar is missing — fall back to its avals so a batch-N or
        # differently-shaped artifact still serves
        want = (served.contract["input"]["shape"] if served.contract
                else list(served.exported.in_avals[0].shape))
        art_batch = want[0]
        if art_batch > 1:
            print(f"dt-serve: artifact is batch-{art_batch}; single frames "
                  "will be tiled to fill the batch (export with "
                  "--batch-size 1 for latency serving)")

        def predict(img):
            if list(img.shape) != want[1:]:
                from PIL import Image
                img = np.asarray(Image.fromarray(img).resize(
                    (want[2], want[1])))
            batch = np.broadcast_to(img, (art_batch,) + img.shape)
            return served(np.ascontiguousarray(batch))[0]

        info = {"backend": "artifact", "artifact": path,
                "contract": served.contract}
        return predict, info
    from dino_tpu import DINOSeg
    model = DINOSeg.load_from_checkpoint(path)
    model.set_resolution(resolution)

    def predict(img):
        return model.predict(img, precision=precision)

    info = {"backend": "model", "checkpoint": path,
            "resolution": resolution,
            "precision": precision or model.precision,
            "n_classes": model.n_classes}
    return predict, info


def make_server(path: str, host: str = "127.0.0.1", port: int = 8080,
                resolution: int = 480, precision=None) -> ThreadingHTTPServer:
    import numpy as np
    from PIL import Image

    predict, info = _build_backend(path, resolution, precision)
    lock = threading.Lock()

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
            if self.path.split("?")[0] == "/healthz":
                self._send(200, json.dumps({"ok": True, **info}).encode(),
                           "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path.split("?")[0] != "/predict":
                self._send(404, b"not found", "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                img = np.asarray(
                    Image.open(io.BytesIO(self.rfile.read(n))).convert("RGB"))
                with lock:  # single-flight through the device
                    labels = np.asarray(predict(img))
            except Exception as exc:  # bad image, shape mismatch, ...
                self._send(400, json.dumps(
                    {"error": str(exc)}).encode(), "application/json")
                return
            if "format=png" in (self.path.split("?") + [""])[1]:
                from dino_tpu.utils.viz import label2rgb
                buf = io.BytesIO()
                Image.fromarray(label2rgb(labels)).save(buf, format="PNG")
                self._send(200, buf.getvalue(), "image/png")
            else:
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
    args = p.parse_args(argv)
    server = make_server(args.model, args.host, args.port, args.resolution,
                         args.precision)
    print(f"dt-serve: listening on http://{args.host}:{args.port} "
          f"(POST /predict, GET /healthz)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
