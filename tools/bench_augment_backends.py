#!/usr/bin/env python
"""End-to-end augmented-training throughput per augmentation backend.

Builds a synthetic JPEG dataset (640x480 sources, like the camera), then runs
real `DINOSeg.fit` epochs — decode, augment, host->device, unfrozen train
step — once per backend (cv2 / native C++ / device) and reports steady-state
epoch throughput.  This measures the claim behind augment_backend='device':
on few-core hosts the host augment chain, not the chip, binds unfrozen
finetune throughput (PERF.md "Host pipeline").

    python tools/bench_augment_backends.py [--samples 96] [--epochs 3]
"""
import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_dataset(root: str, n: int = 24, src=(480, 640)) -> None:
    from PIL import Image
    rs = np.random.RandomState(0)
    colors = rs.randint(40, 220, (5, 3))
    for split, k in (("train", n), ("val", 2), ("test", 2)):
        jd = os.path.join(root, f"dt_real_voc_{split}", "JPEGImages")
        md = os.path.join(root, f"dt_real_voc_{split}", "SegmentationClass")
        os.makedirs(jd, exist_ok=True), os.makedirs(md, exist_ok=True)
        for i in range(k):
            mask = rs.randint(0, 5, (src[0] // 8, src[1] // 8))
            mask = np.kron(mask, np.ones((8, 8), int))
            img = np.clip(colors[mask] + rs.randn(*src, 3) * 10,
                          0, 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(jd, f"im{i}.jpg"),
                                      quality=92)
            np.save(os.path.join(md, f"im{i}.npy"), mask)


def run_backend(root: str, backend: str, samples: int, epochs: int,
                batch: int) -> dict:
    from dino_tpu import DINOSeg
    model = DINOSeg(data_path=root, write_path=os.path.join(root, "out"),
                    head="mlp", n_blocks=3, n_classes=5, batch_size=batch,
                    lr=1e-4, optimizer="adam", freeze_backbone=False,
                    max_epochs=epochs, random_init=True, augmented=True,
                    train_resolution=480, seed=0)
    times = []
    orig = model._log

    def capture(metrics, step):
        if "epoch_time_s" in metrics and step >= 0:
            times.append(metrics["epoch_time_s"])
        orig(metrics, step)

    model._log = capture
    t0 = time.perf_counter()
    model.fit(samples_per_epoch=samples, cache_features=False,
              augment_backend=backend)
    wall = time.perf_counter() - t0
    steady = min(times[1:]) if len(times) > 1 else times[0]
    return {"backend": backend, "epoch_s": [round(t, 2) for t in times],
            "steady_fps": round(samples / steady, 1),
            "wall_s": round(wall, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=96)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--backends", nargs="+",
                    default=["cv2", "native", "device"])
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as root:
        build_dataset(root)
        rows = []
        for b in args.backends:
            try:
                rows.append(run_backend(root, b, args.samples, args.epochs,
                                        args.batch))
            except RuntimeError as exc:   # e.g. native lib unavailable
                rows.append({"backend": b, "error": str(exc)})
            print(json.dumps(rows[-1]))
        print(json.dumps({"samples_per_epoch": args.samples,
                          "batch": args.batch, "rows": rows}))


if __name__ == "__main__":
    main()
