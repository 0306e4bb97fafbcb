#!/usr/bin/env python
"""Measure the torch-CPU reference baseline (frames/sec, predict-equivalent).

Dev-only tool: imports the reference ViT from /root/reference as the oracle
implementation, builds the BASELINE config #2 model (ViT-S/8 truncated to 3
blocks + MLP head), and times the full predict path on CPU:
resize+normalize (numpy/cv2, standing in for albumentations) -> ViT forward ->
per-patch head -> argmax -> kron upsample.  Result is cached to
bench_baseline.json (committed) so bench.py never needs torch or the
reference at runtime.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
from gen_goldens import load_reference_vit  # noqa: E402

import cv2  # noqa: E402
import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def main():
    res, n_blocks, n_classes = 480, 3, 7
    vt = load_reference_vit()
    torch.manual_seed(0)
    model = vt.vit_small(patch_size=8, num_classes=0)
    model.blocks = model.blocks[:n_blocks]
    model.eval()
    head = torch.nn.Sequential(
        torch.nn.Linear(384, 200), torch.nn.ReLU(),
        torch.nn.Linear(200, 100), torch.nn.ReLU(),
        torch.nn.Linear(100, n_classes), torch.nn.LogSoftmax(dim=1)).eval()

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    rs = np.random.RandomState(0)
    frame = rs.randint(0, 255, (480, 640, 3), np.uint8)

    def predict(img):
        x = cv2.resize(img, (res, res), interpolation=cv2.INTER_LINEAR)
        x = (x.astype(np.float32) / 255.0 - mean) / std
        x = torch.from_numpy(x.transpose(2, 0, 1)[None])
        with torch.no_grad():
            tokens = model(x)[:, 1:]
            logp = head(tokens.reshape(-1, 384))
        low = logp.argmax(-1).numpy().reshape(res // 8, res // 8)
        return np.kron(low, np.ones((8, 8), dtype=int))

    predict(frame)  # warmup
    n_iters = 8
    t0 = time.perf_counter()
    for _ in range(n_iters):
        predict(frame)
    dt = time.perf_counter() - t0
    fps = n_iters / dt

    out = {
        "torch_cpu_fps": fps,
        "config": "ViT-S/8 3-block + MLP head, 480px single-frame predict",
        "torch_version": torch.__version__,
        "torch_threads": torch.get_num_threads(),
        "cpu_count": os.cpu_count(),
        "n_iters": n_iters,
    }
    path = os.path.join(os.path.dirname(__file__), "..",
                        "bench_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
