#!/usr/bin/env python
"""Measure the torch-CPU reference baseline (predict AND train frames/sec).

Dev-only tool: imports the reference ViT from /root/reference as the oracle
implementation, builds the BASELINE config #2 model (ViT-S/8 truncated to 3
blocks + MLP head), and times:

  * the full predict path on CPU: resize+normalize (numpy/cv2, standing in
    for albumentations) -> ViT forward -> per-patch head -> argmax -> kron
    upsample  -> ``torch_cpu_fps``
  * the unfrozen finetune step on CPU: forward -> NLL over patches ->
    backward -> Adam step (all params trainable)  -> ``torch_cpu_train_fps``

Results merge into bench_baseline.json (committed) so bench.py never needs
torch or the reference at runtime.  ``--predict-only`` / ``--train-only``
remeasure one number without disturbing the other (the predict baseline was
recorded on an idle host; don't silently overwrite it from a loaded one).
"""
import argparse
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

RES, N_BLOCKS, N_CLASSES = 480, 3, 7
MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def _build():
    vt = load_reference_vit()
    torch.manual_seed(0)
    model = vt.vit_small(patch_size=8, num_classes=0)
    model.blocks = model.blocks[:N_BLOCKS]
    head = torch.nn.Sequential(
        torch.nn.Linear(384, 200), torch.nn.ReLU(),
        torch.nn.Linear(200, 100), torch.nn.ReLU(),
        torch.nn.Linear(100, N_CLASSES), torch.nn.LogSoftmax(dim=1))
    return model, head


def measure_predict(n_iters: int = 8) -> dict:
    model, head = _build()
    model.eval(), head.eval()
    rs = np.random.RandomState(0)
    frame = rs.randint(0, 255, (480, 640, 3), np.uint8)

    def predict(img):
        x = cv2.resize(img, (RES, RES), interpolation=cv2.INTER_LINEAR)
        x = (x.astype(np.float32) / 255.0 - MEAN) / STD
        x = torch.from_numpy(x.transpose(2, 0, 1)[None])
        with torch.no_grad():
            tokens = model(x)[:, 1:]
            logp = head(tokens.reshape(-1, 384))
        low = logp.argmax(-1).numpy().reshape(RES // 8, RES // 8)
        return np.kron(low, np.ones((8, 8), dtype=int))

    predict(frame)  # warmup
    t0 = time.perf_counter()
    for _ in range(n_iters):
        predict(frame)
    fps = n_iters / (time.perf_counter() - t0)
    return {"torch_cpu_fps": fps, "n_iters": n_iters}


def measure_train(n_iters: int = 3) -> dict:
    """Unfrozen finetune step/sec on CPU (the counterpart of bench.py's
    unfrozen_train_fps): train-mode forward, patch-level NLL, backward,
    Adam over backbone+head — the reference's finetune configuration
    (run_experiment.py --unfreeze; pl_torch_modules.py training_step)."""
    model, head = _build()
    model.train(), head.train()
    opt = torch.optim.Adam(
        list(model.parameters()) + list(head.parameters()), lr=1e-5)
    rs = np.random.RandomState(1)
    n_patches = (RES // 8) ** 2
    x_np = rs.randint(0, 255, (1, RES, RES, 3)).astype(np.float32)
    x_np = ((x_np / 255.0 - MEAN) / STD).transpose(0, 3, 1, 2)
    x = torch.from_numpy(np.ascontiguousarray(x_np))
    y = torch.from_numpy(rs.randint(0, N_CLASSES, (n_patches,)))

    def step():
        opt.zero_grad()
        tokens = model(x)[:, 1:]
        logp = head(tokens.reshape(-1, 384))
        loss = F.nll_loss(logp, y)
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(n_iters):
        step()
    fps = n_iters / (time.perf_counter() - t0)  # batch 1 => steps == frames
    return {"torch_cpu_train_fps": fps, "train_n_iters": n_iters,
            "train_config": "unfrozen 3-block + MLP head, 480px batch 1, "
                            "Adam"}


def main():
    ap = argparse.ArgumentParser()
    g = ap.add_mutually_exclusive_group()
    g.add_argument("--predict-only", action="store_true")
    g.add_argument("--train-only", action="store_true")
    args = ap.parse_args()

    path = os.path.join(os.path.dirname(__file__), "..",
                        "bench_baseline.json")
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    host_meta = {
        "torch_version": torch.__version__,
        "torch_threads": torch.get_num_threads(),
        "cpu_count": os.cpu_count(),
    }
    out.setdefault("config",
                   "ViT-S/8 3-block + MLP head, 480px single-frame predict")
    # host metadata is stamped only next to the number measured on THIS
    # host — a --train-only rerun must not re-label the retained predict
    # measurement's environment
    if not args.train_only:
        out.update(measure_predict())
        out.update(host_meta)
    if not args.predict_only:
        out.update(measure_train())
        out.update({f"train_{k}": v for k, v in host_meta.items()})
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
