#!/usr/bin/env python
"""Two-way interop example: train here, evaluate, export for the torch stack.

Demonstrates the full migration loop for a user of the reference
(sachaMorin/dino) stack:

  1. load a checkpoint — the reference's PL ``.ckpt`` works directly, as
     does this framework's native ``.ckpt.npz``;
  2. evaluate it on a VOC split with the standalone metrics API (balanced
     accuracy / macro-F1 / macro-IoU + per-class rows);
  3. export it back as a PyTorch-Lightning-compatible ``.ckpt`` that the
     reference's ``DINOSeg.load_from_checkpoint`` restores unchanged.

    python examples/interop_roundtrip.py ckpt.ckpt.npz dt_real_voc_test/ \
        exported_for_torch.ckpt
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dino_tpu import DINOSeg  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help="native .npz or torch PL .ckpt")
    ap.add_argument("eval_dir", help="VOC split dir (JPEGImages/ + "
                                     "SegmentationClass/)")
    ap.add_argument("output_ckpt", help="torch-side .ckpt to write")
    ap.add_argument("--resolution", type=int, default=480)
    args = ap.parse_args()

    model = DINOSeg.load_from_checkpoint(args.checkpoint)

    metrics = model.evaluate(args.eval_dir, resolution=args.resolution,
                             per_class=True)
    print(json.dumps({k: v for k, v in metrics.items()
                      if not k.endswith("per_class")}, indent=2))
    for row in metrics["test_per_class"]:
        print(f"  {row['class']:>14s}  recall={row['recall']:.3f}  "
              f"iou={row['iou']:.3f}  support={int(row['support'])}")

    model.save_torch_checkpoint(args.output_ckpt)
    print(f"wrote {args.output_ckpt} — loadable by the reference stack via "
          "DINOSeg.load_from_checkpoint (and by this framework; the loop "
          "is lossless, tests/test_torch_export.py)")


if __name__ == "__main__":
    main()
