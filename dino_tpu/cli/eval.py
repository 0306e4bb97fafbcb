"""dt-eval: standalone segmentation metrics for a checkpoint on a VOC dir.

The reference computes balanced accuracy / macro-F1 / macro-IoU only inside
its training loops (pl_torch_modules.py:310-341); this CLI runs the same
sklearn-exact computation (from an on-device confusion matrix) against any
``JPEGImages/`` + ``SegmentationClass/*.npy`` directory, without training.

    dt-eval results/3_mlp_finetuned.ckpt.npz data/dt_real_voc_test \
        --resolution 480 --per-class
"""
from __future__ import annotations

import argparse
import json


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("checkpoint", help="native .npz or torch PL .ckpt")
    p.add_argument("data_dir", help="VOC-style split dir (JPEGImages/ + "
                                    "SegmentationClass/*.npy)")
    p.add_argument("--resolution", type=int, default=None,
                   help="eval resolution (multiple of 8; default: the "
                        "checkpoint's train_resolution)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--prefix", default="test",
                   help="metric-name prefix in the output JSON")
    p.add_argument("--per-class", action="store_true",
                   help="include per-class recall/precision/F1/IoU rows")
    p.add_argument("--json", dest="json_out", default=None,
                   help="also write the metrics JSON to this path")
    args = p.parse_args(argv)

    from dino_tpu import DINOSeg
    model = DINOSeg.load_from_checkpoint(args.checkpoint)
    metrics = model.evaluate(args.data_dir, resolution=args.resolution,
                             batch_size=args.batch_size, prefix=args.prefix,
                             per_class=args.per_class)
    line = json.dumps(metrics, sort_keys=True)
    if args.json_out:
        with open(args.json_out, "w") as fh:
            fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
