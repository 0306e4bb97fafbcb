"""dt-export: produce an AOT serving artifact from a checkpoint.

The deployment analog of the reference's in-process `DINOSeg.predict()`
(pl_torch_modules.py:276-300): load a checkpoint (native .npz or torch PL
.ckpt), bind resolution/batch/input shape, and serialize the entire fused
predict program as StableHLO with the weights baked in
(dino_tpu/serving.py).  The artifact runs anywhere with jax + the target
platform — no model code, no checkpoint file.

    dt-export results/3_mlp_finetuned.ckpt.npz predict.shlo \
        --resolution 480 --batch-size 4 --in-height 480 --in-width 640
"""
from __future__ import annotations

import argparse
import json


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("checkpoint", help=".npz or torch PL .ckpt")
    p.add_argument("output", help="artifact path (sidecar: <output>.json)")
    p.add_argument("--resolution", type=int, default=480,
                   help="inference resolution (multiple of 8)")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--in-height", type=int, default=480)
    p.add_argument("--in-width", type=int, default=640)
    p.add_argument("--precision", default=None,
                   choices=["bf16", "fp32", "int8"],
                   help="override the checkpoint's serving precision")
    p.add_argument("--n-devices", type=int, default=None,
                   help="export sharded over this many chips (batch "
                        "shards, params replicate)")
    p.add_argument("--parallelism", default=None, choices=["sp"],
                   help="with --n-devices: 'sp' exports the ring-attention "
                        "sequence-parallel program (tokens shard, I/O "
                        "replicates) for very-high-resolution serving")
    args = p.parse_args(argv)

    from dino_tpu import DINOSeg, export_predict
    model = DINOSeg.load_from_checkpoint(args.checkpoint)
    model.set_resolution(args.resolution)
    path = export_predict(model, args.output, batch_size=args.batch_size,
                          in_shape=(args.in_height, args.in_width),
                          precision=args.precision,
                          n_devices=args.n_devices,
                          parallelism=args.parallelism)
    with open(path + ".json") as fh:
        contract = json.load(fh)
    print(json.dumps({"artifact": path, **contract}))


if __name__ == "__main__":
    main()
