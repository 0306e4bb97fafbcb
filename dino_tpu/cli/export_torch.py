"""dt-export-torch: export a dino_tpu checkpoint back to the reference stack.

Closes the interop loop opened by ``DINOSeg.load_from_checkpoint`` (which
reads the reference's PL ``.ckpt`` files): a model trained or finetuned in
dino_tpu is written out as a PyTorch-Lightning-compatible ``.ckpt`` with the
exact key layout the reference's DINOSeg produces
(dt_segmentation/src/pl_torch_modules.py:141-237), so the reference's
``DINOSeg.load_from_checkpoint(path)`` restores it unchanged.

    dt-export-torch results/3_mlp_finetuned.ckpt.npz results/3_mlp.ckpt
"""
from __future__ import annotations

import argparse
import json


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("checkpoint", help="native .npz (or a torch .ckpt to "
                                      "round-trip/normalize)")
    p.add_argument("output", help="output .ckpt path")
    p.add_argument("--epoch", type=int, default=0,
                   help="epoch to record in the checkpoint header")
    p.add_argument("--global-step", type=int, default=0)
    args = p.parse_args(argv)

    from dino_tpu import DINOSeg
    model = DINOSeg.load_from_checkpoint(args.checkpoint)
    model.save_torch_checkpoint(args.output, epoch=args.epoch,
                                global_step=args.global_step)
    print(json.dumps({
        "output": args.output,
        "backbone": model.backbone,
        "head": model.head,
        "n_blocks": model.n_blocks,
        "n_classes": model.n_classes,
    }))


if __name__ == "__main__":
    main()
