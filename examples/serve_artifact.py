#!/usr/bin/env python
"""Minimal deployment loop from an AOT serving artifact.

The robot/server side of the export story: `dt-export` produced
`predict.shlo` (+ `.json` contract) on the build machine; this process needs
only jax + numpy + the artifact — no dino_tpu model code, no checkpoint, no
Python-side tracing.  Frames batch to the contract's shape and come back as
int32 label maps.

    dt-export ckpt.ckpt.npz predict.shlo --batch-size 8 \
        --in-height 480 --in-width 640
    python examples/serve_artifact.py predict.shlo frames_dir/ out/
"""
import argparse
import glob
import json
import os
import time

import numpy as np
from PIL import Image


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("artifact", help="StableHLO file from dt-export")
    parser.add_argument("frames_dir")
    parser.add_argument("out_dir")
    args = parser.parse_args()

    # self-contained loader (the installed-package equivalent is
    # dino_tpu.load_exported_predict)
    import jax

    with open(args.artifact, "rb") as fh:
        exported = jax.export.deserialize(fh.read())
    with open(args.artifact + ".json") as fh:
        contract = json.load(fh)
    call = jax.jit(exported.call)
    batch, in_h, in_w, _ = contract["input"]["shape"]
    print(f"artifact: {contract['resolution']}px {contract['precision']} "
          f"for {contract['platforms']}, input {contract['input']['shape']}")

    os.makedirs(args.out_dir, exist_ok=True)
    paths = sorted(glob.glob(os.path.join(args.frames_dir, "*.jpg"))
                   + glob.glob(os.path.join(args.frames_dir, "*.png")))
    t0 = time.perf_counter()
    done = 0
    for start in range(0, len(paths) - batch + 1, batch):
        frames = np.stack([
            np.asarray(Image.open(p).convert("RGB").resize((in_w, in_h)))
            for p in paths[start:start + batch]]).astype(np.uint8)
        maps = np.asarray(call(frames))
        for j, m in enumerate(maps):
            np.save(os.path.join(
                args.out_dir, f"labels_{start + j:05d}.npy"), m)
        done += batch
    dt = time.perf_counter() - t0
    print(f"{done} frames in {dt:.2f}s -> {done / max(dt, 1e-9):.1f} fps")


if __name__ == "__main__":
    main()
