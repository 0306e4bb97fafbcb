#!/usr/bin/env python
"""Robot-camera streaming example: continuous segmentation + attention maps.

Simulates the deployment loop from the paper — camera frames stream in, the
model emits a 480x480 label map per frame (lane following / obstacle
avoidance input), and every Nth frame also extracts per-head CLS attention
maps for monitoring.

    python examples/robot_stream.py checkpoint.ckpt.npz frames_dir/ out/
"""
import argparse
import glob
import os
import sys
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dino_tpu import DINOSeg
from dino_tpu.utils.frames import process_attentions
from dino_tpu.utils.viz import label2rgb, rgb2gray


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint")
    parser.add_argument("frames_dir")
    parser.add_argument("out_dir")
    parser.add_argument("--resolution", type=int, default=480)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--attn-every", type=int, default=32)
    args = parser.parse_args()

    model = DINOSeg.load_from_checkpoint(args.checkpoint)
    model.set_resolution(args.resolution)
    os.makedirs(args.out_dir, exist_ok=True)

    paths = sorted(glob.glob(os.path.join(args.frames_dir, "*.jpg"))
                   + glob.glob(os.path.join(args.frames_dir, "*.png")))

    def camera():
        for p in paths:
            yield np.array(Image.open(p).convert("RGB"))

    t0 = time.perf_counter()
    for i, label_map in enumerate(model.predict_stream(camera(),
                                                       batch_size=args.batch)):
        if i % args.attn_every == 0:
            frame = np.array(Image.open(paths[i]).convert("RGB"))
            base = rgb2gray(np.array(Image.fromarray(frame).resize((480, 480))))
            Image.fromarray(label2rgb(label_map, base)).save(
                os.path.join(args.out_dir, f"overlay_{i:05d}.jpg"))
            res = model.resolution
            attn = model.get_last_selfattention(
                np.array(Image.fromarray(frame).resize((res, res)))[None])
            maps = process_attentions(attn, threshold=0.6, resolution=res)
            np.save(os.path.join(args.out_dir, f"attn_{i:05d}.npy"), maps)
    dt = time.perf_counter() - t0
    print(f"{len(paths)} frames in {dt:.2f}s -> {len(paths) / dt:.1f} fps")


if __name__ == "__main__":
    main()
