#!/usr/bin/env python
"""Save per-head CLS attention maps for one image.

Mirrors dt_segmentation/visualize_attention.py: load checkpoint ->
get_last_selfattention -> CLS row per head -> reshape to the patch grid ->
nearest-upsample x8 -> one PNG per head + the preprocessed input image.
"""
from __future__ import annotations

import argparse
import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402

from dino_tpu.api import DINOSeg  # noqa: E402
from dino_tpu.ops.resize import resize_nearest  # noqa: E402


def vis_mask(checkpoint_path, filename, target_dir, resolution=480):
    patch_size = 8
    model = DINOSeg.load_from_checkpoint(checkpoint_path)
    model.set_resolution(resolution)

    os.makedirs(target_dir, exist_ok=True)
    with open(filename, "rb") as f:
        img = np.array(Image.open(f).convert("RGB"))

    # (1, nh, 1, N) CLS-row probabilities at the requested resolution —
    # O(N) memory, so --resolution 960 works on one chip (the reference
    # materializes (1, nh, N, N) and reads only this row, :50)
    attn = model.get_last_selfattention(img[None], cls_only=True)
    nh = attn.shape[1]
    grid = resolution // patch_size
    cls_attn = attn[0, :, 0, 1:].reshape(nh, grid, grid)

    # normalized input image, like torchvision save_image(normalize=True)
    x = np.array(Image.fromarray(img).resize((resolution, resolution)))
    plt.imsave(os.path.join(target_dir, "img.png"), x)

    for j in range(nh):
        up = resize_nearest(cls_attn[j], resolution, resolution)
        fname = os.path.join(target_dir, f"attn-head-dino{j}.png")
        plt.imsave(fname=fname, arr=up, format="png")
        print(f"{fname} saved.")


def main():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("checkpoint_path", help="Trained checkpoint")
    parser.add_argument("filename", help="Image to compute attention on")
    parser.add_argument("target_dir", help="Where to save attentions")
    parser.add_argument("--resolution", default=480, type=int)
    args = parser.parse_args()
    vis_mask(**vars(args))


if __name__ == "__main__":
    main()
