#!/usr/bin/env python
"""Run inference on a folder of images and save label-overlay visualizations.

Mirrors dt_segmentation/visualize.py: load checkpoint -> set_resolution ->
predict every jpg/png -> save label2rgb overlays on the grayscale frame.
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np
from PIL import Image

from dino_tpu.api import DINOSeg
from dino_tpu.utils.labels import parse_class_names
from dino_tpu.utils.viz import label2rgb, rgb2gray


def inference(checkpoint_path, image_dir, target_dir, labels_path,
              resolution=480, cpu=False):
    """Use a trained checkpoint to run inference on all images in image_dir."""
    if cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    model = DINOSeg.load_from_checkpoint(checkpoint_path)
    # Only affects the inference resolution; output stays 480x480.
    model.set_resolution(resolution)

    os.makedirs(target_dir, exist_ok=True)
    class_names, _ = parse_class_names(labels_path)

    for ext in ["jpg", "png"]:
        for filename in sorted(glob.glob(os.path.join(image_dir, f"*.{ext}"))):
            with open(filename, "rb") as f:
                x = Image.open(f).convert("RGB")
            pred = model.predict(x)
            base = rgb2gray(np.array(x.resize((480, 480))))
            viz = label2rgb(pred, base, class_names=class_names)
            out = os.path.join(target_dir, os.path.basename(filename))
            Image.fromarray(viz).save(out)
            print(f"{out} saved.")


def main():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("checkpoint_path", help="Trained checkpoint")
    parser.add_argument("image_dir", help="Images to run inference on")
    parser.add_argument("target_dir", help="Where to save predictions")
    parser.add_argument("--labels_path", default=os.path.join("data",
                                                              "labels.txt"))
    parser.add_argument("--resolution", default=480, type=int)
    parser.add_argument("--cpu", action="store_true", help="Force CPU.")
    args = parser.parse_args()
    inference(**vars(args))


if __name__ == "__main__":
    main()
