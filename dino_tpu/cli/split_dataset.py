#!/usr/bin/env python
"""Split a VOC-style dataset into _train/_test/_val directories.

Mirrors dt_segmentation/split_dataset.py: seeded (42) shuffle, first n_test to
test, next n_val to val, rest to train; copies all four artifact dirs.
"""
from __future__ import annotations

import argparse
import glob
import os
import os.path as osp
import shutil

import numpy as np


def main():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("input_dir", help="input voc style dataset")
    parser.add_argument("--n_test", default=20, type=int,
                        help="Number of images in test set")
    parser.add_argument("--n_val", default=10, type=int,
                        help="Number of images in val set")
    parser.add_argument("--seed", default=42, type=int)
    args = parser.parse_args()

    np.random.seed(args.seed)

    dirs = ["JPEGImages", "SegmentationClass", "SegmentationClassPNG",
            "SegmentationClassVisualization"]
    for split in ["_train", "_test", "_val"]:
        os.makedirs(args.input_dir + split)
        for d in dirs:
            os.makedirs(osp.join(args.input_dir + split, d))
            shutil.copy(osp.join(args.input_dir, "class_names.txt"),
                        osp.join(args.input_dir + split, "class_names.txt"))

    files = glob.glob(osp.join(args.input_dir, "JPEGImages", "*.jpg"))
    np.random.shuffle(files)

    for i, filename in enumerate(files):
        if i < args.n_test:
            split = "_test"
        elif i < args.n_test + args.n_val:
            split = "_val"
        else:
            split = "_train"
        base = osp.basename(filename)[:-4]
        for d, ext in [("JPEGImages", "jpg"), ("SegmentationClass", "npy"),
                       ("SegmentationClassPNG", "png"),
                       ("SegmentationClassVisualization", "jpg")]:
            src = osp.join(args.input_dir, d, base + "." + ext)
            if osp.exists(src):
                shutil.copy(src, osp.join(args.input_dir + split, d,
                                          base + "." + ext))


if __name__ == "__main__":
    main()
