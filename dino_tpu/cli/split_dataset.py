#!/usr/bin/env python
"""Carve a VOC-style dataset directory into train/test/val datasets.

Behavior parity with the reference tool (dt_segmentation/split_dataset.py):
given ``<root>`` produced by dt-sim2voc / dt-labelme2voc, creates
``<root>_train`` / ``<root>_test`` / ``<root>_val`` siblings with the same
four artifact subdirectories, assigns images by a seeded numpy shuffle of
the JPEG list (first ``n_test`` to test, the next ``n_val`` to val, the
remainder to train — defaults 20/10, seed 42), and copies every artifact
that exists for each image plus ``class_names.txt`` into each split.

Implementation is original: the assignment is computed up front as a
split plan (so the tool can report what it did), and copies tolerate
missing per-image artifacts (a dataset without the visualization dir
still splits cleanly).
"""
from __future__ import annotations

import argparse
import glob
import os
import shutil
from typing import Dict, List

import numpy as np

# artifact subdirectory -> file extension for each image stem
_ARTIFACTS = {
    "JPEGImages": ".jpg",
    "SegmentationClass": ".npy",
    "SegmentationClassPNG": ".png",
    "SegmentationClassVisualization": ".jpg",
}
_SPLIT_SUFFIXES = ("_train", "_test", "_val")


def plan_splits(root: str, n_test: int, n_val: int,
                seed: int) -> Dict[str, List[str]]:
    """Return {suffix: [image stems]} using the reference's assignment rule.

    The shuffle runs over the raw ``glob`` listing (not a sorted one) with
    ``np.random.seed(seed)`` — the exact procedure the reference uses, so a
    given filesystem enumeration + seed reproduces the published splits.
    """
    jpgs = glob.glob(os.path.join(root, "JPEGImages", "*.jpg"))
    np.random.seed(seed)
    np.random.shuffle(jpgs)
    stems = [os.path.splitext(os.path.basename(p))[0] for p in jpgs]
    return {
        "_test": stems[:n_test],
        "_val": stems[n_test:n_test + n_val],
        "_train": stems[n_test + n_val:],
    }


def materialize(root: str, plan: Dict[str, List[str]]) -> None:
    """Create the split directories and copy assigned artifacts."""
    labels_src = os.path.join(root, "class_names.txt")
    for suffix in _SPLIT_SUFFIXES:
        dst_root = root + suffix
        for sub in _ARTIFACTS:
            os.makedirs(os.path.join(dst_root, sub))
        shutil.copy(labels_src, os.path.join(dst_root, "class_names.txt"))
        for stem in plan[suffix]:
            for sub, ext in _ARTIFACTS.items():
                src = os.path.join(root, sub, stem + ext)
                if os.path.exists(src):
                    shutil.copy(src, os.path.join(dst_root, sub, stem + ext))


def main() -> None:
    ap = argparse.ArgumentParser(
        description=__doc__.splitlines()[0],
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    ap.add_argument("input_dir", help="input voc style dataset")
    ap.add_argument("--n_test", type=int, default=20,
                    help="Number of images in test set")
    ap.add_argument("--n_val", type=int, default=10,
                    help="Number of images in val set")
    ap.add_argument("--seed", type=int, default=42,
                    help="shuffle seed (42 reproduces the reference splits)")
    args = ap.parse_args()

    root = args.input_dir.rstrip(os.sep)
    plan = plan_splits(root, args.n_test, args.n_val, args.seed)
    materialize(root, plan)
    for suffix in _SPLIT_SUFFIXES:
        print(f"{root}{suffix}: {len(plan[suffix])} images")


if __name__ == "__main__":
    main()
