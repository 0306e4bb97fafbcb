"""PIL-space augmentations — used by the DINO multi-crop pretraining recipe.

DERIVED from the reference's GaussianBlur/Solarization transforms
(dt_segmentation/src/utils.py:36-68, themselves from facebookresearch/dino):
each is a three-line PIL call whose parameters ARE the behavioral contract,
so they are kept deliberately identical in effect.
"""
from __future__ import annotations

import random

from PIL import Image, ImageFilter, ImageOps


class GaussianBlur:
    """Randomly apply gaussian blur with radius in [radius_min, radius_max]."""

    def __init__(self, p: float = 0.5, radius_min: float = 0.1,
                 radius_max: float = 2.0):
        self.prob = p
        self.radius_min = radius_min
        self.radius_max = radius_max

    def __call__(self, img: Image.Image) -> Image.Image:
        if random.random() > self.prob:
            return img
        return img.filter(ImageFilter.GaussianBlur(
            radius=random.uniform(self.radius_min, self.radius_max)))


class Solarization:
    """Randomly solarize (invert pixels above the 128 threshold)."""

    def __init__(self, p: float):
        self.p = p

    def __call__(self, img: Image.Image) -> Image.Image:
        if random.random() < self.p:
            return ImageOps.solarize(img)
        return img
