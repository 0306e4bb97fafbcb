"""Fused device-side preprocessing: resize -> ImageNet-normalize (one graph).

The reference preprocesses on the CPU with albumentations (Resize + Normalize +
ToTensorV2, pl_torch_modules.py:33-41).  Here the uint8 frame is shipped to the
device once and everything else — cv2-compatible bilinear resize, /255,
ImageNet mean/std — runs inside the same jitted program as the ViT forward, so
XLA fuses it with the patchify matmul.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dino_tpu.ops.resize import resize_bilinear

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_imagenet(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) float pixel values in [0, 255] -> ImageNet-normalized floats."""
    mean = jnp.asarray(IMAGENET_MEAN * 255.0)
    std = jnp.asarray(IMAGENET_STD * 255.0)
    return (x.astype(jnp.float32) - mean) / std


def preprocess(img: jnp.ndarray, resolution: int) -> jnp.ndarray:
    """uint8 (..., H, W, 3) -> normalized float32 (..., res, res, 3).

    Matches get_transforms(resolution): cv2 INTER_LINEAR resize on uint8
    (rounded back to integers) followed by albumentations Normalize.
    """
    x = resize_bilinear(img, resolution, resolution, round_uint8=True)
    return normalize_imagenet(x)
