"""Frame/preprocessing helpers (reference dt_utils parity).

Covers transform_img / process_attentions / dt_frames
(dt_utils.py:43-114) with TPU-native conventions: NHWC float arrays, device
preprocessing via dino_tpu.ops, numpy for the host-side mass-thresholding.
"""
from __future__ import annotations

import os
from typing import Generator, Optional

import jax.numpy as jnp
import numpy as np
from PIL import Image

from dino_tpu.ops.preprocess import normalize_imagenet
from dino_tpu.ops.resize import resize_bilinear


def transform_img(img, patch_size: int = 8, grayscale: bool = False,
                  resolution: int = 480) -> jnp.ndarray:
    """Preprocess a PIL/array image for DINO: resize to 480^2, scale to [0,1],
    ImageNet-normalize (skipped in grayscale mode, matching the reference),
    crop to a patch-size multiple.  Returns (1, H, W, 3) float32 NHWC
    (reference returns NCHW torch; the content matches).
    """
    x = np.asarray(img)
    if x.dtype != np.uint8:
        x = np.clip(x, 0, 255).astype(np.uint8)
    if grayscale:
        g = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])
        x = np.repeat(g[..., None], 3, axis=-1).astype(np.uint8)
    t = resize_bilinear(jnp.asarray(x), resolution, resolution,
                        round_uint8=True)
    if grayscale:
        t = t / 255.0  # reference skips ImageNet normalization when grayscale
    else:
        t = normalize_imagenet(t)
    h = t.shape[0] - t.shape[0] % patch_size
    w = t.shape[1] - t.shape[1] % patch_size
    return t[None, :h, :w, :]


def process_attentions(attentions: np.ndarray,
                       threshold: Optional[float] = None,
                       patch_size: int = 8,
                       resolution: int = 480) -> np.ndarray:
    """Extract per-head CLS attention maps, optionally binarized to the top
    ``threshold`` probability mass (reference dt_utils.py:66-91).

    attentions: (1, nh, N, N) probabilities, or the O(N) CLS-only form
    (1, nh, 1, N) from ``get_last_selfattention(cls_only=True)`` — both
    index the same CLS row.  Returns (nh, res/P, res/P).
    """
    attentions = np.asarray(attentions)
    nh = attentions.shape[1]
    w_featmap = resolution // patch_size
    h_featmap = resolution // patch_size

    cls = attentions[0, :, 0, 1:].reshape(nh, -1)

    if threshold is not None:
        # keep only the smallest set of patches holding `threshold` mass
        idx = np.argsort(cls, axis=1)
        val = np.take_along_axis(cls, idx, axis=1)
        val = val / val.sum(axis=1, keepdims=True)
        cumval = np.cumsum(val, axis=1)
        th_attn = cumval > (1 - threshold)
        idx2 = np.argsort(idx, axis=1)
        th_attn = np.take_along_axis(th_attn, idx2, axis=1)
        return th_attn.reshape(nh, w_featmap, h_featmap).astype(np.float32)

    return cls.reshape(nh, w_featmap, h_featmap)


def dt_frames(subset=None, max: Optional[int] = None,
              path: str = os.path.join("..", "..", "data", "dt", "frames"),
              label_path: Optional[str] = None) -> Generator:
    """Iterate Duckietown frame folders as PIL images (dt_utils.py:94-114)."""
    files = [f for f in os.listdir(path)
             if f.endswith(".png") or f.endswith(".jpg")]
    files.sort()
    j = 0
    for i, f in enumerate(files):
        if subset is not None and i not in subset:
            continue
        with open(os.path.join(path, f), "rb") as file:
            img = Image.open(file).convert("RGB")
        j += 1
        if label_path is None:
            yield i, img
        else:
            with open(os.path.join(label_path, f), "rb") as file:
                mask = Image.open(file).convert("RGB")
            yield i, img, mask
        if max is not None and j == max:
            break
