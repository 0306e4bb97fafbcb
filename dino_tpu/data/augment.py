"""Host-side training augmentations, semantics-equivalent to the reference's
albumentations pipeline (pl_torch_modules.py:44-57):

    Resize(480) -> RandomResizedCrop(480, scale=(.25,1), ratio=(.9,1.1), p=.75)
    -> ShiftScaleRotate(shift=.4, scale=.1, rotate=15, p=.25)
    -> HorizontalFlip(p=.5) -> ColorJitter(brightness=.5, p=.5)
    -> GaussianBlur(blur_limit=(3,41), p=.25)

Images are interpolated bilinearly, masks nearest; affine borders reflect-101
(albumentations defaults).  Implemented with cv2 (the same SIMD backend
albumentations wraps) over a numpy Generator, so augmentation distributions
match while staying independent of the torch RNG stream.  Normalization is NOT
done here — it fuses into the device graph (dino_tpu.ops.preprocess).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import cv2
import numpy as np


def resize_pair(img: np.ndarray, mask: Optional[np.ndarray],
                size: int) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    img = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
    if mask is not None:
        mask = cv2.resize(mask.astype(np.int32), (size, size),
                          interpolation=cv2.INTER_NEAREST)
    return img, mask


def _random_resized_crop(rng: np.random.Generator, img, mask, size,
                         scale=(0.25, 1.0), ratio=(0.9, 1.1)):
    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        aspect = math.exp(rng.uniform(math.log(ratio[0]), math.log(ratio[1])))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            x0 = rng.integers(0, w - cw + 1)
            y0 = rng.integers(0, h - ch + 1)
            img = img[y0:y0 + ch, x0:x0 + cw]
            mask = None if mask is None else mask[y0:y0 + ch, x0:x0 + cw]
            return resize_pair(img, mask, size)
    # fallback: center crop to the closest in-range aspect
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    x0, y0 = (w - cw) // 2, (h - ch) // 2
    img = img[y0:y0 + ch, x0:x0 + cw]
    mask = None if mask is None else mask[y0:y0 + ch, x0:x0 + cw]
    return resize_pair(img, mask, size)


def _shift_scale_rotate(rng: np.random.Generator, img, mask,
                        shift_limit=0.4, scale_limit=0.1, rotate_limit=15):
    h, w = img.shape[:2]
    angle = rng.uniform(-rotate_limit, rotate_limit)
    scale = 1.0 + rng.uniform(-scale_limit, scale_limit)
    dx = rng.uniform(-shift_limit, shift_limit)
    dy = rng.uniform(-shift_limit, shift_limit)
    m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, scale)
    m[0, 2] += dx * w
    m[1, 2] += dy * h
    img = cv2.warpAffine(img, m, (w, h), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_REFLECT_101)
    if mask is not None:
        mask = cv2.warpAffine(mask.astype(np.int32), m, (w, h),
                              flags=cv2.INTER_NEAREST,
                              borderMode=cv2.BORDER_REFLECT_101)
    return img, mask


def _color_jitter(rng: np.random.Generator, img,
                  brightness=0.5, contrast=0.2, saturation=0.2, hue=0.2):
    """torchvision-style ColorJitter (albumentations default ranges except
    brightness, which the reference widens to 0.5): factors sampled uniformly,
    transforms applied in random order."""
    ops = []
    b = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
    ops.append(("b", b))
    c = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
    ops.append(("c", c))
    s = rng.uniform(max(0.0, 1 - saturation), 1 + saturation)
    ops.append(("s", s))
    hshift = rng.uniform(-hue, hue)
    ops.append(("h", hshift))
    order = rng.permutation(len(ops))

    x = img.astype(np.float32)
    for i in order:
        kind, f = ops[i]
        if kind == "b":
            x = x * f
        elif kind == "c":
            gray = cv2.cvtColor(np.clip(x, 0, 255).astype(np.uint8),
                                cv2.COLOR_RGB2GRAY).mean()
            x = x * f + gray * (1 - f)
        elif kind == "s":
            gray = cv2.cvtColor(np.clip(x, 0, 255).astype(np.uint8),
                                cv2.COLOR_RGB2GRAY).astype(np.float32)
            x = x * f + gray[..., None] * (1 - f)
        elif kind == "h":
            hsv = cv2.cvtColor(np.clip(x, 0, 255).astype(np.uint8),
                               cv2.COLOR_RGB2HSV)
            hch = hsv[..., 0].astype(np.int32) + int(round(f * 180))
            hsv[..., 0] = np.mod(hch, 180).astype(np.uint8)
            x = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB).astype(np.float32)
        x = np.clip(x, 0, 255)
    return x.astype(np.uint8)


def _gaussian_blur(rng: np.random.Generator, img, blur_limit=(3, 41)):
    k = int(rng.integers(blur_limit[0] // 2, blur_limit[1] // 2 + 1)) * 2 + 1
    return cv2.GaussianBlur(img, (k, k), sigmaX=0)


def augment(rng: np.random.Generator, img: np.ndarray, mask: np.ndarray,
            size: int = 480) -> Tuple[np.ndarray, np.ndarray]:
    """Full training augmentation. img uint8 (H,W,3), mask int (H,W)."""
    img, mask = resize_pair(img, mask, size)
    if rng.random() < 0.75:
        img, mask = _random_resized_crop(rng, img, mask, size)
    if rng.random() < 0.25:
        img, mask = _shift_scale_rotate(rng, img, mask)
    if rng.random() < 0.5:
        img = img[:, ::-1].copy()
        mask = mask[:, ::-1].copy()
    if rng.random() < 0.5:
        img = _color_jitter(rng, img)
    if rng.random() < 0.25:
        img = _gaussian_blur(rng, img)
    return img, mask
