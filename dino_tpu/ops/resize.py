"""cv2/albumentations-compatible bilinear image resize as separable matmuls.

The reference preprocessing resizes uint8 camera frames with
``albumentations.Resize`` (cv2 ``INTER_LINEAR``) before normalizing
(reference: dt_segmentation/src/pl_torch_modules.py:33-41).  We reproduce the
same half-pixel bilinear semantics on-device, as two MXU matmuls over
statically-shaped weight matrices, so decode -> resize -> normalize ->
patchify fuses into one XLA graph.

cv2 INTER_LINEAR semantics replicated:
  * src coord = (dst + 0.5) * n_in / n_out - 0.5, clamped at the low border
  * 2-tap linear weights, indices clamped to the valid range (replicate)
  * uint8 inputs are rounded half-up back to integers after resampling
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def bilinear_resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Dense (n_out, n_in) float32 half-pixel bilinear resampling matrix."""
    dst = np.arange(n_out, dtype=np.float64)
    src = (dst + 0.5) * (n_in / n_out) - 0.5
    src = np.clip(src, 0.0, n_in - 1.0)
    i0 = np.floor(src).astype(np.int64)
    t = src - i0
    w = np.zeros((n_out, n_in), dtype=np.float64)
    rows = np.arange(n_out)
    np.add.at(w, (rows, np.clip(i0, 0, n_in - 1)), 1.0 - t)
    np.add.at(w, (rows, np.clip(i0 + 1, 0, n_in - 1)), t)
    return w.astype(np.float32)


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int,
                    round_uint8: bool = True) -> jnp.ndarray:
    """Resize (..., H, W, C) image(s) to (..., out_h, out_w, C), float32 output.

    With ``round_uint8=True`` values are rounded half-up to integers, matching
    cv2's fixed-point INTER_LINEAR on uint8 inputs.
    """
    h, w = img.shape[-3], img.shape[-2]
    x = img.astype(jnp.float32)
    if h != out_h:
        wr = jnp.asarray(bilinear_resize_matrix(h, out_h))
        x = jnp.einsum("oh,...hwc->...owc", wr, x)
    if w != out_w:
        wc = jnp.asarray(bilinear_resize_matrix(w, out_w))
        x = jnp.einsum("ow,...hwc->...hoc", wc, x)
    if round_uint8:
        x = jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)
    return x


@functools.lru_cache(maxsize=None)
def nearest_resize_indices(n_in: int, n_out: int) -> np.ndarray:
    """Index map for torchvision NEAREST resize (used for label masks).

    torchvision InterpolationMode.NEAREST maps dst -> floor(dst * n_in / n_out),
    matching the reference's mask downsampling to the token grid
    (pl_torch_modules.py:69-70,103).
    """
    dst = np.arange(n_out, dtype=np.float64)
    src = np.floor(dst * (n_in / n_out)).astype(np.int64)
    return np.clip(src, 0, n_in - 1)


def resize_nearest(mask: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W) integer mask (host-side, numpy)."""
    ri = nearest_resize_indices(mask.shape[0], out_h)
    ci = nearest_resize_indices(mask.shape[1], out_w)
    return mask[np.ix_(ri, ci)]
