"""VOC-style Duckietown segmentation dataset + host loading pipeline.

Spec: DuckieSegDataset (pl_torch_modules.py:60-105) — JPEGImages/*.jpg paired
with SegmentationClass/<name>.npy masks; images resized (or augmented) to the
training resolution, masks nearest-resized to the (res/8)^2 token grid and
flattened.  The epoch is 1000 uniformly-resampled images regardless of dataset
size (WeightedRandomSampler, pl_torch_modules.py:352).

Device-side normalization is NOT done here; batches carry uint8 images so the
host->device transfer is 4x smaller and normalize+patchify fuse into the
jitted step (dino_tpu.ops.preprocess).
"""
from __future__ import annotations

import concurrent.futures as cf
import glob
import os
from typing import Iterator, Optional, Tuple

import numpy as np
from PIL import Image

from dino_tpu.data.augment import (apply_params, draw_params, pack_params,
                                   resize_pair)
from dino_tpu.ops.resize import resize_nearest


class DuckieSegDataset:
    """Index-addressable (image uint8 (res,res,3), mask int32 (res/8)^2) pairs."""

    def __init__(self, path: str, augmented: bool = False, resolution: int = 480,
                 patch_size: int = 8, backend: str = "auto"):
        if backend not in ("auto", "native", "cv2", "device"):
            raise ValueError(f"unknown augmentation backend {backend!r}")
        self.path = path
        self.files = sorted(
            glob.glob(os.path.join(path, "JPEGImages", "*.jpg")))
        self.augmented = augmented
        self.resolution = resolution
        self.patch_size = patch_size
        # augmentation pixel backend (batched_loader): 'auto' = native C++
        # when built, else cv2; 'device' runs every pixel op after
        # decode+resize inside one jitted program (ops/device_augment.py) —
        # the choice changes WHERE pixels are computed, never which random
        # parameters are drawn (data/augment.py contract)
        self.backend = backend

    def __len__(self) -> int:
        return len(self.files)

    def _load_mask(self, idx: int) -> np.ndarray:
        name = os.path.splitext(os.path.basename(self.files[idx]))[0]
        return np.load(os.path.join(self.path, "SegmentationClass",
                                    name + ".npy")).astype(np.int32)

    def _load_img(self, idx: int) -> np.ndarray:
        from dino_tpu.data import native_loader
        img = native_loader.decode(self.files[idx])  # C++ libjpeg path
        if img is None:
            with open(self.files[idx], "rb") as fh:
                img = np.array(Image.open(fh).convert("RGB"))
        return img

    def _load_raw(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        return self._load_img(idx), self._load_mask(idx)

    def get(self, idx: int, rng: Optional[np.random.Generator] = None
            ) -> Tuple[np.ndarray, np.ndarray]:
        if self.augmented:
            rng = rng if rng is not None else np.random.default_rng()
            # randomness is drawn HERE (numpy, seed-deterministic); this
            # per-item path runs the Python/cv2 pixel pipeline — the native
            # C++ batch pipeline (same semantics) belongs to batched_loader,
            # where its thread-pool setup amortizes over a whole batch
            p = draw_params(rng, self.resolution)
            img, mask = apply_params(p, *self._load_raw(idx),
                                     self.resolution)
        else:
            # eval path: decode+resize fuse inside the native loader
            # (identical bilinear semantics to the Python path)
            from dino_tpu.data import native_loader
            img = native_loader.decode_resize(
                self.files[idx], self.resolution, self.resolution)
            if img is not None:
                mask = resize_nearest(self._load_mask(idx),
                                      self.resolution, self.resolution)
            else:
                img, mask = resize_pair(*self._load_raw(idx),
                                        self.resolution)
        grid = self.resolution // self.patch_size
        mask = resize_nearest(mask, grid, grid).reshape(-1)
        return img, mask

    def __getitem__(self, idx: int):
        return self.get(idx)


def epoch_indices(rng: np.random.Generator, n_items: int,
                  samples_per_epoch: int = 1000) -> np.ndarray:
    """Uniform resampling with replacement (== WeightedRandomSampler with
    equal weights, exactly 1000 samples/epoch in the reference)."""
    return rng.integers(0, n_items, size=samples_per_epoch)


def _params_for(seed, size: int) -> dict:
    """Per-sample augmentation parameters from a per-sample seed — the ONE
    place the rng is constructed and consumed, shared by every backend
    (device / native C++ / cv2 fallback): the cross-backend determinism
    contract lives here."""
    rng = (np.random.default_rng(seed) if seed is not None
           else np.random.default_rng())
    return draw_params(rng, size)


def batched_loader(dataset: DuckieSegDataset, indices: np.ndarray,
                   batch_size: int, rng: Optional[np.random.Generator] = None,
                   num_workers: int = 8
                   ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Threaded prefetch loader yielding stacked (B,res,res,3) u8 / (B,G*G) i32.

    Replaces the reference's 24-process torch DataLoader (pl_torch_modules.py:354)
    with a thread pool — decode/augment release the GIL inside PIL/cv2.
    Incomplete trailing batches are dropped only if empty (parity: torch
    DataLoader keeps partial batches by default).
    """
    # Non-augmented (eval) epochs go through the C++ thread-pool loader in
    # one call per batch: libjpeg decode + fused resize without the GIL.
    # Any per-batch native failure (corrupt file, missing lib) falls back to
    # the per-item Python path for that batch only.
    if not dataset.augmented:
        from dino_tpu.data import native_loader
        if native_loader.get_lib() is not None:
            res = dataset.resolution
            grid = res // dataset.patch_size
            for start in range(0, len(indices), batch_size):
                chunk = [int(i) for i in indices[start:start + batch_size]]
                imgs = native_loader.load_batch(
                    [dataset.files[i] for i in chunk], res, res)
                if imgs is None:
                    items = [dataset.get(i) for i in chunk]
                    xs, ys = zip(*items)
                    yield np.stack(xs), np.stack(ys)
                    continue
                masks = np.stack([
                    resize_nearest(resize_nearest(dataset._load_mask(i),
                                                  res, res),
                                   grid, grid).reshape(-1)
                    for i in chunk])
                yield imgs, masks
            return

    if dataset.augmented and dataset.backend == "native":
        from dino_tpu.data import native_loader as _nl
        if _nl.get_lib() is None:  # explicit ask -> fail, don't silently cv2
            raise RuntimeError("backend='native' requested but the C++ "
                               "loader is unavailable (no toolchain?)")

    seeds = (rng.integers(0, 2**63, size=len(indices))
             if rng is not None else [None] * len(indices))

    # Device backend: host does decode + resize only (the eval path);
    # crop/warp/flip/jitter/blur and the token-grid mask downsample run
    # inside ONE jitted program per batch (ops/device_augment.py).  The rng
    # consumption is identical to the host backends (draw_params once per
    # sample), so the determinism contract is unchanged; batches are
    # yielded as device arrays — no host roundtrip before the train step.
    if dataset.augmented and dataset.backend == "device":
        from dino_tpu.data import native_loader
        from dino_tpu.data.augment import prepare_device_batch
        from dino_tpu.data.augment import resize_pair as _rp
        from dino_tpu.data.prefetch import prefetched
        from dino_tpu.ops.device_augment import (augment_grid_mask,
                                                 device_augment_batch)
        res = dataset.resolution
        grid = res // dataset.patch_size

        def load_chunk(start: int):
            chunk = [int(i) for i in indices[start:start + batch_size]]
            chunk_seeds = seeds[start:start + batch_size]
            params = [_params_for(s, res) for s in chunk_seeds]
            imgs = (native_loader.load_batch(
                        [dataset.files[i] for i in chunk], res, res)
                    if native_loader.get_lib() is not None else None)
            raw_masks = None
            if imgs is None:
                # one _load_raw per sample: its mask is reused below rather
                # than re-read from disk via _load_mask (and _load_raw stays
                # the single subclass override point)
                raws = [dataset._load_raw(i) for i in chunk]
                imgs = np.stack([_rp(im, None, res)[0] for im, _ in raws])
                raw_masks = [m.astype(np.int32) for _, m in raws]
            # affine-firing samples (25%) get crop+warp here with cv2 (the
            # oracle); their flags clear so the device program needs no
            # per-pixel gather (see prepare_device_batch)
            imgs, packed = prepare_device_batch(imgs, params, res)
            # grid labels on host: composed nearest sampling, exact vs the
            # transform-then-downsample pipeline; only uint8 frames ride
            # the host->device wire
            if raw_masks is None:
                raw_masks = [dataset._load_mask(i) for i in chunk]
            masks = np.stack([
                augment_grid_mask(resize_nearest(m, res, res), p, res, grid)
                for m, p in zip(raw_masks, params)])
            return imgs, packed, masks

        # decode of chunk k+1 overlaps the device augment + train step of
        # chunk k (the loader rng stream is a pure function of the chunk
        # start, so prefetching cannot change the pixel stream)
        for _, (imgs, packed, masks) in prefetched(
                range(0, len(indices), batch_size), load_chunk):
            yield device_augment_batch(imgs, packed), masks
        return

    # Augmented (train) epochs: one C++ thread-pool call per batch — decode,
    # resize, crop, warp, flip, jitter, blur all run native; Python only
    # draws the per-sample parameters (seed-deterministic) and downsamples
    # the returned masks to the token grid.
    from dino_tpu.data import native_loader
    if (dataset.augmented and dataset.backend in ("auto", "native")
            and native_loader.get_lib() is not None):
        res = dataset.resolution
        grid = res // dataset.patch_size
        for start in range(0, len(indices), batch_size):
            chunk = [int(i) for i in indices[start:start + batch_size]]
            chunk_seeds = seeds[start:start + batch_size]
            params = np.stack([pack_params(_params_for(s, res))
                               for s in chunk_seeds])
            native = native_loader.augment_batch(
                [dataset.files[i] for i in chunk],
                [dataset._load_mask(i) for i in chunk], res, params)
            if native is None:
                # cv2 fallback for this batch: apply the SAME drawn params
                # through the Python pixel path (no repeat native-augment
                # attempts; identical rng consumption to the native path)
                items = []
                for i, s in zip(chunk, chunk_seeds):
                    p = _params_for(s, res)
                    img, mask = apply_params(p, *dataset._load_raw(i), res)
                    items.append((img, resize_nearest(mask, grid,
                                                      grid).reshape(-1)))
                xs, ys = zip(*items)
                yield np.stack(xs), np.stack(ys)
                continue
            imgs, masks = native
            yield imgs, np.stack([
                resize_nearest(m, grid, grid).reshape(-1) for m in masks])
        return

    def fetch(args):
        idx, seed = args
        item_rng = np.random.default_rng(seed) if seed is not None else None
        return dataset.get(int(idx), item_rng)

    with cf.ThreadPoolExecutor(max_workers=num_workers) as pool:
        it = pool.map(fetch, zip(indices, seeds), chunksize=1)
        batch = []
        for item in it:
            batch.append(item)
            if len(batch) == batch_size:
                xs, ys = zip(*batch)
                yield np.stack(xs), np.stack(ys)
                batch = []
        if batch:
            xs, ys = zip(*batch)
            yield np.stack(xs), np.stack(ys)
