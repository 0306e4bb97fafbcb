"""Native C++ DINO multi-crop pipeline vs the cv2 oracle.

Same design as the supervised pipeline (test_native_augment.py): all
randomness is drawn in Python (train.dino_pretrain.draw_dino_params), so
both backends see identical crop rectangles / flips / photometric factors;
pixels are then produced by either apply_dino_crop (cv2, the oracle) or
native/dtloader.cpp dino_crop_one.

Pixel contract (stated in native/dtloader.cpp resize_cubic_u8_cv2):
cv2's own INTER_CUBIC is not stable across machines (IPP vs generic vs
SIMD width, all within +-1); the native cubic sits in that same +-1
envelope.  Jitter/blur keep the supervised tolerance (MAD < 2.5 levels).
"""
import numpy as np
import pytest
from PIL import Image

from dino_tpu.data import native_loader
from dino_tpu.train.dino_pretrain import (DinoConfig, apply_dino_crop,
                                          dino_multi_crop,
                                          dino_multi_crop_batch,
                                          draw_dino_params, pack_dino_params)

CFG = DinoConfig(n_local_crops=4, global_size=64, local_size=32)

pytestmark = pytest.mark.skipif(native_loader.get_lib() is None,
                                reason="native loader unavailable")


@pytest.fixture(scope="module")
def sample(tmp_path_factory):
    root = tmp_path_factory.mktemp("dino_crops")
    rs = np.random.RandomState(0)
    paths, raws = [], []
    for i, (h, w) in enumerate([(200, 300), (96, 128), (417, 211)]):
        img = rs.randint(0, 255, (h, w, 3), np.uint8)
        p = str(root / f"{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
        raws.append(np.array(Image.open(p).convert("RGB")))
    return paths, raws


def _native_one(path, crops, cfg=CFG):
    out = native_loader.dino_crops_batch(
        [path], pack_dino_params(crops)[None], cfg.n_local_crops,
        cfg.global_size, cfg.local_size)
    assert out is not None
    return out


def test_geometry_crops_within_cubic_envelope(sample):
    """Crop + INTER_CUBIC resize + flip alone (photometrics stripped): the
    native path lands within the +-1 envelope cv2's own cubic variants span,
    on a tiny fraction of pixels."""
    paths, raws = sample
    for seed, (path, raw) in enumerate(zip(paths, raws)):
        crops = draw_dino_params(np.random.default_rng(seed),
                                 *raw.shape[:2], CFG)
        for p in crops:
            p["jitter"] = None
            p["gray"] = False
            p["blur_sigma"] = None
            p["solarize"] = False
        g, l = _native_one(path, crops)
        native = [g[0, 0], g[1, 0]] + [l[c, 0]
                                       for c in range(CFG.n_local_crops)]
        for n, p in zip(native, crops):
            want = apply_dino_crop(raw, p)
            d = np.abs(n.astype(int) - want.astype(int))
            assert d.max() <= 1, (seed, p["rect"], d.max())
            assert (d > 0).mean() < 0.10, (seed, (d > 0).mean())


@pytest.mark.parametrize("seed", list(range(8)))
def test_full_pipeline_matches_cv2_oracle(sample, seed):
    paths, raws = sample
    path, raw = paths[seed % 3], raws[seed % 3]
    crops = draw_dino_params(np.random.default_rng(seed), *raw.shape[:2],
                             CFG)
    g, l = _native_one(path, crops)
    native = [g[0, 0], g[1, 0]] + [l[c, 0] for c in range(CFG.n_local_crops)]
    for n, p in zip(native, crops):
        want = apply_dino_crop(raw, p)
        mad = np.abs(n.astype(np.int32) - want.astype(np.int32)).mean()
        assert mad < 2.5, (seed, p, mad)


def test_native_determinism(sample):
    paths, _ = sample
    rngs = lambda: [np.random.default_rng([7, i]) for i in range(3)]
    a = dino_multi_crop_batch(paths, rngs(), CFG)
    b = dino_multi_crop_batch(paths, rngs(), CFG)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_batch_layout_matches_per_image_path(sample, monkeypatch):
    """With the native path disabled, dino_multi_crop_batch must equal the
    per-image dino_multi_crop stacking bit-for-bit — the batch plumbing
    (crop-major layout, rng-per-image) adds nothing to the pixel stream."""
    paths, raws = sample
    monkeypatch.setattr(native_loader, "dino_crops_batch",
                        lambda *a, **k: None)
    g, l = dino_multi_crop_batch(paths,
                                 [np.random.default_rng([3, i])
                                  for i in range(3)], CFG)
    assert g.shape == (2, 3, 64, 64, 3) and l.shape == (4, 3, 32, 32, 3)
    for i, raw in enumerate(raws):
        gi, li = dino_multi_crop(np.random.default_rng([3, i]), raw, CFG)
        for c in range(2):
            np.testing.assert_array_equal(g[c, i], gi[c])
        for c in range(CFG.n_local_crops):
            np.testing.assert_array_equal(l[c, i], li[c])


def test_png_batch_falls_back(tmp_path):
    """A non-JPEG batch can't go through libjpeg — the fallback covers it
    and the result is still well-formed."""
    rs = np.random.RandomState(1)
    paths = []
    for i in range(2):
        p = str(tmp_path / f"{i}.png")
        Image.fromarray(rs.randint(0, 255, (80, 100, 3), np.uint8)).save(p)
        paths.append(p)
    g, l = dino_multi_crop_batch(paths,
                                 [np.random.default_rng([5, i])
                                  for i in range(2)], CFG)
    assert g.shape == (2, 2, 64, 64, 3) and l.shape == (4, 2, 32, 32, 3)
    assert g.dtype == np.uint8
