"""Native C++ augmentation pipeline vs the cv2 oracle.

All randomness is drawn in Python (data.augment.draw_params), so both paths
see identical geometry/photometry parameters.  Pixel contract (stated in
data/augment.py and docs/SCALING.md):

  * resize / crop / flip: BIT-EXACT — the C++ resize replicates cv2's
    INTER_LINEAR 8U fixed-point arithmetic (native/dtloader.cpp:
    resize_bilinear_u8_cv2)
  * color jitter: BIT-EXACT (round 4) — both backends run the same exact
    f32/integer chain (fx15 gray, hsv_shift=12 tables, fused-f32 HSV2RGB)
  * GaussianBlur: BIT-EXACT for every k (round 5: dyadic /256 taps make
    both separable passes exact float arithmetic on any backend; k <= 9
    equals cv2's own output, k >= 11 deviates from cv2's float taps by
    <= 1 level — bounded below)
  * warpAffine: BIT-EXACT (round 5) — both backends run the exact
    two-rounding f32 recipe (data/augment.py:warp_affine_u8), which itself
    deviates from cv2 5.0's own build-dependent f32 SIMD warp on ~1e-4 of
    pixels by one level (bounded below)

Consequence: training streams are bit-identical across backends
UNCONDITIONALLY (blur + warp joined the bit-exact set in round 5, jitter
in round 4) — the same seed trains on the same pixels on any backend mix.
"""
import os

import numpy as np
import pytest
from PIL import Image

from dino_tpu.data import native_loader
from dino_tpu.data.augment import apply_params, draw_params, pack_params

pytestmark = pytest.mark.skipif(native_loader.get_lib() is None,
                                reason="native loader unavailable")


@pytest.fixture(scope="module")
def sample(tmp_path_factory):
    root = tmp_path_factory.mktemp("nat_aug")
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (300, 400, 3), np.uint8)
    path = str(root / "img.jpg")
    Image.fromarray(img).save(path, quality=95)
    raw = np.array(Image.open(path).convert("RGB"))
    mask = rs.randint(0, 7, (300, 400)).astype(np.int64)
    return path, raw, mask


@pytest.mark.parametrize("seed", list(range(10)))
def test_native_matches_cv2_oracle(sample, seed):
    path, raw, mask = sample
    p = draw_params(np.random.default_rng(seed), 480)
    native = native_loader.augment_batch([path], [mask], 480,
                                         pack_params(p)[None])
    assert native is not None
    ni, nm = native[0][0], native[1][0]
    pi, pm = apply_params(p, raw.copy(), mask.copy(), 480)
    img_mad = np.abs(ni.astype(np.int32) - pi.astype(np.int32)).mean()
    mask_agree = (nm == pm).mean()
    assert img_mad < 2.5, (seed, img_mad)
    assert mask_agree > 0.97, (seed, mask_agree)


def test_geometry_ops_bit_exact(sample):
    """resize / crop / flip (and their compositions): BIT-EQUAL to cv2, for
    both image and mask — the same seed trains on the same pixels on either
    backend whenever only these ops fire."""
    path, raw, mask = sample
    base = {"crop": None, "affine": None, "flip": False, "jitter": None,
            "blur": None}
    cases = [
        dict(base),                                   # plain resize
        {**base, "flip": True},
        {**base, "crop": (5, 9, 333, 471)},
        {**base, "crop": (17, 3, 129, 310), "flip": True},
        {**base, "crop": (0, 0, 400, 300)},           # full-frame crop
    ]
    for p in cases:
        native = native_loader.augment_batch([path], [mask], 480,
                                             pack_params(p)[None])
        pi, pm = apply_params(p, raw.copy(), mask.copy(), 480)
        np.testing.assert_array_equal(native[0][0], pi, err_msg=str(p))
        np.testing.assert_array_equal(native[1][0], pm, err_msg=str(p))


def test_forced_ops_match_oracle(sample):
    """Per-op tolerance pins for the ops that are NOT bit-exact (cv2's
    fixed-point warp/filter internals vs the C++ float math)."""
    path, raw, mask = sample
    base = {"crop": None, "affine": None, "flip": False, "jitter": None,
            "blur": None}
    affine = {**base, "affine": np.array([[0.95, 0.26, 12.0],
                                          [-0.26, 0.95, -30.0]])}
    # blur k <= 9: cv2's u8 path is fixed-point with hardcoded/quantized
    # taps that gaussian_blur_u8 mirrors — bit-exact
    for k in (3, 5, 7, 9):
        p = {**base, "blur": k}
        nat = native_loader.augment_batch([path], [mask], 480,
                                          pack_params(p)[None])
        pi, _ = apply_params(p, raw.copy(), mask.copy(), 480)
        np.testing.assert_array_equal(nat[0][0], pi, err_msg=f"blur {k}")
    # color jitter: BIT-EXACT (round 4) — every factor combination and
    # order, including hue through the u8 HSV round-trip
    jitter_cases = [
        {**base, "jitter": (np.array([3, 0, 1, 2]), (1.0, 1.0, 1.0, -0.2))},
        {**base, "jitter": (np.array([1, 2, 0, 3]), (0.6, 1.15, 0.85, 0.1))},
        {**base, "jitter": (np.array([0, 1, 2, 3]), (1.5, 0.8, 1.2, 0.2))},
        {**base, "jitter": (np.array([2, 3, 1, 0]), (0.5, 1.2, 0.8, -0.15))},
    ]
    for p in jitter_cases:
        native = native_loader.augment_batch([path], [mask], 480,
                                             pack_params(p)[None])
        pi, _ = apply_params(p, raw.copy(), mask.copy(), 480)
        np.testing.assert_array_equal(native[0][0], pi,
                                      err_msg=str(p["jitter"]))
    # k >= 11 blur: BIT-EXACT across backends (round 5 dyadic taps)
    for k in (11, 13, 21, 41):
        p = {**base, "blur": k}
        native = native_loader.augment_batch([path], [mask], 480,
                                             pack_params(p)[None])
        pi, _ = apply_params(p, raw.copy(), mask.copy(), 480)
        np.testing.assert_array_equal(native[0][0], pi,
                                      err_msg=f"blur {k}")
    # warpAffine: BIT-EXACT across backends (round 5 — the exact f32
    # recipe), image AND mask
    nat = native_loader.augment_batch([path], [mask], 480,
                                      pack_params(affine)[None])
    pi, pm = apply_params(affine, raw.copy(), mask.copy(), 480)
    np.testing.assert_array_equal(nat[0][0], pi)
    np.testing.assert_array_equal(nat[1][0], pm)


def test_native_determinism(sample):
    path, _, mask = sample
    pa = pack_params(draw_params(np.random.default_rng(42), 480))[None]
    a = native_loader.augment_batch([path], [mask], 480, pa)
    b = native_loader.augment_batch([path], [mask], 480, pa)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_batched_loader_native_train_epoch(sample, tmp_path):
    """The augmented batched_loader goes through the native batch call and is
    deterministic under the epoch rng."""
    from dino_tpu.data.dataset import DuckieSegDataset, batched_loader
    path, _, mask = sample
    root = tmp_path / "dt_real_voc_train"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "SegmentationClass").mkdir()
    for i in range(3):
        os.link(path, str(root / "JPEGImages" / f"im{i}.jpg"))
        np.save(str(root / "SegmentationClass" / f"im{i}.npy"), mask)
    ds = DuckieSegDataset(str(root), augmented=True, resolution=480)
    idx = np.array([0, 1, 2, 0, 1])

    def epoch(seed):
        return [(x.copy(), y.copy()) for x, y in
                batched_loader(ds, idx, 2, rng=np.random.default_rng(seed))]

    a, b = epoch(7), epoch(7)
    assert len(a) == 3 and a[0][0].shape == (2, 480, 480, 3)
    assert a[-1][0].shape == (1, 480, 480, 3)  # ragged tail preserved
    for (xa, ya), (xb, yb) in zip(a, b):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)
    c = epoch(8)
    assert not np.array_equal(a[0][0], c[0][0])


def test_warp_recipe_deviation_from_cv2_is_bounded(sample):
    """The warp recipe's honest trade, pinned: vs this cv2 build's own
    warpAffine (the new OpenCV 5 f32 SIMD engine) the recipe differs on
    at most 5e-4 of pixels, by at most one level — the same class of
    deviation as the HSV2RGB fma note (data/augment.py)."""
    import cv2
    from dino_tpu.data.augment import warp_affine_u8, warp_affine_mask
    _, raw, mask = sample
    rng = np.random.default_rng(0)
    from dino_tpu.data.augment import _draw_affine, resize_pair
    img, m_res = resize_pair(raw, mask, 480)
    bad = 0
    total = 0
    mx = 0
    for _ in range(5):
        M = np.float32(_draw_affine(rng, 480)).astype(np.float64)
        ref = cv2.warpAffine(img, M, (480, 480), flags=cv2.INTER_LINEAR,
                             borderMode=cv2.BORDER_REFLECT_101)
        got = warp_affine_u8(img, M, 480)
        d = np.abs(ref.astype(np.int32) - got.astype(np.int32))
        bad += (d != 0).sum()
        total += d.size
        mx = max(mx, int(d.max()))
        # mask agreement stays at the previous contract level or better
        mref = cv2.warpAffine(m_res.astype(np.int32), M, (480, 480),
                              flags=cv2.INTER_NEAREST,
                              borderMode=cv2.BORDER_REFLECT_101)
        mgot = warp_affine_mask(m_res.astype(np.int32), M, 480)
        assert (mref == mgot).mean() > 0.998
    assert mx <= 1, mx
    assert bad / total < 5e-4, bad / total


def test_blur_recipe_deviation_from_cv2_is_bounded(sample):
    """The k >= 11 blur recipe's honest trade, pinned: /256-quantized taps
    deviate from cv2's own float-tap GaussianBlur by at most one level
    (k <= 9 needs no bound — those taps ARE cv2's, asserted bit-equal in
    test_forced_ops_match_oracle)."""
    import cv2
    from dino_tpu.data.augment import gaussian_blur_u8, resize_pair
    _, raw, _ = sample
    img, _ = resize_pair(raw, None, 480)
    for k in (11, 13, 21, 41):
        ref = cv2.GaussianBlur(img, (k, k), sigmaX=0)
        got = gaussian_blur_u8(img, k)
        d = np.abs(ref.astype(np.int32) - got.astype(np.int32))
        assert d.max() <= 1, (k, int(d.max()))
