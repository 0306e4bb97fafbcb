"""The jitter chain's color conversions as EXACT recipes vs this cv2 build.

Round 4 replaced the cv2.cvtColor calls in the jitter oracle
(data/augment.py:_apply_jitter) with explicit arithmetic recipes so the
C++ and device backends can reproduce the chain bit-for-bit.  These tests
pin each recipe against the installed cv2 over a broad randomized +
boundary-structured sample (the recipes were originally verified
EXHAUSTIVELY — 16.7M RGB triples for gray/HSV-forward, 11.8M HSV triples
for the backward; the sampled form keeps the suite fast while still
catching any cv2-build drift).
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dino_tpu.data.augment import gray_u8, hsv_to_rgb_u8, rgb_to_hsv_u8


def _sample_rgb(n=300000):
    rs = np.random.RandomState(7)
    return np.concatenate([
        rs.randint(0, 256, (n, 3)),
        rs.randint(0, 8, (n // 10, 3)),          # near-black boundaries
        255 - rs.randint(0, 8, (n // 10, 3)),    # near-white boundaries
        np.stack(np.meshgrid(np.arange(0, 256, 5), np.arange(0, 256, 5),
                             [0, 128, 255]), -1).reshape(-1, 3),
    ]).astype(np.uint8)


def test_gray_recipe_matches_cv2():
    vals = _sample_rgb()
    want = cv2.cvtColor(vals.reshape(1, -1, 3), cv2.COLOR_RGB2GRAY).ravel()
    np.testing.assert_array_equal(gray_u8(vals), want)


def test_rgb_to_hsv_recipe_matches_cv2():
    vals = _sample_rgb()
    want = cv2.cvtColor(vals.reshape(1, -1, 3),
                        cv2.COLOR_RGB2HSV).reshape(-1, 3)
    h, s, v = rgb_to_hsv_u8(vals)
    np.testing.assert_array_equal(h, want[:, 0].astype(h.dtype))
    np.testing.assert_array_equal(s, want[:, 1].astype(s.dtype))
    np.testing.assert_array_equal(v, want[:, 2].astype(v.dtype))


def test_hsv_to_rgb_recipe_tracks_cv2():
    """The backward recipe deliberately uses two-rounding f32 where cv2's
    build fma-contracts (data/augment.py:hsv_to_rgb_u8 rationale): assert
    the deviation stays within one level on a vanishing fraction of
    inputs — the recipe's portability contract."""
    rs = np.random.RandomState(8)
    hsv = np.stack([rs.randint(0, 180, 400000),
                    rs.randint(0, 256, 400000),
                    rs.randint(0, 256, 400000)], -1).astype(np.uint8)
    # plus the full boundary grid on h (every hue at s/v extremes)
    hh = np.arange(180)
    grid = np.stack(np.meshgrid(hh, [0, 1, 254, 255], [0, 1, 254, 255]),
                    -1).reshape(-1, 3).astype(np.uint8)
    hsv = np.concatenate([hsv, grid])
    want = cv2.cvtColor(hsv.reshape(1, -1, 3),
                        cv2.COLOR_HSV2RGB).reshape(-1, 3).astype(np.int64)
    got = hsv_to_rgb_u8(hsv[:, 0].astype(np.int64),
                        hsv[:, 1].astype(np.int64),
                        hsv[:, 2].astype(np.int64)).astype(np.int64)
    assert np.abs(got - want).max() <= 1
    assert (got != want).mean() < 1e-3


def test_jitter_chain_cross_checks_old_oracle_class():
    """The new exact-recipe chain stays in the same tolerance class as the
    old cv2-call oracle (sanity that the canonicalization did not change
    the augmentation semantics, only its last-ulp determinism)."""
    from dino_tpu.data.augment import _apply_jitter
    rs = np.random.RandomState(9)
    img = rs.randint(0, 256, (64, 64, 3), np.uint8)
    order = np.array([1, 2, 0, 3])
    factors = (0.7, 1.2, 0.9, 0.12)
    got = _apply_jitter(img, order, factors)

    # old-style chain with direct cv2 calls and python-float factors
    b, c, s, hshift = factors
    x = img.astype(np.float32)
    for i in order:
        if i == 0:
            x = x * b
        elif i == 1:
            gray = cv2.cvtColor(np.clip(x, 0, 255).astype(np.uint8),
                                cv2.COLOR_RGB2GRAY).mean()
            x = x * c + gray * (1 - c)
        elif i == 2:
            gray = cv2.cvtColor(np.clip(x, 0, 255).astype(np.uint8),
                                cv2.COLOR_RGB2GRAY).astype(np.float32)
            x = x * s + gray[..., None] * (1 - s)
        else:
            hsv = cv2.cvtColor(np.clip(x, 0, 255).astype(np.uint8),
                               cv2.COLOR_RGB2HSV)
            hch = hsv[..., 0].astype(np.int32) + int(round(hshift * 180))
            hsv[..., 0] = np.mod(hch, 180).astype(np.uint8)
            x = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB).astype(np.float32)
        x = np.clip(x, 0, 255)
    old = x.astype(np.uint8)
    assert np.abs(got.astype(int) - old.astype(int)).max() <= 1
    assert (got == old).mean() > 0.98
