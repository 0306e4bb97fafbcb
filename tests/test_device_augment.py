"""Device-side augmentation backend (ops/device_augment.py) vs the cv2
oracle (data/augment.py) — per-op and full-pipeline tolerance contract,
plus the loader/fit integration."""
import numpy as np
import pytest

from dino_tpu.data.augment import apply_params, pack_params, draw_params
from dino_tpu.ops.device_augment import (augment_grid_mask,
                                         device_augment_batch)
from dino_tpu.ops.resize import resize_nearest

S = 64      # augmented canvas (resolution)
GRID = 8    # token grid (S / patch 8)


def _rand_img(seed, h=S, w=S):
    rs = np.random.RandomState(seed)
    # smooth-ish content so interpolation differences stay sub-level
    base = rs.randint(0, 255, (h // 8 + 2, w // 8 + 2, 3)).astype(np.float32)
    import cv2
    img = cv2.resize(base, (w, h), interpolation=cv2.INTER_LINEAR)
    return np.clip(img + rs.randn(h, w, 3) * 8, 0, 255).astype(np.uint8)


def _rand_mask(seed, h=S, w=S):
    return np.random.RandomState(seed + 99).randint(
        0, 4, (h, w)).astype(np.int64)


def _null_params():
    return {"crop": None, "affine": None, "flip": False, "jitter": None,
            "blur": None}


def _run_both(p, img, mask):
    """(cv2 full-res img/mask, device img + host grid mask) for one param
    set — through the same host-geometry staging the loader uses
    (prepare_device_batch: affine-firing samples warp on host with cv2)."""
    from dino_tpu.data.augment import prepare_device_batch
    cv_img, cv_mask = apply_params(p, img, mask, S)
    staged, packed = prepare_device_batch(img[None], [p], S)
    d_img = device_augment_batch(staged, packed)
    d_grid = augment_grid_mask(resize_nearest(mask.astype(np.int32), S, S),
                               p, S, GRID)
    return cv_img, cv_mask, np.asarray(d_img[0]), d_grid


def _grid(mask):
    return resize_nearest(np.asarray(mask), GRID, GRID).reshape(-1)


def test_cv2_gray_exact_under_default_matmul_precision():
    """_cv2_gray_u8 must be BIT-EQUAL to this cv2 build's cvtColor (the
    fx15 IPP recipe, round 4) — including when the ambient matmul
    precision is DEFAULT (bf16 dots on TPU): conftest pins 'highest'
    globally, which would mask a regression to a dot-product formulation
    whose coefficients are not bf16-representable."""
    import cv2
    import jax
    import jax.numpy as jnp
    from dino_tpu.ops.device_augment import _cv2_gray_u8

    img = _rand_img(3)
    with jax.default_matmul_precision("default"):
        got = np.asarray(jax.jit(_cv2_gray_u8)(jnp.asarray(img, jnp.float32)))
    want = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_contrast_mean_integer_exact():
    """op_contrast's two-stage gray mean must match the oracle's float64
    .mean() to one f32 rounding even when the gray sum exceeds 2^24 (where
    f32 accumulation is not guaranteed exact)."""
    import jax.numpy as jnp
    from dino_tpu.ops.device_augment import _cv2_gray_u8

    big = np.full((480, 480, 3), 251, np.uint8)
    big[:7, :11] = 13  # break uniformity so the mean is fractional
    g64 = _cv2_gray_u8(jnp.asarray(big, jnp.float32))
    g_int = np.asarray(g64).astype(np.int64)
    want = np.float32(g_int.mean())  # float64 mean, rounded once to f32
    q, r = divmod(int(g_int.sum()), g_int.size)
    got = np.float32(q) + np.float32(r) / np.float32(g_int.size)
    assert got == pytest.approx(float(want), abs=abs(np.spacing(want)))


def test_identity_params_bit_exact():
    p = _null_params()
    img, mask = _rand_img(0), _rand_mask(0)
    cv_img, cv_mask, d_img, d_grid = _run_both(p, img, mask)
    np.testing.assert_array_equal(d_img, cv_img)
    np.testing.assert_array_equal(d_grid, _grid(cv_mask))


def test_flip_bit_exact():
    p = _null_params()
    p["flip"] = True
    img, mask = _rand_img(1), _rand_mask(1)
    cv_img, cv_mask, d_img, d_grid = _run_both(p, img, mask)
    np.testing.assert_array_equal(d_img, cv_img)
    np.testing.assert_array_equal(d_grid, _grid(cv_mask))


def test_crop_resize_close():
    rng = np.random.default_rng(7)
    from dino_tpu.data.augment import _draw_crop
    for _ in range(6):
        p = _null_params()
        p["crop"] = _draw_crop(rng, S)
        img, mask = _rand_img(2), _rand_mask(2)
        cv_img, cv_mask, d_img, d_grid = _run_both(p, img, mask)
        mad = np.abs(d_img.astype(np.int32) - cv_img.astype(np.int32)).mean()
        assert mad < 1.0, (p["crop"], mad)
        agree = (d_grid == _grid(cv_mask)).mean()
        assert agree >= 0.95, (p["crop"], agree)


def test_affine_exact():
    """Affine samples: BIT-EXACT on both streams (round 5).  Pixels — the
    device backend stages the warp on host through the same exact-f32
    recipe the cv2 path runs; labels — augment_grid_mask composes the
    recipe's own f32 nearest index map, so the grid labels equal the
    full-res pipeline's exactly (the old >=0.9 agreement gate is gone)."""
    rng = np.random.default_rng(11)
    from dino_tpu.data.augment import _draw_affine
    for _ in range(6):
        p = _null_params()
        p["affine"] = _draw_affine(rng, S)
        img, mask = _rand_img(3), _rand_mask(3)
        cv_img, cv_mask, d_img, d_grid = _run_both(p, img, mask)
        np.testing.assert_array_equal(d_img, cv_img)
        np.testing.assert_array_equal(d_grid, _grid(cv_mask))


def test_jitter_bit_exact():
    """ColorJitter on device is BIT-EQUAL to the host oracle (round 4):
    same exact f32/integer chain — fx15 gray, integer-split contrast mean,
    hsv_shift=12 forward tables, two-rounding f32 HSV2RGB."""
    rng = np.random.default_rng(13)
    from dino_tpu.data.augment import _draw_jitter
    for trial in range(6):
        p = _null_params()
        p["jitter"] = _draw_jitter(rng)
        img, mask = _rand_img(4), _rand_mask(4)
        cv_img, _, d_img, _ = _run_both(p, img, mask)
        np.testing.assert_array_equal(d_img, cv_img,
                                      err_msg=str(p["jitter"]))


def test_device_hsv_roundtrip_bit_equal_host_exhaustive():
    """Device RGB2HSV (integer) and HSV2RGB (two-rounding f32) equal the
    host recipes over every (h, s) at a v sweep — the hue op's entire
    input structure (the conversions are elementwise in v), asserted by
    enumeration rather than sampling."""
    import jax
    import jax.numpy as jnp
    from dino_tpu.data.augment import hsv_to_rgb_u8, rgb_to_hsv_u8
    from dino_tpu.ops.device_augment import (_hsv_to_rgb_u8, _opaque_zero,
                                             _rgb_to_hsv_u8)

    H, Su = np.meshgrid(np.arange(180), np.arange(256), indexing="ij")
    for v_val in (0, 1, 37, 128, 254, 255):
        h = H.reshape(-1).astype(np.int64)
        s = Su.reshape(-1).astype(np.int64)
        v = np.full_like(h, v_val)
        want = hsv_to_rgb_u8(h, s, v)

        def run(hh, ss, vv, zsrc):
            return _hsv_to_rgb_u8(hh, ss, vv, _opaque_zero(zsrc))
        got = np.asarray(jax.jit(run)(
            jnp.asarray(h, jnp.int32), jnp.asarray(s, jnp.int32),
            jnp.asarray(v, jnp.int32),
            jnp.asarray(np.array([0.5], np.float32)))).astype(np.uint8)
        np.testing.assert_array_equal(got.reshape(want.shape), want,
                                      err_msg=f"v={v_val}")

    # forward: all RGB with b swept (integer path, sampled sweep)
    rs = np.random.RandomState(3)
    rgb = rs.randint(0, 256, (200000, 3)).astype(np.uint8)
    h_w, s_w, v_w = rgb_to_hsv_u8(rgb)
    hd, sd, vd = jax.jit(_rgb_to_hsv_u8)(
        jnp.asarray(rgb.reshape(-1, 1, 3), jnp.float32))
    np.testing.assert_array_equal(np.asarray(hd).reshape(-1), h_w)
    np.testing.assert_array_equal(np.asarray(sd).reshape(-1), s_w)
    np.testing.assert_array_equal(np.asarray(vd).reshape(-1), v_w)


def test_blur_exact():
    """Blur: BIT-EXACT vs the host recipe for EVERY k (round 5 — the
    dyadic /256 tap ladder makes both separable passes exact float
    arithmetic, so the device's banded matmuls compute the identical
    integers regardless of accumulation order; previously k >= 11 was
    off-by-<=1 per backend)."""
    for k in (3, 5, 7, 9, 13, 21, 41):
        p = _null_params()
        p["blur"] = k
        img, mask = _rand_img(5), _rand_mask(5)
        cv_img, _, d_img, _ = _run_both(p, img, mask)
        np.testing.assert_array_equal(d_img, cv_img, err_msg=str(k))


def test_full_pipeline_distribution():
    """Across seeds covering every op combination, the device pixels track
    the cv2 oracle within the native-backend tolerance class and the grid
    masks agree.  Same MAD<2.5 / >97% gate as tests/test_native_augment."""
    mads, agrees = [], []
    for seed in range(16):
        rng = np.random.default_rng(seed)
        p = draw_params(rng, S)
        img, mask = _rand_img(seed + 40), _rand_mask(seed + 40)
        cv_img, cv_mask, d_img, d_grid = _run_both(p, img, mask)
        mads.append(np.abs(d_img.astype(np.int32)
                           - cv_img.astype(np.int32)).mean())
        agrees.append((d_grid == _grid(cv_mask)).mean())
    assert np.mean(mads) < 2.5, mads
    assert np.mean(agrees) > 0.97, agrees


def test_batched_loader_device_backend():
    """Loader yields device arrays; the drawn parameters (and therefore the
    label stream up to backend pixel tolerance) match the cv2 backend under
    the same seed."""
    import jax
    from dino_tpu.data.dataset import DuckieSegDataset, batched_loader

    class FakeDS(DuckieSegDataset):
        def __init__(self, backend):
            self.files = [f"im{i}" for i in range(6)]
            self.path = "unused"
            self.augmented = True
            self.resolution = S
            self.patch_size = 8
            self.backend = backend

        def _load_raw(self, idx):
            return _rand_img(idx, 80, 100), _rand_mask(idx, 80, 100)

        def _load_mask(self, idx):
            return _rand_mask(idx, 80, 100).astype(np.int32)

    idx = np.arange(6)
    dev_batches = list(batched_loader(FakeDS("device"), idx, 3,
                                      rng=np.random.default_rng(5)))
    cv_batches = list(batched_loader(FakeDS("cv2"), idx, 3,
                                     rng=np.random.default_rng(5)))
    assert len(dev_batches) == len(cv_batches) == 2
    for (dx, dy), (cx, cy) in zip(dev_batches, cv_batches):
        assert isinstance(dx, jax.Array)  # frames stay on device
        assert isinstance(dy, np.ndarray)  # grid labels computed on host
        assert dx.shape == (3, S, S, 3) and dx.dtype == np.uint8
        assert dy.shape == (3, GRID * GRID)
        # same drawn params -> same label stream up to pixel tolerance
        assert (np.asarray(dy) == cy).mean() > 0.9
        mad = np.abs(np.asarray(dx).astype(np.int32)
                     - cx.astype(np.int32)).mean()
        assert mad < 4.0, mad


def test_fit_device_backend_smoke(tmp_path):
    """End-to-end: fit(augment_backend='device') trains and improves."""
    import os
    from PIL import Image
    from dino_tpu import DINOSeg

    root = str(tmp_path)
    rs = np.random.RandomState(0)
    colors = np.array([[200, 40, 40], [40, 200, 40], [40, 40, 200]])
    for split, n in (("train", 8), ("val", 3), ("test", 3)):
        jd = os.path.join(root, f"dt_real_voc_{split}", "JPEGImages")
        md = os.path.join(root, f"dt_real_voc_{split}", "SegmentationClass")
        os.makedirs(jd), os.makedirs(md)
        for i in range(n):
            mask = rs.randint(0, 3, (S, S)).astype(np.int64)
            img = np.clip(colors[mask] + rs.randn(S, S, 3) * 5,
                          0, 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(jd, f"im{i}.jpg"),
                                      quality=95)
            np.save(os.path.join(md, f"im{i}.npy"), mask)

    model = DINOSeg(data_path=root, write_path=str(tmp_path / "out"),
                    head="linear", n_blocks=1, n_classes=3, batch_size=4,
                    lr=1e-3, optimizer="adam", max_epochs=2,
                    random_init=True, augmented=True, train_resolution=S,
                    seed=0, precision="fp32")
    metrics = model.fit(samples_per_epoch=16, augment_backend="device")
    assert 0.0 <= metrics["test_acc"] <= 1.0


def test_unknown_backend_rejected():
    from dino_tpu.data.dataset import DuckieSegDataset
    with pytest.raises(ValueError, match="backend"):
        DuckieSegDataset("x", backend="gpu")


def test_fit_device_backend_composes_with_accum(tmp_path):
    """augment_backend='device' feeds device arrays into the accumulating
    train step — the two features must compose."""
    import os
    from PIL import Image
    from dino_tpu import DINOSeg

    root = str(tmp_path)
    rs = np.random.RandomState(1)
    colors = np.array([[200, 40, 40], [40, 200, 40], [40, 40, 200]])
    for split, n in (("train", 8), ("val", 2), ("test", 2)):
        jd = os.path.join(root, f"dt_real_voc_{split}", "JPEGImages")
        md = os.path.join(root, f"dt_real_voc_{split}", "SegmentationClass")
        os.makedirs(jd), os.makedirs(md)
        for i in range(n):
            mask = rs.randint(0, 3, (S, S)).astype(np.int64)
            img = np.clip(colors[mask] + rs.randn(S, S, 3) * 5,
                          0, 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(jd, f"im{i}.jpg"),
                                      quality=95)
            np.save(os.path.join(md, f"im{i}.npy"), mask)

    model = DINOSeg(data_path=root, write_path=str(tmp_path / "out"),
                    head="mlp", n_blocks=1, n_classes=3, batch_size=4,
                    lr=1e-3, optimizer="adam", freeze_backbone=False,
                    max_epochs=1, random_init=True, augmented=True,
                    train_resolution=S, seed=0, precision="fp32")
    metrics = model.fit(samples_per_epoch=8, augment_backend="device",
                        accum_steps=2, cache_features=False)
    assert 0.0 <= metrics["test_acc"] <= 1.0


def test_device_augment_rejects_live_affine_flag():
    from dino_tpu.data.augment import _draw_affine
    rng = np.random.default_rng(3)
    p = _null_params()
    p["affine"] = _draw_affine(rng, S)
    img = _rand_img(9)
    with pytest.raises(ValueError, match="affine flag"):
        device_augment_batch(img[None], pack_params(p)[None])


def test_floordiv_exact_f32_whole_domain():
    """The f32-division fixup (round 5: 31% of the augment program was
    XLA's slow int32 division) computes floor(num/den) EXACTLY over the
    entire domain the HSV tables use (v, diff in [1, 255]) and well past
    it (den up to 1023, num up to 2^24)."""
    import jax.numpy as jnp
    from dino_tpu.ops.device_augment import _floordiv_exact_f32

    d = np.arange(1, 256, dtype=np.int64)
    for num_base in (2 * 1044480, 2 * 122880):
        num = num_base + d
        got = np.asarray(_floordiv_exact_f32(
            jnp.asarray(num, jnp.int32), jnp.asarray(2 * d, jnp.int32)))
        np.testing.assert_array_equal(got, num // (2 * d))
    # stress beyond the table domain: random (num, den) pairs
    rs = np.random.RandomState(0)
    num = rs.randint(0, 1 << 24, 200_000).astype(np.int64)
    den = rs.randint(1, 1024, 200_000).astype(np.int64)
    got = np.asarray(_floordiv_exact_f32(jnp.asarray(num, jnp.int32),
                                         jnp.asarray(den, jnp.int32)))
    np.testing.assert_array_equal(got, num // den)
