"""Frozen-backbone feature cache: cached epochs must match the recompute path.

With the ViT backbone frozen and augmentations off, per-image backbone
features are epoch-constant; fit(cache_features=True) computes them once and
trains the head on the device-resident cache.  These tests pin that the
optimization changes nothing observable: same losses, same confusion
matrices, same trained head (reference semantics: pl_torch_modules.py:365-432
with requires_grad flipped off on the backbone, :434-440).
"""
import os

import jax
import numpy as np
import pytest

from dino_tpu import DINOSeg

from tests.test_train_smoke import RES, N_CLASSES, _make_split


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("voc_cache"))
    _make_split(root, "train", 10, 0)
    _make_split(root, "val", 4, 1)
    _make_split(root, "test", 4, 2)
    return root


def _fit(voc_root, tmp_path, tag, cache, **overrides):
    kwargs = dict(data_path=voc_root, write_path=str(tmp_path / tag),
                  head="mlp", n_blocks=1, n_classes=N_CLASSES, batch_size=4,
                  lr=1e-3, optimizer="adam", freeze_backbone=True,
                  max_epochs=2, random_init=True, augmented=False,
                  train_resolution=RES, seed=0)
    kwargs.update(overrides)
    model = DINOSeg(**kwargs)
    history = []
    orig = model._log

    def capture(metrics, step):
        history.append((step, dict(metrics)))
        orig(metrics, step)

    model._log = capture
    # 10 samples/epoch with batch 4 => ragged tail batch exercised too
    metrics = model.fit(samples_per_epoch=10, cache_features=cache)
    return model, history, metrics


def test_cached_matches_uncached(voc_root, tmp_path):
    m_off, h_off, t_off = _fit(voc_root, tmp_path, "off", cache=False)
    m_on, h_on, t_on = _fit(voc_root, tmp_path, "on", cache=True)

    # epoch-by-epoch metrics agree (loss to fp tolerance, CM-derived exactly)
    assert len(h_off) == len(h_on)
    for (s0, a), (s1, b) in zip(h_off, h_on):
        assert s0 == s1
        for k in ("train_loss", "val_acc", "train_support"):
            if k in a or k in b:
                np.testing.assert_allclose(a[k], b[k], rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(t_off["test_acc"], t_on["test_acc"],
                               rtol=1e-3)

    # the trained heads are numerically the same network
    for la, lb in zip(jax.tree.leaves(m_off.head_params),
                      jax.tree.leaves(m_on.head_params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=5e-3, atol=1e-4)


def test_cache_engages_only_when_safe(voc_root):
    m = DINOSeg(data_path=voc_root, write_path="/tmp/x", n_classes=N_CLASSES,
                random_init=True, augmented=False, freeze_backbone=True,
                train_resolution=RES)
    assert m._cache_plan("auto", 10, 4) == (True, True)
    # augmented pixels change every draw -> train cache off, val cache on
    m.augmented = True
    assert m._cache_plan("auto", 10, 4) == (False, True)
    m.augmented = False
    # unfrozen backbone -> features move every step -> no caching at all
    m.freeze_backbone = False
    assert m._cache_plan("auto", 10, 4) == (False, False)
    assert m._cache_plan(True, 10, 4) == (False, False)  # True != unsafe
    m.freeze_backbone = True
    assert m._cache_plan(False, 10, 4) == (False, False)
    # HBM budget cap falls back to the recompute path
    os.environ["DINO_TPU_FEATURE_CACHE_BYTES"] = "1"
    try:
        assert m._cache_plan("auto", 10, 4) == (False, False)
    finally:
        del os.environ["DINO_TPU_FEATURE_CACHE_BYTES"]


def test_cache_plan_budget_and_empty_splits(voc_root):
    m = DINOSeg(data_path=voc_root, write_path="/tmp/x", n_classes=N_CLASSES,
                random_init=True, augmented=False, freeze_backbone=True,
                train_resolution=RES)
    # empty splits never cache (an empty cache would crash the precompute)
    assert m._cache_plan("auto", 0, 4) == (False, True)
    assert m._cache_plan("auto", 10, 0) == (True, False)
    # the budget bounds the COMBINED residency: a cap that fits either
    # dataset alone but not both drops the (larger) train cache first
    n_patches = (RES // 8) ** 2
    itemsize = 2  # default precision is bf16
    one_item = n_patches * m.mlp_input_dim * itemsize
    os.environ["DINO_TPU_FEATURE_CACHE_BYTES"] = str(12 * one_item)
    try:
        assert m._cache_plan("auto", 10, 4) == (False, True)
        os.environ["DINO_TPU_FEATURE_CACHE_BYTES"] = str(3 * one_item)
        assert m._cache_plan("auto", 10, 4) == (False, False)
    finally:
        del os.environ["DINO_TPU_FEATURE_CACHE_BYTES"]


def test_fit_with_empty_val_split(tmp_path):
    """A present-but-empty val dir must not crash the cached path
    (regression: jnp.concatenate([]) in _precompute_features)."""
    root = str(tmp_path / "voc")
    _make_split(root, "train", 6, 0)
    _make_split(root, "test", 2, 2)
    os.makedirs(os.path.join(root, "dt_real_voc_val", "JPEGImages"),
                exist_ok=True)
    m = DINOSeg(data_path=root, write_path=str(tmp_path / "w"), head="linear",
                n_blocks=1, n_classes=N_CLASSES, batch_size=3, lr=1e-3,
                freeze_backbone=True, max_epochs=1, random_init=True,
                augmented=False, train_resolution=RES, seed=0)
    metrics = m.fit(samples_per_epoch=6, cache_features="auto")
    assert 0.0 <= metrics["test_acc"] <= 1.0


def test_augmented_run_still_caches_val(voc_root, tmp_path):
    """augmented=True: train recomputes (fresh pixels every draw) but the
    val set is still served from the cache; fit stays healthy end-to-end."""
    model, history, metrics = _fit(voc_root, tmp_path, "aug", cache="auto",
                                   augmented=True, max_epochs=1)
    assert 0.0 <= metrics["test_acc"] <= 1.0
    assert any("val_acc" in m for _, m in history)
