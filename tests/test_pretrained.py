"""Pretrained-weight acquisition: search order, caching, full-pretraining
checkpoint loading (teacher key + prefix stripping)."""
import os

import numpy as np
import pytest

from dino_tpu.checkpointing.pretrained import (load_pretrained_backbone,
                                               load_pretrained_weights)

torch = pytest.importorskip("torch")


def _tiny_vit_sd(rs, prefix=""):
    d, depth = 384, 1
    sd = {
        prefix + "cls_token": rs.randn(1, 1, d),
        prefix + "pos_embed": rs.randn(1, 785, d),
        prefix + "patch_embed.proj.weight": rs.randn(d, 3, 8, 8),
        prefix + "patch_embed.proj.bias": rs.randn(d),
        prefix + "norm.weight": rs.randn(d), prefix + "norm.bias": rs.randn(d),
    }
    b = prefix + "blocks.0."
    sd[b + "norm1.weight"] = rs.randn(d); sd[b + "norm1.bias"] = rs.randn(d)
    sd[b + "norm2.weight"] = rs.randn(d); sd[b + "norm2.bias"] = rs.randn(d)
    sd[b + "attn.qkv.weight"] = rs.randn(3 * d, d)
    sd[b + "attn.qkv.bias"] = rs.randn(3 * d)
    sd[b + "attn.proj.weight"] = rs.randn(d, d)
    sd[b + "attn.proj.bias"] = rs.randn(d)
    sd[b + "mlp.fc1.weight"] = rs.randn(4 * d, d)
    sd[b + "mlp.fc1.bias"] = rs.randn(4 * d)
    sd[b + "mlp.fc2.weight"] = rs.randn(d, 4 * d)
    sd[b + "mlp.fc2.bias"] = rs.randn(d)
    return {k: torch.from_numpy(np.asarray(v, np.float32)) for k, v in
            sd.items()}


def test_load_pretrained_weights_teacher_key(tmp_path):
    rs = np.random.RandomState(0)
    ckpt = {"teacher": _tiny_vit_sd(rs, prefix="module.backbone."),
            "epoch": 300}
    path = str(tmp_path / "dino_full.pth")
    torch.save(ckpt, path)
    params = load_pretrained_weights(path, checkpoint_key="teacher")
    assert len(params["blocks"]) == 1
    assert params["patch_embed"]["kernel"].shape == (192, 384)


def test_backbone_search_order_and_cache(tmp_path, monkeypatch):
    rs = np.random.RandomState(1)
    raw = str(tmp_path / "raw.pth")
    torch.save(_tiny_vit_sd(rs), raw)
    cache_dir = str(tmp_path / "cache")
    monkeypatch.setenv("DINO_TPU_CACHE", cache_dir)
    params = load_pretrained_backbone(pretrained_path=raw)
    assert params is not None and len(params["blocks"]) == 1
    # conversion cached as npz; second load skips torch entirely
    cached = os.path.join(cache_dir, "dino_deitsmall8_300ep_pretrain.npz")
    assert os.path.exists(cached)
    params2 = load_pretrained_backbone()
    np.testing.assert_array_equal(np.asarray(params["cls_token"]),
                                  np.asarray(params2["cls_token"]))


def test_missing_returns_none(monkeypatch, tmp_path):
    monkeypatch.setenv("DINO_TPU_CACHE", str(tmp_path / "empty"))
    monkeypatch.delenv("DINO_TPU_PRETRAINED", raising=False)
    monkeypatch.setenv("HOME", str(tmp_path))  # hide any hub cache
    assert load_pretrained_backbone() is None
    with pytest.raises(FileNotFoundError):
        load_pretrained_backbone(allow_missing=False)
