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


def _tiny_resnet_sd(rs):
    def bn(p, c):
        return {p + ".weight": rs.randn(c), p + ".bias": rs.randn(c),
                p + ".running_mean": rs.randn(c),
                p + ".running_var": np.abs(rs.randn(c)) + 0.5}

    sd = {"conv1.weight": rs.randn(64, 3, 7, 7), **bn("bn1", 64)}
    for name, blocks, cin, mid, cout in [("layer1", 3, 64, 64, 256),
                                         ("layer2", 4, 256, 128, 512)]:
        for b in range(blocks):
            p = f"{name}.{b}."
            i = cin if b == 0 else cout
            sd.update({p + "conv1.weight": rs.randn(mid, i, 1, 1),
                       **bn(p + "bn1", mid),
                       p + "conv2.weight": rs.randn(mid, mid, 3, 3),
                       **bn(p + "bn2", mid),
                       p + "conv3.weight": rs.randn(cout, mid, 1, 1),
                       **bn(p + "bn3", cout)})
            if b == 0:
                sd[p + "downsample.0.weight"] = rs.randn(cout, i, 1, 1)
                sd.update(bn(p + "downsample.1", cout))
    return {k: torch.from_numpy(np.asarray(v, np.float32))
            for k, v in sd.items()}


def test_resnet_ladder_hub_cache_then_npz(tmp_path, monkeypatch):
    from dino_tpu.checkpointing.pretrained import load_pretrained_resnet
    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.setenv("DINO_TPU_CACHE", str(tmp_path / "cache"))
    monkeypatch.delenv("DINO_TPU_PRETRAINED_RESNET", raising=False)
    assert load_pretrained_resnet("cnn1") is None

    hub = tmp_path / ".cache" / "torch" / "hub" / "checkpoints"
    hub.mkdir(parents=True)
    torch.save(_tiny_resnet_sd(np.random.RandomState(2)),
               str(hub / "dino_resnet50_pretrain.pth"))
    params = load_pretrained_resnet("cnn1")
    assert params is not None and len(params["layers"]) == 2
    assert len(params["layers"][1]) == 4
    # converted npz cached per variant; works with the torch artifact gone
    assert os.path.exists(
        str(tmp_path / "cache" / "dino_resnet50_pretrain_cnn1.npz"))
    os.remove(str(hub / "dino_resnet50_pretrain.pth"))
    params2 = load_pretrained_resnet("cnn1")
    np.testing.assert_array_equal(
        np.asarray(params["layers"][0][0]["conv1"]),
        np.asarray(params2["layers"][0][0]["conv1"]))

    # DINOSeg(backbone='cnn1') picks the cached weights up end-to-end
    from dino_tpu import DINOSeg
    m = DINOSeg(backbone="cnn1", n_classes=3, head="linear")
    np.testing.assert_array_equal(
        np.asarray(m.vit_params["layers"][0][0]["conv1"]),
        np.asarray(params["layers"][0][0]["conv1"]))


def test_missing_returns_none(monkeypatch, tmp_path):
    monkeypatch.setenv("DINO_TPU_CACHE", str(tmp_path / "empty"))
    monkeypatch.delenv("DINO_TPU_PRETRAINED", raising=False)
    monkeypatch.setenv("HOME", str(tmp_path))  # hide any hub cache
    assert load_pretrained_backbone() is None
    with pytest.raises(FileNotFoundError):
        load_pretrained_backbone(allow_missing=False)
