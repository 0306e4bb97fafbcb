"""DINOSeg public API: predict invariants, checkpoint roundtrips, PL ckpt
conversion."""
import os

import numpy as np
import pytest

from dino_tpu import DINOSeg


@pytest.fixture(scope="module")
def model():
    return DINOSeg(head="mlp", n_blocks=1, n_classes=7, random_init=True,
                   seed=0)


def test_predict_always_480(model):
    img = np.random.RandomState(0).randint(0, 255, (120, 160, 3), np.uint8)
    model.set_resolution(240)
    pred = model.predict(img)
    assert pred.shape == (480, 480)
    assert pred.dtype.kind == "i"
    assert pred.min() >= 0 and pred.max() < 7
    # 240px => 30x30 patch grid => 16x16 blocks
    assert np.all(pred[:16, :16] == pred[0, 0])

    model.set_resolution(480)
    pred480 = model.predict(img)
    assert pred480.shape == (480, 480)


def test_set_resolution_validates(model):
    with pytest.raises(ValueError):
        model.set_resolution(100)


def test_forward_shape(model):
    imgs = np.random.RandomState(1).randint(0, 255, (2, 240, 240, 3), np.uint8)
    out = np.asarray(model.forward(imgs))
    assert out.shape == (2 * 30 * 30, 7)
    np.testing.assert_allclose(np.exp(out).sum(-1), 1.0, atol=1e-4)


def test_native_checkpoint_roundtrip(tmp_path, model):
    p = str(tmp_path / "m.ckpt.npz")
    model.save(p)
    loaded = DINOSeg.load_from_checkpoint(p)
    assert loaded.n_blocks == 1 and loaded.head == "mlp"
    img = np.random.RandomState(2).randint(0, 255, (240, 240, 3), np.uint8)
    model.set_resolution(240)
    loaded.set_resolution(240)
    np.testing.assert_array_equal(model.predict(img), loaded.predict(img))


def test_pl_checkpoint_conversion(tmp_path):
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(0)

    def t(*shape):
        return torch.from_numpy(rs.randn(*shape).astype(np.float32) * 0.02)

    d, h, c = 384, 1536, 7
    sd = {
        "dino.cls_token": t(1, 1, d), "dino.pos_embed": t(1, 785, d),
        "dino.patch_embed.proj.weight": t(d, 3, 8, 8),
        "dino.patch_embed.proj.bias": t(d),
        "dino.norm.weight": t(d), "dino.norm.bias": t(d),
        "clf.layer_1.weight": t(200, d), "clf.layer_1.bias": t(200),
        "clf.layer_2.weight": t(100, 200), "clf.layer_2.bias": t(100),
        "clf.layer_3.weight": t(c, 100), "clf.layer_3.bias": t(c),
    }
    for k in ["norm1", "norm2"]:
        sd[f"dino.blocks.0.{k}.weight"] = t(d)
        sd[f"dino.blocks.0.{k}.bias"] = t(d)
    sd["dino.blocks.0.attn.qkv.weight"] = t(3 * d, d)
    sd["dino.blocks.0.attn.qkv.bias"] = t(3 * d)
    sd["dino.blocks.0.attn.proj.weight"] = t(d, d)
    sd["dino.blocks.0.attn.proj.bias"] = t(d)
    sd["dino.blocks.0.mlp.fc1.weight"] = t(h, d)
    sd["dino.blocks.0.mlp.fc1.bias"] = t(h)
    sd["dino.blocks.0.mlp.fc2.weight"] = t(d, h)
    sd["dino.blocks.0.mlp.fc2.bias"] = t(d)

    ckpt = {"state_dict": sd,
            "hyper_parameters": {"head": "mlp", "n_blocks": 1, "n_classes": c,
                                 "batch_size": 1, "lr": 1e-3,
                                 "freeze_backbone": True, "backbone": "vit",
                                 "optimizer": "Adam"}}
    path = str(tmp_path / "ref_style.ckpt")
    torch.save(ckpt, path)

    model = DINOSeg.load_from_checkpoint(path)
    assert model.n_blocks == 1 and model.n_classes == c
    assert model.optimizer == "adam"
    np.testing.assert_allclose(
        np.asarray(model.head_params["layer_1"]["kernel"]),
        sd["clf.layer_1.weight"].numpy().T, atol=1e-7)
    model.set_resolution(240)
    pred = model.predict(
        np.random.RandomState(3).randint(0, 255, (100, 100, 3), np.uint8))
    assert pred.shape == (480, 480)


def test_intermediate_layers_and_forward_mask(model):
    rs = np.random.RandomState(4)
    model.set_resolution(240)
    imgs = rs.randint(0, 255, (1, 240, 240, 3), np.uint8)
    outs = model.get_intermediate_layers(imgs, n=1)
    assert len(outs) == 1 and outs[0].shape == (1, 901, 384)

    mask = (rs.rand(3, 30, 30) > 0.5).astype(np.float32)
    emb = model.forward_mask(imgs[0], mask)
    assert emb.shape == (3, 384)
    assert np.isfinite(emb).all()


def test_mask_paths_jit_once(model):
    """The cls_mask/forward_mask hot paths (companion-agent per-frame calls,
    reference vision_transformer.py:250-271) compile ONCE per mask shape:
    repeated same-shape calls hit the cached jitted program, no retrace."""
    import jax
    rs = np.random.RandomState(5)
    model.set_resolution(240)
    img = rs.randint(0, 255, (240, 240, 3), np.uint8)
    mask = (rs.rand(3, 30, 30) > 0.5).astype(np.float32)

    emb1 = model.forward_mask(img, mask)
    fm_key = [k for k in model._jit_cache if k[0] == "fmask"]
    assert len(fm_key) == 1
    jitted = model._jit_cache[fm_key[0]]
    assert isinstance(jitted, jax.stages.Wrapped)
    n_traces = jitted._cache_size()
    emb2 = model.forward_mask(img, (rs.rand(3, 30, 30) > 0.5).astype(
        np.float32))
    assert jitted._cache_size() == n_traces      # same shape: no retrace
    assert len([k for k in model._jit_cache if k[0] == "fmask"]) == 1
    assert emb2.shape == emb1.shape

    # eager-vs-jitted numerical agreement
    from dino_tpu.api import preprocess
    from dino_tpu.models.vit import forward_mask as fm_eager
    import jax.numpy as jnp
    x = preprocess(jnp.asarray(img)[None], 240)
    ref = np.asarray(fm_eager(model.vit_params, x, jnp.asarray(mask),
                              model.cfg))
    np.testing.assert_allclose(emb1, ref, atol=1e-5, rtol=1e-5)

    # the masked attention path is jitted now too (it used to stay eager)
    att1 = model.get_last_selfattention(img[None], cls_mask=mask)
    att_key = [k for k in model._jit_cache if k[0] == "attn"
               and k[3] is not None]
    assert len(att_key) == 1
    att_jit = model._jit_cache[att_key[0]]
    assert isinstance(att_jit, jax.stages.Wrapped)
    n_traces = att_jit._cache_size()
    model.get_last_selfattention(img[None], cls_mask=mask)
    assert att_jit._cache_size() == n_traces
    assert att1.shape[0] == 1


def test_dataloader_methods(tmp_path):
    from tests.test_train_smoke import RES, _make_split
    root = str(tmp_path / "d")
    os.makedirs(root)
    _make_split(root, "train", 6, 0)
    _make_split(root, "val", 2, 1)
    _make_split(root, "test", 2, 2)
    m = DINOSeg(data_path=root, head="mlp", n_blocks=1, n_classes=3,
                batch_size=2, random_init=True, augmented=False,
                train_resolution=RES, seed=0)
    xb, yb = next(iter(m.train_dataloader(samples_per_epoch=4)))
    assert xb.shape == (2, RES, RES, 3) and xb.dtype == np.uint8
    assert yb.shape == (2, (RES // 8) ** 2)
    batches = list(m.val_dataloader())
    assert sum(b[0].shape[0] for b in batches) == 2
    assert sum(b[0].shape[0] for b in m.test_dataloader()) == 2


def test_predict_arbitrary_resolutions(model):
    """Any multiple of 8 works. Output is (480//g)*g square — exactly the
    reference's np.kron(low, ones(480//g)) semantics (pl_torch_modules.py:
    294-298): 480x480 whenever g=res/8 divides 480, slightly smaller
    otherwise (e.g. res=56 -> 476x476, same as torch)."""
    img = np.random.RandomState(7).randint(0, 255, (90, 110, 3), np.uint8)
    for res in (56, 104, 160, 240):
        model.set_resolution(res)
        pred = model.predict(img)
        g = res // 8
        side = (480 // g) * g
        assert pred.shape == (side, side)
        blk = 480 // g
        assert np.all(pred[:blk, :blk] == pred[0, 0])  # patch-constant blocks
    model.set_resolution(240)
