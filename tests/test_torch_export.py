"""JAX -> torch/PL checkpoint export (the reverse interop direction).

Checks three layers:
  * pure layout round-trip: export_vit_state_dict is the exact inverse of
    convert_vit_state_dict (bit-equal leaves);
  * end-to-end through the public API: save_torch_checkpoint ->
    load_from_checkpoint reproduces identical predictions;
  * live torch: the exported state_dict strict-loads into the reference
    VisionTransformer (/root/reference mounted read-only) and the torch
    forward matches ours.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_SRC = "/root/reference/dt_segmentation/src"


def _tree_equal(a, b, path=""):
    import jax
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x, np.float32),
                                      np.asarray(y, np.float32))


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from dino_tpu import DINOSeg
    return DINOSeg(head="mlp", n_blocks=2, n_classes=5, random_init=True,
                   seed=3, class_names=["a", "b", "c", "d", "e"],
                   lr=2e-4, optimizer="adam", batch_size=4)


def test_vit_layout_roundtrip(model):
    from dino_tpu.checkpointing.torch_convert import (convert_vit_state_dict,
                                                      export_vit_state_dict)
    import jax
    params = jax.tree.map(np.asarray, model.vit_params)
    sd = export_vit_state_dict(params, prefix="dino.")
    back = convert_vit_state_dict(sd, prefix="dino.")
    _tree_equal(params, back)


def test_head_layout_roundtrip(model):
    from dino_tpu.checkpointing.torch_convert import (convert_head_state_dict,
                                                      export_head_state_dict)
    import jax
    head = jax.tree.map(np.asarray, model.head_params)
    sd = export_head_state_dict(head, "mlp")
    back = convert_head_state_dict(sd, "mlp")
    _tree_equal(head, back)


def test_moe_head_export_rejected(model):
    from dino_tpu.checkpointing.torch_convert import export_head_state_dict
    with pytest.raises(ValueError, match="mlp/linear"):
        export_head_state_dict({}, "moe")


def test_save_then_load_from_checkpoint_identical(model, tmp_path):
    """The full public-API loop: save_torch_checkpoint -> (our)
    load_from_checkpoint gives the same params, hparams, and predictions."""
    from dino_tpu import DINOSeg
    path = str(tmp_path / "exported.ckpt")
    model.save_torch_checkpoint(path, epoch=7, global_step=123)
    loaded = DINOSeg.load_from_checkpoint(path)

    _tree_equal(model.vit_params, loaded.vit_params)
    _tree_equal(model.head_params, loaded.head_params)
    assert loaded.head == "mlp"
    assert loaded.n_blocks == 2
    assert loaded.n_classes == 5
    assert loaded.optimizer == "adam"
    assert loaded.lr == pytest.approx(2e-4)
    assert loaded.batch_size == 4

    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (120, 160, 3)).astype(np.uint8)
    model.set_resolution(240)
    loaded.set_resolution(240)
    np.testing.assert_array_equal(model.predict(img), loaded.predict(img))


def test_checkpoint_header_fields(model, tmp_path):
    path = str(tmp_path / "exported.ckpt")
    model.save_torch_checkpoint(path, epoch=7, global_step=123)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 7
    assert ckpt["global_step"] == 123
    assert ckpt["hparams_name"] == "kwargs"
    hp = ckpt["hyper_parameters"]
    # the optimizer entry is the torch class, as PL's save_hyperparameters
    # records it (reference run_experiment.py passes the class through)
    assert hp["optimizer"] is torch.optim.Adam
    assert hp["head"] == "mlp" and hp["n_blocks"] == 2
    assert hp["backbone"] == "vit" and hp["comet_logger"] is None
    # every hyper_parameter key must be accepted by the reference __init__
    ref_sig = {"data_path", "write_path", "class_names", "head", "n_blocks",
               "batch_size", "lr", "optimizer", "freeze_backbone",
               "max_epochs", "patience", "grayscale", "n_classes",
               "pretrain_on_sim", "comet_logger", "augmented", "random_init",
               "backbone"}
    assert set(hp) == ref_sig


@pytest.mark.skipif(not os.path.isdir(REF_SRC),
                    reason="reference repo not mounted")
def test_exported_state_dict_loads_into_reference_vit(model, tmp_path):
    """strict=True load into the reference VisionTransformer + forward
    parity — proof the exported file is torch-side usable, not just
    self-consistent."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_goldens import load_reference_vit
    from dino_tpu.models.vit import vit_forward

    path = str(tmp_path / "exported.ckpt")
    model.save_torch_checkpoint(path)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    dino_sd = {k[len("dino."):]: v for k, v in ckpt["state_dict"].items()
               if k.startswith("dino.")}

    vt = load_reference_vit()
    ref = vt.vit_small(patch_size=8, num_classes=0)
    ref.blocks = ref.blocks[:2]
    ref.load_state_dict(dino_sd, strict=True)
    ref.eval()

    rs = np.random.RandomState(1)
    x = rs.randn(1, 3, 240, 240).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(vit_forward(model.vit_params, x.transpose(0, 2, 3, 1),
                                 model.cfg))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


@pytest.mark.skipif(not os.path.isdir(REF_SRC),
                    reason="reference repo not mounted")
def test_exported_head_matches_torch_mlp(model, tmp_path):
    """clf.* keys drive a torch replica of the reference MLP head
    (pl_torch_modules.py:108-124) to the same log-probs."""
    import torch.nn as nn
    import torch.nn.functional as F
    from dino_tpu.models.heads import head_apply

    path = str(tmp_path / "exported.ckpt")
    model.save_torch_checkpoint(path)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)

    class TorchMLP(nn.Module):   # mirror of reference MLP (384->200->100->C)
        def __init__(self, n_classes, input_dim=384):
            super().__init__()
            self.layer_1 = nn.Linear(input_dim, 200)
            self.layer_2 = nn.Linear(200, 100)
            self.layer_3 = nn.Linear(100, n_classes)

        def forward(self, x):
            x = F.relu(self.layer_1(x))
            x = F.relu(self.layer_2(x))
            return F.log_softmax(self.layer_3(x), dim=1)

    clf = TorchMLP(5)
    clf_sd = {k[len("clf."):]: v for k, v in ckpt["state_dict"].items()
              if k.startswith("clf.")}
    clf.load_state_dict(clf_sd, strict=True)
    clf.eval()

    rs = np.random.RandomState(2)
    feats = rs.randn(64, 384).astype(np.float32)
    with torch.no_grad():
        want = clf(torch.from_numpy(feats)).numpy()
    got = np.asarray(head_apply("mlp", model.head_params, feats))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_cli_export_torch(model, tmp_path, capsys):
    """dt-export-torch: npz in, PL .ckpt out, loadable by our loader."""
    import json
    from dino_tpu import DINOSeg
    from dino_tpu.cli.export_torch import main

    npz = str(tmp_path / "native.ckpt.npz")
    model.save(npz)
    out = str(tmp_path / "exported.ckpt")
    main([npz, out, "--epoch", "3"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["output"] == out and rec["head"] == "mlp"
    loaded = DINOSeg.load_from_checkpoint(out)
    _tree_equal(model.vit_params, loaded.vit_params)


def test_cnn_backbone_export_rejected(tmp_path):
    from dino_tpu.checkpointing.torch_convert import export_pl_checkpoint
    with pytest.raises(ValueError, match="ViT backbone"):
        export_pl_checkpoint(str(tmp_path / "x.ckpt"), {}, None, "mlp",
                             hparams={"backbone": "cnn1"})


def test_sgd_optimizer_exports_and_unknown_raises(tmp_path):
    import torch as _torch
    from dino_tpu.checkpointing.torch_convert import export_pl_checkpoint
    from dino_tpu import DINOSeg
    m = DINOSeg(head="linear", n_blocks=1, n_classes=3, random_init=True,
                optimizer="sgd")
    path = str(tmp_path / "sgd.ckpt")
    m.save_torch_checkpoint(path)
    ckpt = _torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["hyper_parameters"]["optimizer"] is _torch.optim.SGD
    with pytest.raises(ValueError, match="cannot export optimizer"):
        export_pl_checkpoint(str(tmp_path / "x.ckpt"), m.vit_params,
                             m.head_params, "linear",
                             hparams={"optimizer": "lars"})
