"""Standalone evaluation surface: DINOSeg.evaluate + dt-eval CLI +
per-class metric rows (the reference computes these numbers only inside its
Lightning loops, pl_torch_modules.py:310-341)."""
import json
import os

import numpy as np
import pytest
from PIL import Image

RES = 64
N_CLASSES = 3


def _make_voc(root, n, seed):
    rs = np.random.RandomState(seed)
    jdir = os.path.join(root, "JPEGImages")
    mdir = os.path.join(root, "SegmentationClass")
    os.makedirs(jdir), os.makedirs(mdir)
    colors = np.array([[200, 40, 40], [40, 200, 40], [40, 40, 200]])
    for i in range(n):
        mask = rs.randint(0, N_CLASSES, (RES, RES)).astype(np.int64)
        img = colors[mask].astype(np.float32)
        img += rs.randn(RES, RES, 3) * 5
        img = np.clip(img, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(jdir, f"im{i}.jpg"),
                                  quality=95)
        np.save(os.path.join(mdir, f"im{i}.npy"), mask)
    return root


@pytest.fixture(scope="module")
def voc_dir(tmp_path_factory):
    return _make_voc(str(tmp_path_factory.mktemp("voc_eval")), 5, 0)


@pytest.fixture(scope="module")
def model():
    from dino_tpu import DINOSeg
    return DINOSeg(head="linear", n_blocks=1, n_classes=N_CLASSES,
                   random_init=True, seed=5, train_resolution=RES,
                   precision="fp32", class_names=["r", "g", "b"])


def test_evaluate_matches_manual(model, voc_dir):
    from dino_tpu.data.dataset import DuckieSegDataset
    from dino_tpu.train.loop import make_eval_step
    from dino_tpu.train.metrics import segmentation_metrics

    got = model.evaluate(voc_dir, batch_size=2, prefix="test")

    ds = DuckieSegDataset(voc_dir, augmented=False, resolution=RES)
    step = make_eval_step(model.cfg, "linear", N_CLASSES,
                          compute_dtype=model.compute_dtype)
    cm = np.zeros((N_CLASSES, N_CLASSES), np.int64)
    for i in range(len(ds)):
        x, y = ds[i]
        cm += np.asarray(step(model.vit_params, model.head_params,
                              x[None], y[None]))
    want = segmentation_metrics(cm, prefix="test")
    assert got == pytest.approx(want)
    n_patches = (RES // 8) ** 2
    assert got["test_support"] == 5 * n_patches


def test_per_class_rows_consistent_with_macro(model, voc_dir):
    from dino_tpu.train.metrics import (balanced_accuracy_from_cm,
                                        macro_jaccard_from_cm,
                                        per_class_metrics_from_cm)
    m = model.evaluate(voc_dir, batch_size=5, per_class=True)
    rows = m["test_per_class"]
    assert [r["class"] for r in rows] == ["r", "g", "b"]
    # reconstruct the macro numbers from the per-class rows
    present = [r for r in rows if r["support"] > 0]
    assert m["test_acc"] == pytest.approx(
        np.mean([r["recall"] for r in present]))
    # every class appears in y_true here, so macro-IoU is the plain mean
    assert m["test_iou"] == pytest.approx(np.mean([r["iou"] for r in rows]))


def test_per_class_absent_class_zeros():
    from dino_tpu.train.metrics import per_class_metrics_from_cm
    cm = np.array([[5, 0, 0], [1, 3, 0], [0, 0, 0]])  # class 2 never occurs
    rows = per_class_metrics_from_cm(cm)
    assert rows[2] == {"class": "2", "recall": 0.0, "precision": 0.0,
                       "f1": 0.0, "iou": 0.0, "support": 0.0}
    assert rows[0]["recall"] == 1.0 and rows[0]["precision"] == pytest.approx(5 / 6)


def test_cli_eval_json(model, voc_dir, tmp_path, capsys):
    from dino_tpu.cli.eval import main
    ckpt = str(tmp_path / "m.ckpt.npz")
    model.save(ckpt)
    out_json = str(tmp_path / "metrics.json")
    main([ckpt, voc_dir, "--resolution", str(RES), "--batch-size", "2",
          "--per-class", "--json", out_json])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert {"test_acc", "test_F1", "test_iou", "test_support",
            "test_per_class"} <= set(rec)
    with open(out_json) as fh:
        assert json.load(fh) == rec
    # CLI numbers == API numbers
    want = model.evaluate(voc_dir, resolution=RES, batch_size=2)
    for k in ("test_acc", "test_F1", "test_iou", "test_support"):
        assert rec[k] == pytest.approx(want[k])


def test_evaluate_empty_dir_raises(model, tmp_path):
    os.makedirs(tmp_path / "JPEGImages")
    os.makedirs(tmp_path / "SegmentationClass")
    with pytest.raises(FileNotFoundError):
        model.evaluate(str(tmp_path))


def test_evaluate_rejects_non_multiple_of_8(model, voc_dir):
    with pytest.raises(ValueError, match="multiple of 8"):
        model.evaluate(voc_dir, resolution=100)
