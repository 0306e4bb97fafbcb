"""Driver-contract smoke: __graft_entry__.entry() traces with the example
args (no device compute — jax.eval_shape), bench module imports, and the
JSONL logger records confusion matrices during fit."""
import json
import os

import jax
import numpy as np


def test_entry_traces():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (480, 480)
    assert out.dtype == np.int32


def test_bench_importable():
    from dino_tpu.cli import bench
    assert callable(bench.main)


def test_fit_logs_confusion_matrix(tmp_path):
    from dino_tpu import DINOSeg
    from dino_tpu.utils.logging import JSONLLogger
    from tests.test_train_smoke import RES, _make_split
    root = str(tmp_path / "d")
    os.makedirs(root)
    _make_split(root, "train", 6, 0)
    _make_split(root, "val", 2, 1)
    _make_split(root, "test", 2, 2)
    log_path = str(tmp_path / "m.jsonl")
    m = DINOSeg(data_path=root, write_path=str(tmp_path / "w"), head="mlp",
                n_blocks=1, n_classes=3, batch_size=2, lr=1e-3,
                optimizer="adam", max_epochs=1, random_init=True,
                augmented=False, train_resolution=RES, seed=0,
                logger=JSONLLogger(log_path),
                class_names=("bg", "a", "b"))
    m.fit(samples_per_epoch=8)
    events = [json.loads(l) for l in open(log_path)]
    kinds = {e["event"] for e in events}
    assert {"start", "metrics", "confusion_matrix", "asset"} <= kinds
    cm = next(e for e in events if e["event"] == "confusion_matrix")
    assert np.asarray(cm["matrix"]).shape == (3, 3)
    assert cm["labels"] == ["bg", "a", "b"]
