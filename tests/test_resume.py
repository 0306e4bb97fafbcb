"""Mid-training resume: interrupt fit() after epoch 0, resume, and check the
run continues from epoch 1 with restored state."""
import os

import numpy as np
import pytest

from dino_tpu import DINOSeg
from tests.test_train_smoke import RES, _make_split


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("voc_resume"))
    _make_split(root, "train", 8, 0)
    _make_split(root, "val", 3, 1)
    _make_split(root, "test", 3, 2)
    return root


def _model(voc_root, write, max_epochs):
    return DINOSeg(data_path=voc_root, write_path=write, head="mlp",
                   n_blocks=1, n_classes=3, batch_size=4, lr=1e-3,
                   optimizer="adam", max_epochs=max_epochs, random_init=True,
                   augmented=False, train_resolution=RES, seed=0)


def test_fit_resume(voc_root, tmp_path):
    write = str(tmp_path / "w")

    # phase 1: one epoch, leaves a resume point
    m1 = _model(voc_root, write, max_epochs=1)
    m1.fit(ck_file_name="r", samples_per_epoch=16, resume=True)
    resume_path = os.path.join(write, "r.ckpt.npz.resume.npz")
    assert os.path.exists(resume_path)

    # phase 2: fresh process/model, 3 epochs total, resumes at epoch 1
    m2 = _model(voc_root, write, max_epochs=3)
    epochs_seen = []
    orig = m2._log

    def capture(metrics, step):
        epochs_seen.append(step)
        orig(metrics, step)

    m2._log = capture
    m2.fit(ck_file_name="r", samples_per_epoch=16, resume=True)
    assert [e for e in epochs_seen if e >= 0] == [1, 2]
    assert os.path.exists(resume_path)  # kept: max_epochs may be extended
