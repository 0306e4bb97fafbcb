"""CM-based metrics must match sklearn exactly (the reference's oracle)."""
import numpy as np
import pytest

sklearn_metrics = pytest.importorskip("sklearn.metrics")

from dino_tpu.train.metrics import (balanced_accuracy_from_cm,
                                    confusion_matrix, macro_f1_from_cm,
                                    macro_jaccard_from_cm)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n_classes,skew", [(7, False), (12, True), (3, False)])
def test_matches_sklearn(seed, n_classes, skew):
    rs = np.random.RandomState(seed)
    gt = rs.randint(0, max(2, n_classes - (3 if skew else 0)), size=5000)
    pred = np.where(rs.rand(5000) < 0.6, gt, rs.randint(0, n_classes, size=5000))
    cm = np.asarray(confusion_matrix(pred, gt, n_classes))
    assert cm.sum() == 5000

    np.testing.assert_allclose(
        balanced_accuracy_from_cm(cm),
        sklearn_metrics.balanced_accuracy_score(gt, pred), atol=1e-12)
    np.testing.assert_allclose(
        macro_f1_from_cm(cm),
        sklearn_metrics.f1_score(gt, pred, average="macro"), atol=1e-12)
    np.testing.assert_allclose(
        macro_jaccard_from_cm(cm),
        sklearn_metrics.jaccard_score(gt, pred, average="macro"), atol=1e-12)
