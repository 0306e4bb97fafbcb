"""Segmentation metrics from an on-device confusion matrix.

The reference concatenates every validation patch onto the host and calls
sklearn (balanced_accuracy_score / f1_score(macro) / jaccard_score(macro),
pl_torch_modules.py:310-332).  All three are pure functions of the confusion
matrix, so we accumulate a (C, C) CM on device (one psum-able array — the
distributed-metric story is a single collective) and evaluate the sklearn
formulas on the host, replicating sklearn's label-selection semantics:

  * balanced accuracy: mean recall over classes present in y_true
  * macro F1 / macro IoU: averaged over classes present in y_true OR y_pred,
    zero-division -> 0
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def confusion_matrix(pred: jnp.ndarray, gt: jnp.ndarray,
                     n_classes: int, weights: jnp.ndarray = None) -> jnp.ndarray:
    """(M,) int preds and labels -> (C, C) counts; rows = true, cols = pred.

    ``weights`` (0/1 per element) excludes padded elements from the counts.
    """
    idx = gt.astype(jnp.int32) * n_classes + pred.astype(jnp.int32)
    add = jnp.int32(1) if weights is None else weights.astype(jnp.int32)
    flat = jnp.zeros((n_classes * n_classes,), jnp.int32).at[idx].add(add)
    return flat.reshape(n_classes, n_classes)


def balanced_accuracy_from_cm(cm: np.ndarray) -> float:
    cm = np.asarray(cm, np.float64)
    support = cm.sum(axis=1)
    present = support > 0
    if not present.any():
        return 0.0
    recall = np.where(present, np.diag(cm) / np.maximum(support, 1), 0.0)
    return float(recall[present].mean())


def _macro_over_union_labels(cm: np.ndarray, score_fn) -> float:
    cm = np.asarray(cm, np.float64)
    true_sum = cm.sum(axis=1)
    pred_sum = cm.sum(axis=0)
    labels = (true_sum > 0) | (pred_sum > 0)
    if not labels.any():
        return 0.0
    tp = np.diag(cm)
    scores = score_fn(tp, true_sum, pred_sum)
    return float(scores[labels].mean())


def macro_f1_from_cm(cm: np.ndarray) -> float:
    def f1(tp, t, p):
        denom = t + p
        return np.where(denom > 0, 2 * tp / np.maximum(denom, 1e-12), 0.0)
    return _macro_over_union_labels(cm, f1)


def macro_jaccard_from_cm(cm: np.ndarray) -> float:
    def iou(tp, t, p):
        union = t + p - tp
        return np.where(union > 0, tp / np.maximum(union, 1e-12), 0.0)
    return _macro_over_union_labels(cm, iou)


def segmentation_metrics(cm: np.ndarray, prefix: str = "val") -> Dict[str, float]:
    return {
        f"{prefix}_acc": balanced_accuracy_from_cm(cm),
        f"{prefix}_F1": macro_f1_from_cm(cm),
        f"{prefix}_iou": macro_jaccard_from_cm(cm),
        # total patches counted — surfaces silently-dropped samples
        f"{prefix}_support": float(np.asarray(cm).sum()),
    }


def per_class_metrics_from_cm(cm: np.ndarray, class_names=None) -> list:
    """Per-class recall / precision / F1 / IoU / support rows from a CM.

    The per-class breakdown behind the macro numbers (the reference only
    logs the confusion matrix itself to Comet, pl_torch_modules.py:326-330);
    absent classes (no true or predicted patches) report zeros, matching the
    macro functions' zero-division semantics.
    """
    cm = np.asarray(cm, np.float64)
    n = cm.shape[0]
    names = (list(class_names) if class_names is not None
             else [str(i) for i in range(n)])
    tp = np.diag(cm)
    true_sum = cm.sum(axis=1)
    pred_sum = cm.sum(axis=0)
    rows = []
    for c in range(n):
        t, p = true_sum[c], pred_sum[c]
        recall = tp[c] / t if t > 0 else 0.0
        precision = tp[c] / p if p > 0 else 0.0
        f1 = 2 * tp[c] / (t + p) if (t + p) > 0 else 0.0
        union = t + p - tp[c]
        iou = tp[c] / union if union > 0 else 0.0
        rows.append({"class": names[c] if c < len(names) else str(c),
                     "recall": float(recall), "precision": float(precision),
                     "f1": float(f1), "iou": float(iou),
                     "support": float(t)})
    return rows
