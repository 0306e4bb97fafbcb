"""Feature post-processing + retrieval evaluation (reference utils.py parity:
PCA :654-712, compute_ap :715-746, compute_map :749-812, multi_scale :815-829).

PCA whitening runs as one eigendecomposition + a single matmul (MXU-friendly
when applied on device); AP/mAP are host-side numpy, identical semantics to
the revisited-Oxford evaluation code the reference carries.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np


class PCA:
    """PCA with optional whitening. fit on (N, D) -> apply projects to dim."""

    def __init__(self, dim: int = 256, whit: float = 0.5):
        self.dim = dim
        self.whit = whit
        self.mean: Optional[np.ndarray] = None
        self.dvt: Optional[np.ndarray] = None

    def train_pca(self, cov: np.ndarray) -> None:
        """Fit from a covariance matrix (reference keeps this entry point)."""
        d, v = np.linalg.eigh(cov.astype(np.float64))
        eps = d.max() * 1e-5
        n_0 = (d < eps).sum()
        if n_0 > 0:
            d[d < eps] = eps
        # total energy kept (informational in the reference)
        idx = np.argsort(d)[::-1][:self.dim]
        d = d[idx]
        v = v[:, idx]
        # whitened projection: D^{-whit} V^T
        self.dvt = (np.diag(1.0 / d ** self.whit) @ v.T).astype(np.float32)

    def fit(self, x: np.ndarray) -> "PCA":
        x = np.asarray(x, np.float64)
        self.mean = x.mean(axis=0).astype(np.float32)
        cov = np.cov(x.T)
        self.train_pca(cov)
        return self

    def apply(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float32)
        if self.mean is not None:
            x = x - self.mean
        return x @ self.dvt.T


def compute_ap(ranks: np.ndarray, nres: int) -> float:
    """Average precision from the positions of positive results.

    ranks: zero-based positions of positives in the ranked list; nres: number
    of positives.  Uses the trapezoidal interpolation of the reference.
    """
    nimgranks = len(ranks)
    ap = 0.0
    recall_step = 1.0 / nres
    for j in range(nimgranks):
        rank = ranks[j]
        precision_0 = 1.0 if rank == 0 else float(j) / rank
        precision_1 = float(j + 1) / (rank + 1)
        ap += (precision_0 + precision_1) * recall_step / 2.0
    return ap


def compute_map(ranks: np.ndarray, gnd: List[dict], kappas: List[int] = ()):
    """mAP + precision@k over a ranked retrieval matrix.

    ranks: (n_db, n_query) ranked db indices per query; gnd[i] holds 'ok'
    (positives) and optional 'junk' indices.  Returns (map, aps, pr, prs) —
    queries with empty ground truth contribute NaN aps and are excluded,
    matching the reference.
    """
    mAP = 0.0
    nq = len(gnd)
    aps = np.zeros(nq)
    pr = np.zeros(len(kappas))
    prs = np.zeros((nq, len(kappas)))
    nempty = 0

    for i in range(nq):
        qgnd = np.array(gnd[i]["ok"])
        if qgnd.shape[0] == 0:
            aps[i] = float("nan")
            prs[i, :] = float("nan")
            nempty += 1
            continue
        try:
            qgndj = np.array(gnd[i]["junk"])
        except KeyError:
            qgndj = np.empty(0)

        pos = np.arange(ranks.shape[0])[np.in1d(ranks[:, i], qgnd)]
        junk = np.arange(ranks.shape[0])[np.in1d(ranks[:, i], qgndj)]

        k = 0
        ij = 0
        if len(junk):
            ip = 0
            while ip < len(pos):
                while ij < len(junk) and pos[ip] > junk[ij]:
                    k += 1
                    ij += 1
                pos[ip] = pos[ip] - k
                ip += 1

        ap = compute_ap(pos, len(qgnd))
        mAP += ap
        aps[i] = ap

        for j, kappa in enumerate(kappas):
            kq = min(max(pos), kappa)
            prs[i, j] = (pos < kq).sum() / kq
        pr = pr + prs[i, :]

    mAP = mAP / (nq - nempty)
    pr = pr / (nq - nempty)
    return mAP, aps, pr, prs


def multi_scale(samples, forward_fn, scales=(1.0, 2 ** -0.5, 0.5)):
    """Average L2-normalized features over image scales
    (reference utils.py:815-829).

    samples: (B, H, W, C) array; forward_fn(batch) -> (B, D) features.
    """
    import jax.image
    import jax.numpy as jnp

    v = None
    for s in scales:
        if s == 1.0:
            inp = samples
        else:
            b, h, w, c = samples.shape
            nh, nw = int(h * s), int(w * s)
            nh -= nh % 8
            nw -= nw % 8
            inp = jax.image.resize(samples, (b, nh, nw, c), "bilinear")
        feats = forward_fn(inp).astype(jnp.float32)
        feats = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-12)
        v = feats if v is None else v + feats
    v = v / len(scales)
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)
