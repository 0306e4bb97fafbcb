"""Parity tests for the training/eval utility layer (reference utils.py +
dt_utils.py equivalents)."""
import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dino_tpu.utils.schedules import as_optax_schedule, cosine_scheduler
from dino_tpu.train.optim import (clip_gradients, get_params_groups, lars,
                                  per_param_clip)
from dino_tpu.utils.misc import accuracy, bool_flag, fix_random_seeds, get_sha
from dino_tpu.utils.retrieval import PCA, compute_ap, compute_map
from dino_tpu.utils.frames import process_attentions, transform_img
from dino_tpu.utils.meters import MetricLogger, SmoothedValue
from dino_tpu.models.dino_head import (dino_head_apply, init_dino_head,
                                       multi_crop_forward)
from dino_tpu.checkpointing.resume import (restart_from_checkpoint,
                                           save_train_state)


def test_cosine_scheduler_shape_and_endpoints():
    s = cosine_scheduler(1.0, 0.1, epochs=10, niter_per_ep=50,
                         warmup_epochs=2, start_warmup_value=0.0)
    assert len(s) == 500
    assert s[0] == 0.0
    np.testing.assert_allclose(s[100], 1.0, atol=1e-6)  # end of warmup
    assert s[-1] >= 0.1 and s[-1] < 0.11  # cosine floor
    fn = as_optax_schedule(s)
    np.testing.assert_allclose(float(fn(100)), s[100], rtol=1e-6)
    np.testing.assert_allclose(float(fn(10_000)), s[-1], rtol=1e-6)


def test_clip_gradients_per_param():
    grads = {"a": jnp.ones((10,)) * 3.0, "b": jnp.ones((4,)) * 0.01}
    clipped, norms = clip_gradients(grads, clip=1.0)
    # ||a|| = 3*sqrt(10) > 1 -> rescaled to unit norm; b untouched
    np.testing.assert_allclose(np.linalg.norm(clipped["a"]), 1.0, rtol=1e-4)
    np.testing.assert_allclose(clipped["b"], grads["b"], rtol=1e-6)
    t = per_param_clip(1.0)
    u, _ = t.update(grads, t.init(grads))
    np.testing.assert_allclose(u["a"], clipped["a"], rtol=1e-6)


def test_lars_step():
    params = {"w": jnp.ones((8, 8)), "b": jnp.zeros((8,))}
    grads = {"w": jnp.ones((8, 8)) * 0.1, "b": jnp.ones((8,))}
    opt = lars(0.1, momentum=0.9, weight_decay=1e-4)
    state = opt.init(params)
    updates, state = opt.update(grads, state, params)
    assert updates["w"].shape == (8, 8)
    # bias path is plain SGD: -lr * g
    np.testing.assert_allclose(updates["b"], -0.1 * np.ones(8), rtol=1e-5)
    # trust ratio applied to the matrix
    assert np.all(np.asarray(updates["w"]) < 0)


def test_get_params_groups():
    params = {"w": jnp.ones((3, 3)), "b": jnp.ones((3,))}
    reg, not_reg = get_params_groups(params)
    assert reg == {"w": True, "b": False}
    assert not_reg == {"w": False, "b": True}


def test_accuracy_topk():
    logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.15, 0.05], [0.2, 0.3, 0.5]])
    target = np.array([1, 1, 2])
    top1, top2 = accuracy(logits, target, topk=(1, 2))
    np.testing.assert_allclose(top1, 100 * 2 / 3, rtol=1e-6)
    np.testing.assert_allclose(top2, 100.0, rtol=1e-6)


def test_misc_helpers():
    key = fix_random_seeds(3)
    assert key.shape == (2,)
    assert "sha:" in get_sha()
    assert bool_flag("true") and not bool_flag("off")
    with pytest.raises(argparse.ArgumentTypeError):
        bool_flag("maybe")


def test_pca_whitening():
    rs = np.random.RandomState(0)
    x = rs.randn(500, 16) @ rs.randn(16, 16)  # correlated features
    pca = PCA(dim=8, whit=0.5).fit(x)
    y = pca.apply(x)
    assert y.shape == (500, 8)
    cov = np.cov(y.T)
    np.testing.assert_allclose(cov, np.eye(8) * cov[0, 0], atol=0.2 * cov[0, 0])


def test_compute_ap_and_map():
    # perfect ranking: positives at ranks 0,1 -> AP 1.0
    np.testing.assert_allclose(compute_ap(np.array([0, 1]), 2), 1.0)
    # positive at rank 1: trapezoid of precision-before (0/1) and after (1/2)
    np.testing.assert_allclose(compute_ap(np.array([1]), 1), 0.25)
    ranks = np.array([[0, 1], [1, 0], [2, 2]])  # (n_db, n_query)
    gnd = [{"ok": [0], "junk": []}, {"ok": [1], "junk": []}]
    m, aps, _, _ = compute_map(ranks, gnd, kappas=[1])
    assert 0.0 <= m <= 1.0 and len(aps) == 2


def test_transform_img_and_process_attentions():
    img = np.random.RandomState(0).randint(0, 255, (100, 160, 3), np.uint8)
    t = transform_img(img, resolution=480)
    assert t.shape == (1, 480, 480, 3)
    # ImageNet normalization applied
    assert float(jnp.abs(t).max()) < 4.0
    g = transform_img(img, grayscale=True, resolution=480)
    assert float(g.min()) >= 0.0 and float(g.max()) <= 1.0

    attn = np.random.RandomState(1).rand(1, 6, 3601, 3601).astype(np.float32)
    attn /= attn.sum(-1, keepdims=True)
    maps = process_attentions(attn, threshold=None)
    assert maps.shape == (6, 60, 60)
    th = process_attentions(attn, threshold=0.6)
    assert th.shape == (6, 60, 60)
    assert set(np.unique(th)) <= {0.0, 1.0}
    # thresholded mass should be >= 0.6 of each head's CLS attention
    cls = attn[0, :, 0, 1:].reshape(6, -1)
    kept = (th.reshape(6, -1) * (cls / cls.sum(1, keepdims=True))).sum(1)
    assert np.all(kept >= 0.59)


def test_meters():
    sv = SmoothedValue(window_size=3)
    for v in [1.0, 2.0, 3.0, 4.0]:
        sv.update(v)
    assert sv.median == 3.0 and sv.global_avg == 2.5 and sv.max == 4.0
    ml = MetricLogger()
    ml.update(loss=1.0)
    ml.update(loss=3.0)
    assert ml.loss.global_avg == 2.0
    out = list(ml.log_every(range(5), print_freq=10, header="t"))
    assert out == list(range(5))


def test_dino_head_and_multicrop():
    p = init_dino_head(jax.random.PRNGKey(0), in_dim=384, out_dim=128)
    x = jax.random.normal(jax.random.PRNGKey(1), (10, 384))
    out = dino_head_apply(p, x)
    assert out.shape == (10, 128)
    # weight-normed last layer: columns of effective W have unit norm * g=1,
    # and inputs are L2-normalized => outputs bounded by 1
    assert float(jnp.abs(out).max()) <= 1.0 + 1e-4

    calls = []

    def backbone(batch):
        calls.append(batch.shape)
        return jnp.ones((batch.shape[0], 384))

    crops = [jnp.zeros((1, 224, 224, 3))] * 2 + [jnp.zeros((1, 96, 96, 3))] * 3
    out = multi_crop_forward(backbone, lambda f: dino_head_apply(p, f), crops)
    assert out.shape == (5, 128)
    assert calls == [(2, 224, 224, 3), (3, 96, 96, 3)]  # grouped by res


def test_train_state_resume_roundtrip(tmp_path):
    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
             "opt": [np.float32(1.0), {"m": np.zeros(3, np.float32)}]}
    path = str(tmp_path / "resume.npz")
    save_train_state(path, state, run_variables={"epoch": 7, "best": 0.5})
    run_vars = {"epoch": 0, "best": -1.0}
    restored = restart_from_checkpoint(path, run_vars,
                                       params=None, opt=None)
    assert run_vars == {"epoch": 7, "best": 0.5}
    np.testing.assert_array_equal(restored["params"]["w"],
                                  state["params"]["w"])
    np.testing.assert_array_equal(restored["opt"][1]["m"], np.zeros(3))


def test_drop_path():
    from dino_tpu.models.vit import drop_path
    x = jnp.ones((100, 4, 8))
    y = drop_path(x, 0.5, jax.random.PRNGKey(0))
    kept = np.asarray(y[:, 0, 0])
    assert set(np.round(np.unique(kept), 4)) <= {0.0, 2.0}  # 1/keep scaling
    assert 20 < (kept > 0).sum() < 80


def test_dropout_and_train_mode_block():
    from dino_tpu.models.vit import (ViTConfig, block_apply, dropout,
                                     init_block_params)
    x = jnp.ones((1000, 8))
    y = np.asarray(dropout(x, 0.25, jax.random.PRNGKey(0)))
    assert set(np.round(np.unique(y), 4)) <= {0.0, np.float32(1 / 0.75).round(4)}
    assert 0.2 < (y == 0).mean() < 0.3

    cfg = ViTConfig(embed_dim=64, num_heads=2, drop_rate=0.3,
                    attn_drop_rate=0.2)
    p = init_block_params(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.normal(jax.random.PRNGKey(1), (2, 17, 64))
    det1, _ = block_apply(p, tokens, cfg)              # rng-free: no dropout
    det2, _ = block_apply(p, tokens, cfg)
    np.testing.assert_array_equal(np.asarray(det1), np.asarray(det2))
    tr1, _ = block_apply(p, tokens, cfg, rng=jax.random.PRNGKey(2))
    tr2, _ = block_apply(p, tokens, cfg, rng=jax.random.PRNGKey(3))
    assert not np.allclose(np.asarray(tr1), np.asarray(tr2))
    assert not np.allclose(np.asarray(tr1), np.asarray(det1))
