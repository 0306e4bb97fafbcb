"""End-to-end training smoke test on synthetic VOC-style data (CPU, tiny res).

Builds a 3-class color-band dataset the head can actually learn, runs fit()
(frozen backbone) for a few epochs, and checks loss decreases, the best
checkpoint is written/loadable, and the finetune (unfrozen) step runs.
"""
import os

import jax

import numpy as np
import pytest
from PIL import Image

from dino_tpu import DINOSeg
from dino_tpu.data.dataset import DuckieSegDataset

RES = 64
N_CLASSES = 3


def _make_split(root, split, n, seed):
    rs = np.random.RandomState(seed)
    jdir = os.path.join(root, f"dt_real_voc_{split}", "JPEGImages")
    mdir = os.path.join(root, f"dt_real_voc_{split}", "SegmentationClass")
    os.makedirs(jdir), os.makedirs(mdir)
    colors = np.array([[200, 40, 40], [40, 200, 40], [40, 40, 200]])
    for i in range(n):
        mask = np.zeros((RES, RES), np.int64)
        img = np.zeros((RES, RES, 3), np.float32)
        splits = sorted(rs.randint(8, RES - 8, size=2))
        bounds = [0, splits[0], splits[1], RES]
        order = rs.permutation(3)
        for b in range(3):
            cls = int(order[b])
            sl = slice(bounds[b], bounds[b + 1])
            mask[:, sl] = cls
            img[:, sl] = colors[cls]
        img += rs.randn(RES, RES, 3) * 10
        img = np.clip(img, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(jdir, f"im{i}.jpg"),
                                  quality=95)
        np.save(os.path.join(mdir, f"im{i}.npy"), mask)


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("voc"))
    _make_split(root, "train", 12, 0)
    _make_split(root, "val", 4, 1)
    _make_split(root, "test", 4, 2)
    return root


def test_dataset_shapes(voc_root):
    ds = DuckieSegDataset(os.path.join(voc_root, "dt_real_voc_train"),
                          augmented=False, resolution=RES)
    assert len(ds) == 12
    img, mask = ds[0]
    assert img.shape == (RES, RES, 3) and img.dtype == np.uint8
    assert mask.shape == ((RES // 8) ** 2,)


def test_dataset_augmented(voc_root):
    ds = DuckieSegDataset(os.path.join(voc_root, "dt_real_voc_train"),
                          augmented=True, resolution=RES)
    rng = np.random.default_rng(0)
    img, mask = ds.get(0, rng)
    assert img.shape == (RES, RES, 3)
    assert set(np.unique(mask)) <= {0, 1, 2}


def test_fit_frozen_then_finetune(voc_root, tmp_path):
    write = str(tmp_path / "results")
    model = DINOSeg(data_path=voc_root, write_path=write, head="mlp",
                    n_blocks=1, n_classes=N_CLASSES, batch_size=4, lr=1e-3,
                    optimizer="adam", freeze_backbone=True, max_epochs=3,
                    random_init=True, augmented=False, train_resolution=RES,
                    seed=0)

    losses = []
    orig_log = model._log

    def capture(metrics, step):
        if "train_loss" in metrics:
            losses.append(metrics["train_loss"])
        orig_log(metrics, step)

    model._log = capture
    metrics = model.fit(samples_per_epoch=48)

    assert losses and losses[-1] < losses[0], losses
    assert model.best_ck and os.path.exists(model.best_ck)
    assert 0.0 <= metrics["test_acc"] <= 1.0

    # reload best, predict invariant holds
    loaded = DINOSeg.load_from_checkpoint(model.best_ck)
    img = np.random.RandomState(0).randint(0, 255, (RES, RES, 3), np.uint8)
    loaded.set_resolution(240)
    assert loaded.predict(img).shape == (480, 480)

    # finetune phase (reference run_experiment.py:101-124): unfreeze + refit
    loaded.unfreeze_bb()
    loaded.train_resolution = RES
    loaded.max_epochs = 1
    loaded.write_path = write
    ft = loaded.fit(ck_file_name="smoke_finetuned", samples_per_epoch=16)
    assert os.path.exists(os.path.join(write, "smoke_finetuned.ckpt.npz"))
    assert 0.0 <= ft["test_acc"] <= 1.0


def test_fit_sp_parallelism_matches_plain(voc_root, tmp_path):
    """fit(parallelism='sp'): unfrozen training through the ring (token axis
    over the 8-device mesh) reproduces the plain fit — same epoch metrics to
    fp32 tolerance, same checkpoint semantics (VERDICT r2 story: 960px
    finetuning across chips, exercised here at test scale)."""
    def run(parallelism, tag):
        model = DINOSeg(data_path=voc_root,
                        write_path=str(tmp_path / f"sp_{tag}"),
                        head="mlp", n_blocks=1, n_classes=N_CLASSES,
                        batch_size=4, lr=1e-3, optimizer="adam",
                        freeze_backbone=False, max_epochs=1,
                        random_init=True, augmented=False,
                        train_resolution=RES, seed=0, precision="fp32")
        captured = {}
        orig = model._log
        model._log = lambda m, step: (captured.update(m), orig(m, step))[1]
        metrics = model.fit(ck_file_name=f"sp_{tag}", samples_per_epoch=10,
                            parallelism=parallelism)
        return model, captured, metrics

    _, cap_sp, m_sp = run("sp", "ring")
    _, cap_plain, m_plain = run(None, "plain")
    np.testing.assert_allclose(cap_sp["train_loss"], cap_plain["train_loss"],
                               rtol=1e-4)
    # ragged-tail masking identical: same support count
    assert cap_sp["train_support"] == cap_plain["train_support"]
    np.testing.assert_allclose(m_sp["test_acc"], m_plain["test_acc"],
                               atol=1e-6)

    mdl = DINOSeg(data_path=voc_root, write_path=str(tmp_path / "g"),
                  head="mlp", n_blocks=1, n_classes=N_CLASSES,
                  random_init=True, freeze_backbone=True, seed=0)
    with pytest.raises(ValueError, match="unfrozen"):
        mdl.fit(parallelism="sp")


@pytest.mark.parametrize("schedule,stages,chunks",
                         [("1f1b", 4, 2), ("interleaved_1f1b", 2, 2)])
def test_fit_pp_parallelism_matches_plain(voc_root, tmp_path, schedule,
                                          stages, chunks):
    """fit(parallelism='pp'): unfrozen training through the production
    1F1B pipeline schedules (contiguous and interleaved placements), block
    weights + moments stage-sharded across the fit — reproduces the plain
    fit's loss, train metrics, and test metrics, INCLUDING a ragged
    samples_per_epoch (10 % 4 != 0: the tail batch pads-and-masks through
    the pipelined step exactly like the plain path — round 5; the
    reference trains on partial batches, pl_torch_modules.py:354)."""
    depth = 4

    def run(parallelism, tag):
        model = DINOSeg(data_path=voc_root,
                        write_path=str(tmp_path / f"pp_{tag}"),
                        head="mlp", n_blocks=depth, n_classes=N_CLASSES,
                        batch_size=4, lr=1e-3, optimizer="adam",
                        freeze_backbone=False, max_epochs=1,
                        random_init=True, augmented=False,
                        train_resolution=RES, seed=0, precision="fp32")
        captured = {}
        orig = model._log
        model._log = lambda m, step: (captured.update(m), orig(m, step))[1]
        metrics = model.fit(ck_file_name=f"pp_{tag}", samples_per_epoch=10,
                            parallelism=parallelism, pp_schedule=schedule,
                            pp_microbatches=2, pp_chunks=chunks,
                            pp_stages=stages, cache_features=False)
        return model, captured, metrics

    m_pp_model, cap_pp, m_pp = run("pp", f"pipe_{schedule}")
    m_pl_model, cap_plain, m_plain = run(None, f"plain_{schedule}")
    np.testing.assert_allclose(cap_pp["train_loss"], cap_plain["train_loss"],
                               rtol=1e-4)
    # per-epoch train metrics come from the last stage's psum'd CM and
    # match the plain step's exactly (round 5: PP is no longer loss-only)
    assert cap_pp["train_support"] == 10 * (RES // 8) ** 2  # pads excluded
    for k in ("train_acc", "train_F1", "train_iou", "train_support"):
        np.testing.assert_allclose(cap_pp[k], cap_plain[k], atol=1e-6,
                                   err_msg=k)
    np.testing.assert_allclose(m_pp["test_acc"], m_plain["test_acc"],
                               atol=1e-6)
    # the unstacked end-of-fit backbone equals the plain fit's
    for a, b in zip(jax.tree.leaves(m_pp_model.vit_params),
                    jax.tree.leaves(m_pl_model.vit_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)

    mdl = DINOSeg(data_path=voc_root, write_path=str(tmp_path / "gpp"),
                  head="mlp", n_blocks=depth, n_classes=N_CLASSES,
                  random_init=True, freeze_backbone=True, seed=0)
    with pytest.raises(ValueError, match="UNFROZEN"):
        mdl.fit(parallelism="pp")


def test_fit_pp_resume(voc_root, tmp_path):
    """fit(parallelism='pp', resume=True): the epoch-end save carries the
    PP-layout optimizer moments and the standard-layout params; the
    resumed run restacks the stage-sharded state and matches the
    uninterrupted 2-epoch run."""
    kw = dict(data_path=voc_root, write_path=str(tmp_path / "ppr"),
              head="mlp", n_blocks=4, n_classes=N_CLASSES, batch_size=4,
              lr=1e-3, optimizer="adam", freeze_backbone=False,
              random_init=True, augmented=False, train_resolution=RES,
              seed=0, precision="fp32")
    pp = dict(parallelism="pp", pp_microbatches=2, pp_stages=4,
              cache_features=False, samples_per_epoch=8,
              ck_file_name="ppr")
    DINOSeg(max_epochs=1, **kw).fit(resume=True, **pp)
    m_res = DINOSeg(max_epochs=2, **kw)
    m_res.fit(resume=True, **pp)
    kw2 = dict(kw, write_path=str(tmp_path / "ppu"))
    m_unint = DINOSeg(max_epochs=2, **kw2)
    m_unint.fit(resume=False, **dict(pp, ck_file_name="ppu"))
    for a, b in zip(jax.tree.leaves(m_res.vit_params),
                    jax.tree.leaves(m_unint.vit_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)


def test_ragged_tail_batch_trains_every_sample(voc_root, tmp_path):
    """samples_per_epoch % batch_size != 0: the padded tail batch still trains
    and its real samples land in the train CM (reference keeps partial
    batches, pl_torch_modules.py:354)."""
    model = DINOSeg(data_path=voc_root, write_path=str(tmp_path / "r"),
                    head="linear", n_blocks=1, n_classes=N_CLASSES,
                    batch_size=4, lr=1e-3, optimizer="adam",
                    freeze_backbone=True, max_epochs=1, random_init=True,
                    augmented=False, train_resolution=RES, seed=0)
    seen = {}
    orig_log = model._log

    def capture(metrics, step):
        seen.update(metrics)
        orig_log(metrics, step)

    model._log = capture
    model.fit(samples_per_epoch=10)  # 2 full batches + ragged tail of 2
    # train CM counted exactly 10 * n_patches entries => the 2 tail samples
    # trained and the 2 padding copies were masked out
    assert seen.get("train_support") == 10 * (RES // 8) ** 2


def test_nll_and_cm_masking():
    """Padded samples contribute nothing to loss, gradient, or CM."""
    import jax
    import jax.numpy as jnp
    from dino_tpu.train.loop import nll_loss
    from dino_tpu.train.metrics import confusion_matrix

    logp = jnp.log(jnp.full((6, 3), 1 / 3.0))
    logp = logp.at[3:].set(jnp.log(jnp.array([0.98, 0.01, 0.01])))
    y = jnp.array([0, 1, 2, 0, 0, 0])
    w = jnp.array([1.0, 1.0, 1.0, 0.0, 0.0, 0.0])
    # masked loss only sees the uniform rows
    np.testing.assert_allclose(float(nll_loss(logp, y, w)),
                               float(-np.log(1 / 3.0)), rtol=1e-6)
    cm = np.asarray(confusion_matrix(jnp.argmax(logp, -1), y, 3, weights=w))
    assert cm.sum() == 3  # padding rows not counted
    # gradient wrt padded rows is exactly zero
    g = jax.grad(lambda lp: nll_loss(lp, y, w))(logp)
    assert np.all(np.asarray(g)[3:] == 0)


def test_augment_deterministic_under_seed(voc_root):
    """Same rng seed => identical augmented sample (resume determinism)."""
    ds = DuckieSegDataset(os.path.join(voc_root, "dt_real_voc_train"),
                          augmented=True, resolution=RES)
    a_img, a_mask = ds.get(0, np.random.default_rng(123))
    b_img, b_mask = ds.get(0, np.random.default_rng(123))
    np.testing.assert_array_equal(a_img, b_img)
    np.testing.assert_array_equal(a_mask, b_mask)
    c_img, _ = ds.get(0, np.random.default_rng(124))
    assert not np.array_equal(a_img, c_img)


def test_accum_steps_matches_monolithic():
    """make_train_step(accum_steps=K) — microbatch scan with sum/weight
    bookkeeping — equals the monolithic step: same loss, CM, params,
    including a ragged-tail mask that makes the microbatch weight totals
    unequal (the case mean-of-means would get wrong)."""
    import jax
    import jax.numpy as jnp
    import optax
    from dino_tpu.models.heads import init_head
    from dino_tpu.models.vit import ViTConfig, init_vit_params
    from dino_tpu.train.loop import (init_opt_state, make_train_step)

    cfg = ViTConfig(patch_size=8, embed_dim=64, num_heads=2)
    n_classes = 3
    vit_p = init_vit_params(jax.random.PRNGKey(0), cfg, depth=2)
    head_p = init_head(jax.random.PRNGKey(1), "mlp", n_classes, 64)
    rs = np.random.RandomState(0)
    images = rs.randint(0, 255, (4, 48, 48, 3)).astype(np.uint8)
    labels = rs.randint(0, n_classes, (4, 36)).astype(np.int32)
    mask = np.array([1.0, 1.0, 1.0, 0.0], np.float32)  # ragged tail

    opt = optax.adam(1e-3)
    for frozen in (True, False):
        ref = make_train_step(cfg, "mlp", n_classes, opt, frozen,
                              donate=False)(
            vit_p, head_p, init_opt_state(opt, vit_p, head_p, frozen),
            images, labels, mask)
        for k in (2, 4):
            got = make_train_step(cfg, "mlp", n_classes, opt, frozen,
                                  donate=False, accum_steps=k)(
                vit_p, head_p, init_opt_state(opt, vit_p, head_p, frozen),
                images, labels, mask)
            np.testing.assert_allclose(float(got[3]), float(ref[3]),
                                       rtol=1e-5)  # loss
            np.testing.assert_array_equal(np.asarray(got[4]),
                                          np.asarray(ref[4]))  # CM
            for a, b in zip(jax.tree.leaves(got[0]), jax.tree.leaves(ref[0])):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-5, rtol=1e-4)
            for a, b in zip(jax.tree.leaves(got[1]), jax.tree.leaves(ref[1])):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-5, rtol=1e-4)


def test_accum_steps_rejects_inexact_combos():
    import optax
    import pytest as _pytest
    from dino_tpu.models.vit import ViTConfig
    from dino_tpu.train.loop import make_train_step

    cfg = ViTConfig(patch_size=8, embed_dim=64, num_heads=2)
    opt = optax.adam(1e-3)
    # round 5: dense MoE now composes exactly with accum (two-pass stats,
    # tests/test_moe.py); only the sparse dispatch remains inexact (its
    # capacity slots would allocate per microbatch)
    make_train_step(cfg, "moe", 3, opt, True, accum_steps=2)
    with _pytest.raises(ValueError, match="capacity semantics"):
        make_train_step(cfg, "moe", 3, opt, True, accum_steps=2,
                        moe_dispatch="sparse")
    with _pytest.raises(ValueError, match="BatchNorm"):
        make_train_step(cfg, "mlp", 3, opt, True, backbone="cnn1",
                        accum_steps=2)
    # call-time: the batch must divide by K (clear error instead of a
    # cryptic XLA reshape failure — covers callers that skip fit()'s check)
    from dino_tpu.models.vit import init_vit_params
    from dino_tpu.models.heads import init_head
    from dino_tpu.train.loop import init_opt_state
    vit_p = init_vit_params(jax.random.PRNGKey(0), cfg, depth=1)
    head_p = init_head(jax.random.PRNGKey(1), "mlp", 3, 64)
    step = make_train_step(cfg, "mlp", 3, opt, freeze_backbone=False,
                           donate=False, accum_steps=3)
    imgs = np.zeros((8, RES, RES, 3), np.uint8)
    labs = np.zeros((8, (RES // 8) ** 2), np.int32)
    with _pytest.raises(ValueError, match="divide"):
        step(vit_p, head_p, init_opt_state(opt, vit_p, head_p, False),
             imgs, labs)


def test_dino_accum_rejects_inexact_batch():
    """make_dino_train_step: batch not divisible by accum_steps raises a
    clear ValueError at call time (e.g. tools/pretrain_ablation.py misuse)."""
    import optax
    import pytest as _pytest
    import jax.numpy as jnp
    from dino_tpu.models.vit import ViTConfig
    from dino_tpu.train.dino_pretrain import (DinoConfig, init_dino_params,
                                              init_dino_opt_state,
                                              make_dino_train_step)

    cfg = ViTConfig(patch_size=8, embed_dim=64, num_heads=2)
    dcfg = DinoConfig(out_dim=32, n_local_crops=2, global_size=32,
                      local_size=16, hidden_dim=64, bottleneck_dim=16)
    student, teacher = init_dino_params(jax.random.PRNGKey(0), cfg, dcfg,
                                        depth=1)
    opt = optax.adamw(3e-4)
    opt_state = init_dino_opt_state(opt, student)
    step = make_dino_train_step(cfg, dcfg, opt, accum_steps=3)
    center = jnp.zeros((1, dcfg.out_dim), jnp.float32)
    g = np.zeros((2, 4, 32, 32, 3), np.float32)
    l = np.zeros((2, 4, 16, 16, 3), np.float32)
    with _pytest.raises(ValueError, match="divide"):
        step(student, teacher, center, opt_state, g, l, 0.04, 0.996, 0.0)


def test_fit_accum_ignored_on_frozen_cache_path(voc_root, tmp_path):
    """fit(accum_steps>1) on a frozen MoE model must not trip the MoE
    accumulation guard: the feature-cache path (which ignores accum_steps,
    as documented) does the actual training."""
    m = DINOSeg(write_path=str(tmp_path), data_path=voc_root,
                class_names=[f"c{i}" for i in range(3)], head="moe",
                n_blocks=1, batch_size=4, lr=1e-3, max_epochs=1, patience=5,
                n_classes=N_CLASSES, random_init=True, augmented=False,
                train_resolution=RES, seed=0, freeze_backbone=True)
    r = m.fit(samples_per_epoch=8, seed=0, accum_steps=4)
    assert 0.0 <= r["test_acc"] <= 1.0


def test_fit_accum_steps_matches_plain(voc_root, tmp_path):
    """fit(accum_steps=2) trains to the same epoch metrics as the plain fit
    (same seed, augmented=False so pixels are identical)."""
    kw = dict(data_path=voc_root, class_names=[f"c{i}" for i in range(3)],
              head="linear", n_blocks=1, batch_size=4, lr=1e-3,
              max_epochs=2, patience=5, n_classes=N_CLASSES,
              random_init=True, augmented=False, train_resolution=RES,
              seed=0, precision="fp32", freeze_backbone=False)
    a = DINOSeg(write_path=str(tmp_path / "a"), **kw)
    ra = a.fit(samples_per_epoch=8, seed=0)
    b = DINOSeg(write_path=str(tmp_path / "b"), **kw)
    rb = b.fit(samples_per_epoch=8, seed=0, accum_steps=2)
    assert abs(ra["test_acc"] - rb["test_acc"]) < 1e-4


def test_fit_zero_sharding_matches_plain(voc_root, tmp_path):
    """fit(zero=True): ZeRO-1 moments sharded over the data axis, same
    training outcome as the plain DP fit."""
    kw = dict(data_path=voc_root, class_names=[f"c{i}" for i in range(3)],
              head="linear", n_blocks=1, batch_size=8, lr=1e-3,
              max_epochs=1, patience=5, n_classes=N_CLASSES,
              random_init=True, augmented=False, train_resolution=RES,
              seed=0, precision="fp32", freeze_backbone=False)
    a = DINOSeg(write_path=str(tmp_path / "a"), **kw)
    ra = a.fit(samples_per_epoch=8, seed=0)
    b = DINOSeg(write_path=str(tmp_path / "b"), **kw)
    rb = b.fit(samples_per_epoch=8, seed=0, zero=True)
    assert abs(ra["test_acc"] - rb["test_acc"]) < 1e-4


def test_fit_zero_composes_with_accum(voc_root, tmp_path):
    """fit(zero=True, accum_steps=2): microbatch accumulation under ZeRO-1
    moment sharding — the two levers compose and reproduce the plain fit."""
    kw = dict(data_path=voc_root, class_names=[f"c{i}" for i in range(3)],
              head="linear", n_blocks=1, batch_size=16, lr=1e-3,
              max_epochs=1, patience=5, n_classes=N_CLASSES,
              random_init=True, augmented=False, train_resolution=RES,
              seed=0, precision="fp32", freeze_backbone=False)
    a = DINOSeg(write_path=str(tmp_path / "a"), **kw)
    ra = a.fit(samples_per_epoch=16, seed=0)
    b = DINOSeg(write_path=str(tmp_path / "b"), **kw)
    rb = b.fit(samples_per_epoch=16, seed=0, zero=True, accum_steps=2)
    assert abs(ra["test_acc"] - rb["test_acc"]) < 1e-4
    for ka, kb in zip(jax.tree.leaves(a.head_params),
                      jax.tree.leaves(b.head_params)):
        np.testing.assert_allclose(np.asarray(ka), np.asarray(kb),
                                   atol=2e-5, rtol=1e-4)


def test_fit_fsdp_matches_plain(voc_root, tmp_path):
    """fit(fsdp=True): the whole train state (params+grads+moments) stored
    1/N per device — same training outcome as the plain DP fit, and the
    guards reject the invalid compositions."""
    import pytest

    kw = dict(data_path=voc_root, class_names=[f"c{i}" for i in range(3)],
              head="linear", n_blocks=1, batch_size=8, lr=1e-3,
              max_epochs=1, patience=5, n_classes=N_CLASSES,
              random_init=True, augmented=False, train_resolution=RES,
              seed=0, precision="fp32", freeze_backbone=False)
    a = DINOSeg(write_path=str(tmp_path / "a"), **kw)
    ra = a.fit(samples_per_epoch=8, seed=0)
    b = DINOSeg(write_path=str(tmp_path / "b"), **kw)
    rb = b.fit(samples_per_epoch=8, seed=0, fsdp=True)
    assert abs(ra["test_acc"] - rb["test_acc"]) < 1e-4
    # post-fit the params are the reloaded best checkpoint (replicated),
    # so predict works unchanged
    out = b.predict(np.zeros((RES, RES, 3), np.uint8))
    assert out.shape == (480, 480)
    with pytest.raises(ValueError, match="drop zero=True"):
        b.fit(fsdp=True, zero=True)
    with pytest.raises(ValueError, match="token-axis"):
        b.fit(fsdp=True, parallelism="sp")


def test_early_stopping_on_patience(voc_root, tmp_path):
    """Opt-in activation of the reference's commented-out EarlyStopping
    (pl_torch_modules.py:385-388): lr=0 pins val_acc flat, so after the
    first epoch sets the best, `patience` flat epochs end the run."""
    model = DINOSeg(data_path=voc_root, write_path=str(tmp_path / "r"),
                    head="linear", n_blocks=1, n_classes=N_CLASSES,
                    batch_size=4, lr=0.0, optimizer="adam",
                    freeze_backbone=True, max_epochs=10, patience=2,
                    random_init=True, augmented=False, train_resolution=RES,
                    seed=0, precision="fp32")
    epochs = []
    orig_log = model._log

    def capture(metrics, step):
        if "val_acc" in metrics and step >= 0:
            epochs.append(step)
        orig_log(metrics, step)

    model._log = capture
    model.fit(samples_per_epoch=8, early_stopping=True)
    # epoch 0 improves (from -1), epochs 1 and 2 are flat -> stop at 2
    assert epochs == [0, 1, 2], epochs


def test_early_stopping_default_off(voc_root, tmp_path):
    model = DINOSeg(data_path=voc_root, write_path=str(tmp_path / "r"),
                    head="linear", n_blocks=1, n_classes=N_CLASSES,
                    batch_size=4, lr=0.0, optimizer="adam",
                    freeze_backbone=True, max_epochs=4, patience=1,
                    random_init=True, augmented=False, train_resolution=RES,
                    seed=0, precision="fp32")
    epochs = []
    orig_log = model._log
    model._log = lambda m, step: (epochs.append(step)
                                  if "val_acc" in m and step >= 0 else None,
                                  orig_log(m, step))
    model.fit(samples_per_epoch=8)
    assert epochs == [0, 1, 2, 3]  # runs to max_epochs, like the reference


def test_early_stopping_resume_trains_no_extra_epoch(voc_root, tmp_path):
    """A resumed run that had already exhausted patience must not train
    (or re-save a best checkpoint for) one more epoch."""
    kw = dict(data_path=voc_root, write_path=str(tmp_path / "r"),
              head="linear", n_blocks=1, n_classes=N_CLASSES, batch_size=4,
              lr=0.0, optimizer="adam", freeze_backbone=True, max_epochs=10,
              patience=2, random_init=True, augmented=False,
              train_resolution=RES, seed=0, precision="fp32")
    model = DINOSeg(**kw)
    model.fit(samples_per_epoch=8, early_stopping=True, resume=True)

    model2 = DINOSeg(**kw)
    epochs = []
    orig = model2._log

    def capture(metrics, step):
        if "val_acc" in metrics and step >= 0:
            epochs.append(step)
        orig(metrics, step)

    model2._log = capture
    model2.fit(samples_per_epoch=8, early_stopping=True, resume=True)
    assert epochs == [], epochs  # zero training epochs on the resumed run
