"""DINO self-supervised pretraining: loss math, EMA/centering, end-to-end
step sanity (loss decreases, teacher tracks student, no collapse guard)."""
import os
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dino_tpu.models.vit import ViTConfig
from dino_tpu.train.dino_pretrain import (DinoConfig, dino_loss,
                                          dino_multi_crop, dino_schedules,
                                          ema_update, init_dino_opt_state,
                                          init_dino_params,
                                          make_dino_train_step, update_center)

VIT = ViTConfig(patch_size=8, embed_dim=64, num_heads=2)
DINO = DinoConfig(out_dim=32, n_local_crops=2, global_size=32, local_size=16,
                  hidden_dim=64, bottleneck_dim=16)


def test_dino_loss_excludes_same_view_and_sharpens():
    b, k = 4, 8
    rs = np.random.RandomState(0)
    t_out = jnp.asarray(rs.randn(2 * b, k).astype(np.float32))
    center = jnp.zeros((1, k))
    # student == teacher distributions view-for-view: same-view CE would be
    # the entropy floor; excluding it, cross-view terms dominate
    s_out = jnp.concatenate([t_out, jnp.asarray(rs.randn(2 * b, k),
                                                jnp.float32)])
    loss = dino_loss(s_out, t_out, center, 0.1, jnp.float32(0.04), 4)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # lower teacher temp -> sharper targets -> loss changes monotonically
    loss_sharp = dino_loss(s_out, t_out, center, 0.1, jnp.float32(0.01), 4)
    assert not np.isclose(float(loss), float(loss_sharp))


def test_ema_and_center_updates():
    t = {"w": jnp.zeros(3), "meta_like": jnp.arange(3)}  # int leaf untouched
    s = {"w": jnp.ones(3), "meta_like": jnp.arange(3)}
    out = ema_update(t, s, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1 * np.ones(3),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out["meta_like"]), np.arange(3))
    c = update_center(jnp.zeros((1, 4)), jnp.ones((8, 4)), 0.9)
    np.testing.assert_allclose(np.asarray(c), 0.1 * np.ones((1, 4)),
                               rtol=1e-6)


def test_dino_schedules_shapes():
    lr, wd, mom, tt = dino_schedules(1e-3, epochs=4, niter_per_ep=10,
                                     warmup_epochs=1,
                                     warmup_teacher_temp=0.02,
                                     teacher_temp=0.04,
                                     warmup_teacher_temp_epochs=2)
    assert len(lr) == len(wd) == len(mom) == len(tt) == 40
    assert lr[0] == 0.0 and mom[-1] <= 1.0
    assert tt[0] == pytest.approx(0.02) and tt[-1] == pytest.approx(0.04)


def test_multi_crop_shapes_and_determinism():
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (100, 140, 3), np.uint8)
    g, l = dino_multi_crop(np.random.default_rng(5), img, DINO)
    assert len(g) == 2 and len(l) == DINO.n_local_crops
    assert g[0].shape == (32, 32, 3) and l[0].shape == (16, 16, 3)
    g2, l2 = dino_multi_crop(np.random.default_rng(5), img, DINO)
    np.testing.assert_array_equal(g[0], g2[0])
    np.testing.assert_array_equal(l[-1], l2[-1])


def test_pretrain_loss_decreases_and_teacher_tracks():
    student, teacher = init_dino_params(jax.random.PRNGKey(0), VIT, DINO,
                                        depth=2)
    opt = optax.adamw(3e-4)
    opt_state = init_dino_opt_state(opt, student)
    step = make_dino_train_step(VIT, DINO, opt)
    center = jnp.zeros((1, DINO.out_dim), jnp.float32)

    rs = np.random.RandomState(0)
    imgs = rs.randint(0, 255, (6, 64, 64, 3)).astype(np.uint8)
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(3):  # 3 fixed batches cycled -> learnable signal
        gs, ls = [], []
        for i in range(imgs.shape[0]):
            g, l = dino_multi_crop(rng, imgs[i], DINO)
            gs.append(g)
            ls.append(l)
        g_crops = (np.stack([np.stack([g[c] for g in gs]) for c in range(2)])
                   .astype(np.float32) / 255.0)
        l_crops = (np.stack([np.stack([l[c] for l in ls])
                             for c in range(DINO.n_local_crops)])
                   .astype(np.float32) / 255.0)
        batches.append((jnp.asarray(g_crops), jnp.asarray(l_crops)))

    losses = []
    for it in range(12):
        g_crops, l_crops = batches[it % len(batches)]
        student, teacher, center, opt_state, loss = step(
            student, teacher, center, opt_state, g_crops, l_crops,
            jnp.float32(0.04), jnp.float32(0.99), jnp.float32(0.0))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
    # teacher moved toward the student but is not identical
    s_leaf = np.asarray(student["vit"]["cls_token"])
    t_leaf = np.asarray(teacher["vit"]["cls_token"])
    assert not np.allclose(t_leaf, s_leaf)
    # center accumulated signal
    assert float(jnp.abs(center).sum()) > 0


def test_step_uint8_crops_match_prenormalized():
    """uint8 crops normalize ON-DEVICE inside the step (4x smaller
    host->device transfer); the result is identical to feeding
    ImageNet-prenormalized f32 crops (the CLI's old host path)."""
    from dino_tpu.ops.preprocess import normalize_imagenet
    student, teacher = init_dino_params(jax.random.PRNGKey(4), VIT, DINO,
                                        depth=1)
    opt = optax.adamw(3e-4)
    rs = np.random.RandomState(5)
    g_u8 = rs.randint(0, 255, (2, 4, DINO.global_size, DINO.global_size, 3),
                      np.uint8)
    l_u8 = rs.randint(0, 255, (DINO.n_local_crops, 4, DINO.local_size,
                               DINO.local_size, 3), np.uint8)
    outs = []
    for crops in [(jnp.asarray(g_u8), jnp.asarray(l_u8)),
                  (normalize_imagenet(jnp.asarray(g_u8)),
                   normalize_imagenet(jnp.asarray(l_u8)))]:
        step = make_dino_train_step(VIT, DINO, opt)
        opt_state = init_dino_opt_state(opt, student)
        center = jnp.zeros((1, DINO.out_dim), jnp.float32)
        outs.append(step(student, teacher, center, opt_state, crops[0],
                         crops[1], jnp.float32(0.04), jnp.float32(0.99),
                         jnp.float32(0.0)))
    # fusing the normalize into the step reassociates a handful of f32 ops
    # (~1e-7 noise on the grads); Adam's g/(sqrt(v)+eps) amplifies that for
    # near-zero grads at step 1, so post-update params can differ by a few
    # 1e-6 on a 3e-4 update (observed max 6.3e-6)
    for a, b in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(outs[1])):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-5, atol=2e-5)


def test_accum_steps_matches_big_batch_step():
    """accum_steps=K (scan over microbatches, one update on the accumulated
    mean gradient) produces the same post-step state as the plain big-batch
    step to f32 tolerance: same loss, params, teacher, center."""
    student, teacher = init_dino_params(jax.random.PRNGKey(2), VIT, DINO,
                                        depth=2)
    opt = optax.adamw(3e-4)
    rs = np.random.RandomState(3)
    g = jnp.asarray(rs.rand(2, 4, 32, 32, 3).astype(np.float32))
    l = jnp.asarray(rs.rand(DINO.n_local_crops, 4, 16, 16, 3)
                    .astype(np.float32))
    args = (jnp.float32(0.04), jnp.float32(0.99), jnp.float32(0.0))

    outs = {}
    for k in (1, 2, 4):
        step = make_dino_train_step(VIT, DINO, opt, accum_steps=k)
        center = jnp.zeros((1, DINO.out_dim), jnp.float32)
        opt_state = init_dino_opt_state(opt, student)
        outs[k] = step(student, teacher, center, opt_state, g, l, *args)

    for k in (2, 4):
        np.testing.assert_allclose(float(outs[k][4]), float(outs[1][4]),
                                   rtol=1e-5)  # loss
        for ref_leaf, acc_leaf in zip(jax.tree.leaves(outs[1][0]),
                                      jax.tree.leaves(outs[k][0])):
            if jnp.issubdtype(jnp.asarray(ref_leaf).dtype, jnp.floating):
                # f32 summation-order noise passes through Adam's
                # per-element normalization; 1e-5 is still 30x below the
                # 3e-4 update magnitude
                np.testing.assert_allclose(np.asarray(acc_leaf),
                                           np.asarray(ref_leaf),
                                           atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(outs[k][2]),
                                   np.asarray(outs[1][2]),
                                   atol=1e-6, rtol=1e-5)  # center


def test_fsdp_pretrain_step_matches_replicated():
    """FSDP over the pretrain state (student + teacher + moments — the
    framework's fattest train state): same post-step numerics as the
    replicated step, and the state comes back 1/N-per-device."""
    from jax.sharding import Mesh

    student, teacher = init_dino_params(jax.random.PRNGKey(2), VIT, DINO,
                                        depth=2)
    opt = optax.adamw(3e-4)
    rs = np.random.RandomState(3)
    g = jnp.asarray(rs.rand(2, 4, 32, 32, 3).astype(np.float32))
    l = jnp.asarray(rs.rand(DINO.n_local_crops, 4, 16, 16, 3)
                    .astype(np.float32))
    args = (jnp.float32(0.04), jnp.float32(0.99), jnp.float32(0.0))
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    outs = {}
    for name, kw in (("rep", {}), ("fsdp", {"fsdp_mesh": mesh})):
        step = make_dino_train_step(VIT, DINO, opt, **kw)
        center = jnp.zeros((1, DINO.out_dim), jnp.float32)
        opt_state = init_dino_opt_state(opt, student)
        outs[name] = step(student, teacher, center, opt_state, g, l, *args)

    np.testing.assert_allclose(float(outs["fsdp"][4]), float(outs["rep"][4]),
                               rtol=1e-5)  # loss
    for which in (0, 1):  # student, teacher
        for a, b in zip(jax.tree.leaves(outs["fsdp"][which]),
                        jax.tree.leaves(outs["rep"][which])):
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(outs["fsdp"][2]),
                               np.asarray(outs["rep"][2]),
                               atol=1e-6, rtol=1e-5)  # center
    # the student qkv kernel (64, 192) shards dim 0 over the 8 devices
    qkv = outs["fsdp"][0]["vit"]["blocks"][0]["attn"]["qkv"]["kernel"]
    assert "data" in tuple(qkv.sharding.spec)
    assert qkv.addressable_shards[0].data.shape[0] == qkv.shape[0] // 8
    # feeding the sharded state back keeps training (entry-pin path)
    step = make_dino_train_step(VIT, DINO, opt, fsdp_mesh=mesh)
    s2, t2, c2, o2, l2 = step(outs["fsdp"][0], outs["fsdp"][1],
                              outs["fsdp"][2], outs["fsdp"][3], g, l, *args)
    assert np.isfinite(float(l2))


def test_freeze_last_layer_gate():
    student, teacher = init_dino_params(jax.random.PRNGKey(1), VIT, DINO,
                                        depth=1)
    opt = optax.sgd(1e-2)
    opt_state = init_dino_opt_state(opt, student)
    step = make_dino_train_step(VIT, DINO, opt)
    center = jnp.zeros((1, DINO.out_dim), jnp.float32)
    rs = np.random.RandomState(0)
    g = jnp.asarray(rs.rand(2, 3, 32, 32, 3).astype(np.float32))
    l = jnp.asarray(rs.rand(DINO.n_local_crops, 3, 16, 16, 3)
                    .astype(np.float32))
    v0 = np.asarray(student["head"]["last_layer"]["v"])
    out = step(student, teacher, center, opt_state, g, l,
               jnp.float32(0.04), jnp.float32(0.996), jnp.float32(1.0))
    np.testing.assert_array_equal(
        np.asarray(out[0]["head"]["last_layer"]["v"]), v0)
    out2 = step(student, teacher, center, opt_state, g, l,
                jnp.float32(0.04), jnp.float32(0.996), jnp.float32(0.0))
    assert not np.allclose(np.asarray(out2[0]["head"]["last_layer"]["v"]), v0)


def test_pretrain_cli_to_dinoseg_handoff(tmp_path):
    """dt-pretrain-dino end-to-end: image folder -> training -> teacher
    backbone npz -> loadable as a DINOSeg pretrained backbone."""
    from PIL import Image

    from dino_tpu.api import DINOSeg
    from dino_tpu.cli.pretrain_dino import main as pretrain_main

    data = tmp_path / "imgs"
    data.mkdir()
    rs = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray(rs.randint(0, 255, (72, 96, 3), np.uint8)).save(
            data / f"{i}.jpg")
    write = tmp_path / "out"
    pretrain_main(["--data_path", str(data), "--write_path", str(write),
                   "--arch", "vit_small", "--depth", "1", "--out_dim", "32",
                   "--epochs", "1", "--warmup_epochs", "0",
                   "--batch_size", "2", "--n_local_crops", "2",
                   "--global_size", "32", "--local_size", "16"])
    ckpt = write / "dino_pretrained_backbone.npz"
    assert ckpt.exists()

    model = DINOSeg(head="linear", n_blocks=1, n_classes=3, seed=0,
                    pretrained_path=str(ckpt))
    model.set_resolution(64)
    img = rs.randint(0, 255, (64, 64, 3), np.uint8)
    out = model.predict(img)
    assert out.shape == (480, 480)


def test_pretrain_cli_fsdp_smoke(tmp_path):
    """dt-pretrain-dino --fsdp: the sharded-state path trains end-to-end
    and the final teacher backbone export still loads into DINOSeg."""
    from PIL import Image

    from dino_tpu.api import DINOSeg
    from dino_tpu.cli.pretrain_dino import main as pretrain_main

    data = tmp_path / "imgs"
    data.mkdir()
    rs = np.random.RandomState(0)
    for i in range(8):
        Image.fromarray(rs.randint(0, 255, (72, 96, 3), np.uint8)).save(
            data / f"{i}.jpg")
    write = tmp_path / "out"
    pretrain_main(["--data_path", str(data), "--write_path", str(write),
                   "--arch", "vit_small", "--depth", "1", "--out_dim", "32",
                   "--epochs", "1", "--warmup_epochs", "0",
                   "--batch_size", "8", "--n_local_crops", "2",
                   "--global_size", "32", "--local_size", "16", "--fsdp"])
    ckpt = write / "dino_pretrained_backbone.npz"
    assert ckpt.exists()
    model = DINOSeg(head="linear", n_blocks=1, n_classes=3, seed=0,
                    pretrained_path=str(ckpt))
    model.set_resolution(64)
    out = model.predict(rs.randint(0, 255, (64, 64, 3), np.uint8))
    assert out.shape == (480, 480)


def test_pretrain_resume_matches_uninterrupted(tmp_path):
    """--stop_after + --resume reproduces an uninterrupted run exactly
    (schedules span --epochs in both legs; per-epoch keyed shuffle/crop
    rngs make the replay deterministic)."""
    from PIL import Image

    from dino_tpu.cli.pretrain_dino import main as pretrain_main

    data = tmp_path / "imgs"
    data.mkdir()
    rs = np.random.RandomState(1)
    for i in range(4):
        Image.fromarray(rs.randint(0, 255, (64, 80, 3), np.uint8)).save(
            data / f"{i}.jpg")
    common = ["--data_path", str(data), "--arch", "vit_small", "--depth",
              "1", "--out_dim", "16", "--warmup_epochs", "0",
              "--batch_size", "2", "--n_local_crops", "2",
              "--global_size", "32", "--local_size", "16"]

    w_full = str(tmp_path / "full")
    pretrain_main(common + ["--write_path", w_full, "--epochs", "2"])

    w_resume = str(tmp_path / "resume")
    pretrain_main(common + ["--write_path", w_resume, "--epochs", "2",
                            "--stop_after", "0"])
    pretrain_main(common + ["--write_path", w_resume, "--epochs", "2",
                            "--resume"])

    a = np.load(os.path.join(w_full, "dino_pretrained_backbone.npz"))
    b = np.load(os.path.join(w_resume, "dino_pretrained_backbone.npz"))
    for k in a.files:
        np.testing.assert_allclose(b[k], a[k], rtol=1e-6, atol=1e-7,
                                   err_msg=k)
