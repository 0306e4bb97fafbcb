"""Multi-device sharding: the full train step over a ('data','model') mesh on
the virtual 8-device CPU backend, plus DP-vs-single-device equivalence."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dino_tpu.models.heads import init_head
from dino_tpu.models.vit import ViTConfig, init_vit_params
from dino_tpu.parallel.mesh import (head_param_spec, make_mesh, shard_params,
                                    vit_param_spec)
from dino_tpu.train.loop import (init_opt_state, make_optimizer,
                                 make_train_step, seg_forward)

CFG = ViTConfig(patch_size=8)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_dp_matches_single_device():
    """One DP-sharded train step == the same step on one device."""
    n_blocks, n_classes, res, batch = 1, 5, 48, 8
    vit_p = init_vit_params(jax.random.PRNGKey(0), CFG, depth=n_blocks)
    head_p = init_head(jax.random.PRNGKey(1), "mlp", n_classes, CFG.embed_dim)
    optimizer = make_optimizer("adam", 1e-3)
    step = make_train_step(CFG, "mlp", n_classes, optimizer,
                           freeze_backbone=True, donate=False)

    rs = np.random.RandomState(0)
    images = rs.randint(0, 255, (batch, res, res, 3)).astype(np.uint8)
    labels = rs.randint(0, n_classes, (batch, (res // 8) ** 2)).astype(np.int32)

    # single device
    opt1 = init_opt_state(optimizer, vit_p, head_p, True)
    _, h1, _, loss1, cm1 = step(vit_p, head_p, opt1, jnp.asarray(images),
                                jnp.asarray(labels))

    # 8-way data parallel
    mesh = make_mesh(8, model_axis=1)
    vit_s = shard_params(vit_p, vit_param_spec(n_blocks), mesh)
    head_s = shard_params(head_p, head_param_spec("mlp"), mesh)
    opt8 = init_opt_state(optimizer, vit_s, head_s, True)
    img_s = jax.device_put(images, NamedSharding(mesh, P("data")))
    lab_s = jax.device_put(labels, NamedSharding(mesh, P("data")))
    _, h8, _, loss8, cm8 = step(vit_s, head_s, opt8, img_s, lab_s)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(cm1), np.asarray(cm8))
    for a, b in zip(jax.tree.leaves(h1), jax.tree.leaves(h8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_tp_forward_matches_replicated():
    """Tensor-parallel sharded ViT forward == replicated forward."""
    n_blocks = 2
    vit_p = init_vit_params(jax.random.PRNGKey(0), CFG, depth=n_blocks)
    head_p = init_head(jax.random.PRNGKey(1), "mlp", 5, CFG.embed_dim)
    rs = np.random.RandomState(0)
    images = rs.randint(0, 255, (4, 48, 48, 3)).astype(np.uint8)

    ref = seg_forward(vit_p, head_p, CFG, "mlp", jnp.asarray(images))

    mesh = make_mesh(8, model_axis=2)
    vit_s = shard_params(vit_p, vit_param_spec(n_blocks), mesh)
    head_s = shard_params(head_p, head_param_spec("mlp"), mesh)
    img_s = jax.device_put(images, NamedSharding(mesh, P("data")))
    out = jax.jit(lambda v, h, x: seg_forward(v, h, CFG, "mlp", x))(
        vit_s, head_s, img_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_tp_serving_mode():
    """predict/predict_batch(parallelism='tp'): Megatron-sharded params over
    all 8 devices, same program — the batch-1 multi-chip latency mode."""
    from dino_tpu import DINOSeg

    m = DINOSeg(head="mlp", n_blocks=2, n_classes=5, random_init=True,
                seed=0, precision="fp32")
    m.set_resolution(64)
    rs = np.random.RandomState(0)
    frames = rs.randint(0, 255, (3, 64, 64, 3), np.uint8)  # 3 !% 8: no DP

    ref = m.predict_batch(frames)
    tp = m.predict_batch(frames, parallelism="tp")
    assert tp.shape == ref.shape == (3, 480, 480)
    # same math modulo all-reduce summation order; near-ties may flip on
    # random weights, so gate on overwhelming agreement rather than equality
    assert float((tp == ref).mean()) > 0.99

    single = m.predict(frames[0], parallelism="tp")
    assert float((single == tp[0]).mean()) > 0.99

    # the sharded param cache invalidates when params change
    v1 = m._serving_params("fp32", "tp")[0]
    assert m._serving_params("fp32", "tp")[0] is v1
    with pytest.raises(ValueError, match="unsupported parallelism"):
        m.predict(frames[0], parallelism="pp")


def test_zero_optimizer_sharding_matches_replicated():
    """ZeRO-1 (zero_mesh): moments stored sharded over 'data', numerics
    unchanged — one unfrozen Adam step equals the plain step, and the big
    optimizer-state leaves come back actually sharded."""
    from dino_tpu.parallel.mesh import data_sharding

    n_blocks, n_classes, res, batch = 2, 5, 48, 8
    cfg = ViTConfig(patch_size=8, embed_dim=64, num_heads=2)
    vit_p = init_vit_params(jax.random.PRNGKey(0), cfg, depth=n_blocks)
    head_p = init_head(jax.random.PRNGKey(1), "mlp", n_classes, 64)
    optimizer = make_optimizer("adam", 1e-3)
    rs = np.random.RandomState(0)
    images = rs.randint(0, 255, (batch, res, res, 3)).astype(np.uint8)
    labels = rs.randint(0, n_classes,
                        (batch, (res // 8) ** 2)).astype(np.int32)

    ref = make_train_step(cfg, "mlp", n_classes, optimizer,
                          freeze_backbone=False, donate=False)(
        vit_p, head_p, init_opt_state(optimizer, vit_p, head_p, False),
        jnp.asarray(images), jnp.asarray(labels))

    mesh = make_mesh(model_axis=1)
    step = make_train_step(cfg, "mlp", n_classes, optimizer,
                           freeze_backbone=False, donate=False,
                           zero_mesh=mesh)
    sharded_imgs = jax.device_put(jnp.asarray(images), data_sharding())
    new_vit, new_head, opt_out, loss, cm = step(
        vit_p, head_p, init_opt_state(optimizer, vit_p, head_p, False),
        sharded_imgs, jnp.asarray(labels))

    np.testing.assert_allclose(float(loss), float(ref[3]), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(cm), np.asarray(ref[4]))
    for a, b in zip(jax.tree.leaves(new_vit), jax.tree.leaves(ref[0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)

    # the moments for every shardable leaf must actually live sharded
    n_dev = jax.device_count()
    n_sharded = 0
    for leaf in jax.tree.leaves(opt_out):
        if hasattr(leaf, "sharding") and leaf.ndim > 0:
            if any(s >= n_dev and s % n_dev == 0 for s in leaf.shape):
                assert not leaf.sharding.is_fully_replicated, leaf.shape
                n_sharded += 1
    assert n_sharded > 0

    # a second step consumes the sharded state directly
    step(new_vit, new_head, opt_out, sharded_imgs, jnp.asarray(labels))


def test_zero_with_param_spec_keeps_tp_axis():
    """ZeRO composed with TP (zero_param_spec): the row-parallel proj/fc2
    kernel moments keep their 'model' axis and take 'data' on a free dim,
    and the step still matches the replicated one."""
    n_blocks, n_classes, res, batch = 2, 5, 48, 8
    cfg = ViTConfig(patch_size=8, embed_dim=64, num_heads=2)
    vit_p = init_vit_params(jax.random.PRNGKey(0), cfg, depth=n_blocks)
    head_p = init_head(jax.random.PRNGKey(1), "mlp", n_classes, 64)
    optimizer = make_optimizer("adam", 1e-3)
    rs = np.random.RandomState(0)
    images = rs.randint(0, 255, (batch, res, res, 3)).astype(np.uint8)
    labels = rs.randint(0, n_classes,
                        (batch, (res // 8) ** 2)).astype(np.int32)

    ref = make_train_step(cfg, "mlp", n_classes, optimizer,
                          freeze_backbone=False, donate=False)(
        vit_p, head_p, init_opt_state(optimizer, vit_p, head_p, False),
        jnp.asarray(images), jnp.asarray(labels))

    mesh = make_mesh(model_axis=2)  # (data=4, model=2)
    vit_s = shard_params(vit_p, vit_param_spec(n_blocks), mesh)
    head_s = shard_params(head_p, head_param_spec("mlp"), mesh)
    step = make_train_step(cfg, "mlp", n_classes, optimizer,
                           freeze_backbone=False, donate=False,
                           zero_mesh=mesh,
                           zero_param_spec={"head": head_param_spec("mlp"),
                                            "vit": vit_param_spec(n_blocks)})
    imgs_s = jax.device_put(jnp.asarray(images),
                            NamedSharding(mesh, P("data")))
    new_vit, new_head, opt_out, loss, cm = step(
        vit_s, head_s, init_opt_state(optimizer, vit_s, head_s, False),
        imgs_s, jnp.asarray(labels))

    np.testing.assert_allclose(float(loss), float(ref[3]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(new_vit), jax.tree.leaves(ref[0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)

    leaves = jax.tree.flatten_with_path(opt_out)[0]
    pk = [l for p, l in leaves
          if "proj" in str(p) and "kernel" in str(p)
          and getattr(l, "ndim", 0) == 2]
    assert pk
    for l in pk:
        names = jax.tree.leaves(tuple(l.sharding.spec))
        assert "model" in names, (l.shape, l.sharding)
        assert not l.sharding.is_fully_replicated

    # second step consumes the composed-sharded state directly
    step(new_vit, new_head, opt_out, imgs_s, jnp.asarray(labels))
