"""ResNet-50 cnn1/cnn2 backbones: primitive parity vs torch.nn.functional
(no torchvision needed), structural output shapes, converter roundtrip, and
the DINOSeg cnn path end-to-end."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dino_tpu.models.resnet import (batch_norm, bottleneck_apply, conv2d,
                                    conv_transpose_1x1_s2,
                                    convert_resnet_state_dict,
                                    init_resnet_params, max_pool,
                                    resnet_backbone_apply)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_conv2d_matches_torch():
    rs = np.random.RandomState(0)
    x = rs.randn(2, 16, 16, 8).astype(np.float32)
    w = rs.randn(3, 3, 8, 4).astype(np.float32)  # HWIO
    ours = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), stride=2,
                             padding=1))
    ref = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(w.transpose(3, 2, 0, 1)),
                   stride=2, padding=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_batch_norm_matches_torch():
    rs = np.random.RandomState(1)
    x = rs.randn(2, 8, 8, 16).astype(np.float32)
    p = {"scale": rs.randn(16).astype(np.float32),
         "bias": rs.randn(16).astype(np.float32),
         "mean": rs.randn(16).astype(np.float32),
         "var": rs.rand(16).astype(np.float32) + 0.5}
    ours = np.asarray(batch_norm(
        {k: jnp.asarray(v) for k, v in p.items()}, jnp.asarray(x)))
    ref = F.batch_norm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                       torch.from_numpy(p["mean"]), torch.from_numpy(p["var"]),
                       torch.from_numpy(p["scale"]), torch.from_numpy(p["bias"]),
                       training=False, eps=1e-5)
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5, rtol=1e-5)


def test_max_pool_matches_torch():
    rs = np.random.RandomState(2)
    x = rs.randn(1, 9, 9, 4).astype(np.float32)
    ours = np.asarray(max_pool(jnp.asarray(x)))
    ref = F.max_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                       kernel_size=3, stride=2, padding=1)
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-6)


def test_conv_transpose_matches_torch():
    rs = np.random.RandomState(3)
    x = rs.randn(1, 5, 5, 6).astype(np.float32)
    w = rs.randn(6, 4).astype(np.float32)     # (in, out) for k=1
    b = rs.randn(4).astype(np.float32)
    ours = np.asarray(conv_transpose_1x1_s2(jnp.asarray(x), jnp.asarray(w),
                                            jnp.asarray(b)))
    ref = F.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(w[:, :, None, None]), torch.from_numpy(b),
        stride=2, output_padding=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("variant,channels", [("cnn1", 512), ("cnn2", 512)])
def test_backbone_shapes(variant, channels):
    params = init_resnet_params(jax.random.PRNGKey(0), variant)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    out = resnet_backbone_apply(params, x, variant)
    assert out.shape == (1, 8, 8, channels)  # res/8 grid, like the ViT
    assert bool(jnp.isfinite(out).all())


def test_last_block_relu_off():
    """The reference nulls the final block's relu; negative activations must
    survive (pl_torch_modules.py:192,203)."""
    params = init_resnet_params(jax.random.PRNGKey(0), "cnn1")
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    out = np.asarray(resnet_backbone_apply(params, x, "cnn1"))
    assert (out < 0).any()


def test_converter_roundtrip():
    rs = np.random.RandomState(0)

    def bn_sd(prefix, c, sd):
        sd[prefix + ".weight"] = rs.randn(c).astype(np.float32)
        sd[prefix + ".bias"] = rs.randn(c).astype(np.float32)
        sd[prefix + ".running_mean"] = rs.randn(c).astype(np.float32)
        sd[prefix + ".running_var"] = (rs.rand(c) + 0.5).astype(np.float32)

    sd = {"conv1.weight": rs.randn(64, 3, 7, 7).astype(np.float32)}
    bn_sd("bn1", 64, sd)
    cin = 64
    for si, (blocks, mid, out, _) in enumerate([(3, 64, 256, 1),
                                                (4, 128, 512, 2)]):
        for bi in range(blocks):
            b = f"layer{si+1}.{bi}"
            sd[b + ".conv1.weight"] = rs.randn(mid, cin, 1, 1).astype(np.float32)
            bn_sd(b + ".bn1", mid, sd)
            sd[b + ".conv2.weight"] = rs.randn(mid, mid, 3, 3).astype(np.float32)
            bn_sd(b + ".bn2", mid, sd)
            sd[b + ".conv3.weight"] = rs.randn(out, mid, 1, 1).astype(np.float32)
            bn_sd(b + ".bn3", out, sd)
            if bi == 0:
                sd[b + ".downsample.0.weight"] = rs.randn(out, cin, 1, 1).astype(np.float32)
                bn_sd(b + ".downsample.1", out, sd)
            cin = out
    params = convert_resnet_state_dict(sd, "cnn1")
    assert len(params["layers"]) == 2
    assert len(params["layers"][0]) == 3 and len(params["layers"][1]) == 4
    np.testing.assert_allclose(
        params["conv1"][:, :, 0, 0], sd["conv1.weight"][0, 0])  # HWIO<-OIHW
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3)) * 0.01
    out = resnet_backbone_apply(jax.tree.map(jnp.asarray, params), x, "cnn1")
    assert out.shape == (1, 4, 4, 512)


def test_dinoseg_cnn_end_to_end():
    from dino_tpu import DINOSeg
    for variant in ["cnn1", "cnn2"]:
        m = DINOSeg(head="mlp", n_classes=5, backbone=variant, seed=0)
        assert m.mlp_input_dim == 512
        img = np.random.RandomState(0).randint(0, 255, (100, 120, 3), np.uint8)
        m.set_resolution(240)
        pred = m.predict(img)
        assert pred.shape == (480, 480)
        assert pred.max() < 5


def test_batch_norm_train_matches_torch():
    """Train-mode BN (batch stats + EMA running update) == torch semantics."""
    from dino_tpu.models.resnet import batch_norm_train
    rs = np.random.RandomState(0)
    x = rs.randn(4, 6, 5, 3).astype(np.float32)  # NHWC
    p = {"scale": jnp.asarray(rs.rand(3).astype(np.float32) + 0.5),
         "bias": jnp.asarray(rs.randn(3).astype(np.float32)),
         "mean": jnp.asarray(rs.randn(3).astype(np.float32)),
         "var": jnp.asarray(rs.rand(3).astype(np.float32) + 0.5)}
    y, new = batch_norm_train(p, jnp.asarray(x))

    bn = torch.nn.BatchNorm2d(3, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(np.asarray(p["scale"])))
        bn.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))
        bn.running_mean.copy_(torch.from_numpy(np.asarray(p["mean"])))
        bn.running_var.copy_(torch.from_numpy(np.asarray(p["var"])))
    bn.train()
    with torch.no_grad():
        ty = bn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(y),
                               ty.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new["mean"]),
                               bn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(new["var"]),
                               bn.running_var.numpy(), atol=1e-5)


def test_cnn_train_step_updates_running_stats():
    """A train step on a cnn backbone updates BN running stats (even frozen,
    matching PL train() semantics) while frozen convs stay fixed."""
    from dino_tpu.models.heads import init_head
    from dino_tpu.models.vit import ViTConfig
    from dino_tpu.train.loop import (init_opt_state, make_optimizer,
                                     make_train_step)
    cfg = ViTConfig(patch_size=8)
    vit_p = init_resnet_params(jax.random.PRNGKey(0), "cnn1")
    head_p = init_head(jax.random.PRNGKey(1), "linear", 3, 512)
    opt = make_optimizer("adam", 1e-3)
    st = init_opt_state(opt, vit_p, head_p, freeze_backbone=True)
    step = make_train_step(cfg, "linear", 3, opt, freeze_backbone=True,
                           donate=False, backbone="cnn1")
    rs = np.random.RandomState(0)
    imgs = jnp.asarray(rs.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8))
    labels = jnp.asarray(rs.randint(0, 3, (2, 64)).astype(np.int32))
    new_vit, new_head, st, loss, cm = step(vit_p, head_p, st, imgs, labels)
    assert np.isfinite(float(loss))
    # running stats moved...
    assert not np.allclose(np.asarray(new_vit["bn1"]["mean"]),
                           np.asarray(vit_p["bn1"]["mean"]))
    assert not np.allclose(
        np.asarray(new_vit["layers"][1][0]["bn3"]["var"]),
        np.asarray(vit_p["layers"][1][0]["bn3"]["var"]))
    # ...but frozen weights did not
    np.testing.assert_array_equal(np.asarray(new_vit["conv1"]),
                                  np.asarray(vit_p["conv1"]))
    np.testing.assert_array_equal(np.asarray(new_vit["bn1"]["scale"]),
                                  np.asarray(vit_p["bn1"]["scale"]))
