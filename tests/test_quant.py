"""int8 serving path: numerics of the quantized matmul and end-to-end
label agreement vs the bf16 path."""
import jax
import jax.numpy as jnp
import numpy as np

from dino_tpu.ops.quant import (int8_dense, quantize_dense_params,
                                quantize_vit_params)


def test_int8_dense_close_to_f32():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(64, 384).astype(np.float32))
    p = {"kernel": jnp.asarray(rs.randn(384, 256).astype(np.float32) * 0.02),
         "bias": jnp.asarray(rs.randn(256).astype(np.float32) * 0.01)}
    ref = x @ p["kernel"] + p["bias"]
    out = int8_dense(quantize_dense_params(p), x)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).max()
    assert err.max() / scale < 0.02, err.max() / scale


def test_quantize_vit_params_structure():
    from dino_tpu.models.vit import ViTConfig, init_vit_params, vit_forward
    cfg = ViTConfig(patch_size=8, embed_dim=64, num_heads=2)
    p = init_vit_params(jax.random.PRNGKey(0), cfg, depth=2)
    q = quantize_vit_params(p)
    blk = q["blocks"][0]
    assert blk["attn"]["qkv"]["kernel_i8"].dtype == jnp.int8
    assert "kernel" not in blk["mlp"]["fc1"]
    # float leaves shared, not copied
    assert q["pos_embed"] is p["pos_embed"]
    # quantized forward runs and stays close to the float forward
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 48, 48, 3))
    ref = vit_forward(p, x, cfg, use_flash=False)
    out = vit_forward(q, x, cfg, use_flash=False)
    rel = (np.abs(np.asarray(out) - np.asarray(ref)).max()
           / np.abs(np.asarray(ref)).max())
    assert rel < 0.05, rel


def test_per_call_precision_override():
    """predict(x, precision=...) overrides the model default per call; fp32
    twice gives identical maps regardless of the model's default."""
    from dino_tpu import DINOSeg
    m = DINOSeg(backbone="vit", n_blocks=1, head="linear", n_classes=5,
                random_init=True, seed=1, precision="bf16")
    m.set_resolution(240)
    img = np.random.RandomState(1).randint(0, 255, (240, 320, 3), np.uint8)
    a = m.predict(img, precision="fp32")
    b = m.predict(img, precision="fp32")
    np.testing.assert_array_equal(a, b)
    batch = m.predict_batch(img[None], precision="fp32")
    np.testing.assert_array_equal(batch[0], a)  # batch-size independent @fp32
    assert m.predict(img).shape == (480, 480)  # default path still cached


def test_per_call_precision_validation():
    from dino_tpu import DINOSeg
    import pytest as _pt
    m = DINOSeg(backbone="cnn1", n_classes=3, head="linear",
                random_init=True)
    img = np.random.RandomState(0).randint(0, 255, (240, 240, 3), np.uint8)
    with _pt.raises(ValueError, match="int8"):
        m.predict(img, precision="int8")
    v = DINOSeg(backbone="vit", n_blocks=1, head="linear", n_classes=3,
                random_init=True)
    with _pt.raises(ValueError, match="unsupported precision"):
        v.predict(img, precision="bf-16")


def test_has_batchnorms_no_false_positives():
    from dino_tpu.utils.misc import has_batchnorms
    # optimizer-state-like pytree with mean/var-suffixed paths but no BN group
    fake_opt = {"adam": {"running_mean_of_loss": np.zeros(3)},
                "stats": {"grad_var": np.ones(2)}}
    assert not has_batchnorms(fake_opt)
    bn = {"layers": [{"bn1": {"scale": 1, "bias": 0, "mean": 0, "var": 1}}]}
    assert has_batchnorms(bn)


def test_int8_predict_agreement_with_bf16():
    """DINOSeg(precision='int8') label maps mostly agree with bf16 on the
    same inputs (random weights give near-uniform logits — the worst case
    for agreement; trained checkpoints tie less)."""
    from dino_tpu import DINOSeg
    kw = dict(backbone="vit", n_blocks=2, head="mlp", n_classes=7,
              random_init=True, seed=3)
    m_bf16 = DINOSeg(precision="bf16", **kw)
    m_int8 = DINOSeg(precision="int8", **kw)
    m_bf16.set_resolution(240)
    m_int8.set_resolution(240)
    img = np.random.RandomState(0).randint(0, 255, (240, 320, 3), np.uint8)
    a = m_bf16.predict(img)
    b = m_int8.predict(img)
    assert b.shape == (480, 480) and b.dtype == a.dtype
    agreement = float((a == b).mean())
    assert agreement > 0.85, agreement
