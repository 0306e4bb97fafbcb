"""End-to-end numerical parity of the JAX ViT vs golden tensors exported from
the torch reference (tools/gen_goldens.py). Covers every public forward mode:
all-tokens, intermediate, CLS-only, last-selfattention, intermediate layers,
forward_mask, and masked attention."""
import numpy as np
import pytest

from dino_tpu.checkpointing.torch_convert import convert_vit_state_dict
from dino_tpu.models.vit import (ViTConfig, forward_mask,
                                 get_intermediate_layers,
                                 get_last_selfattention, vit_forward)
from tests.conftest import golden_state_dict

CFG = ViTConfig(patch_size=8, embed_dim=192, depth=2, num_heads=3,
                mlp_ratio=4.0, qkv_bias=True, ln_eps=1e-6)

ATOL = 2e-4
RTOL = 1e-4


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.fixture(scope="module")
def params(vit_golden):
    return convert_vit_state_dict(golden_state_dict(vit_golden))


def test_forward_all_tokens_240(vit_golden, params):
    out = vit_forward(params, _nhwc(vit_golden["x240"]), CFG)
    np.testing.assert_allclose(out, vit_golden["out240"], atol=ATOL, rtol=RTOL)


def test_forward_intermediate(vit_golden, params):
    out = vit_forward(params, _nhwc(vit_golden["x240"]), CFG, intermediate=1)
    np.testing.assert_allclose(out, vit_golden["out240_int1"], atol=ATOL, rtol=RTOL)


def test_forward_cls_only(vit_golden, params):
    out = vit_forward(params, _nhwc(vit_golden["x240"]), CFG, all_tokens=False)
    np.testing.assert_allclose(out, vit_golden["cls240"], atol=ATOL, rtol=RTOL)


def test_forward_other_resolution_pos_interp(vit_golden, params):
    out = vit_forward(params, _nhwc(vit_golden["x120"]), CFG)
    np.testing.assert_allclose(out, vit_golden["out120"], atol=ATOL, rtol=RTOL)


def test_last_selfattention(vit_golden, params):
    attn = get_last_selfattention(params, _nhwc(vit_golden["x120"]), CFG)
    np.testing.assert_allclose(attn, vit_golden["attn120"], atol=ATOL, rtol=RTOL)
    attn240 = get_last_selfattention(params, _nhwc(vit_golden["x240"]), CFG)
    np.testing.assert_allclose(np.asarray(attn240)[:, :, 0, :],
                               vit_golden["attn240_cls"], atol=ATOL, rtol=RTOL)


def test_last_selfattention_cls_only(vit_golden, params):
    """The O(N) CLS-row path == row 0 of the full (N, N) path (and thus the
    torch golden), including under a cls_mask."""
    attn = get_last_selfattention(params, _nhwc(vit_golden["x240"]), CFG,
                                  cls_only=True)
    assert attn.shape[2] == 1  # (B, nh, 1, N): no (N, N) anywhere
    np.testing.assert_allclose(np.asarray(attn)[:, :, 0, :],
                               vit_golden["attn240_cls"], atol=ATOL, rtol=RTOL)
    masked = get_last_selfattention(params, _nhwc(vit_golden["x120"]), CFG,
                                    cls_mask=vit_golden["cls_mask"],
                                    cls_only=True)
    np.testing.assert_allclose(masked, vit_golden["attn_masked"],
                               atol=ATOL, rtol=RTOL)


def test_cls_only_long_sequence():
    """960px-shaped sequence (N = 14,401 tokens) CLS-row extraction on a thin
    ViT: runs in O(N) memory (the full path would need a ~1.7 GB f32 matrix
    per head here) and matches process_attentions' expectations."""
    import jax
    from dino_tpu.models.vit import init_vit_params
    from dino_tpu.utils.frames import process_attentions
    cfg = ViTConfig(patch_size=8, embed_dim=32, depth=1, num_heads=2)
    p = init_vit_params(jax.random.PRNGKey(0), cfg, depth=1)
    x = np.random.RandomState(0).randn(1, 960, 960, 3).astype(np.float32)
    attn = get_last_selfattention(p, x, cfg, cls_only=True)
    assert attn.shape == (1, 2, 1, 120 * 120 + 1)
    np.testing.assert_allclose(np.asarray(attn).sum(axis=-1), 1.0, rtol=1e-5)
    maps = process_attentions(np.asarray(attn), resolution=960)
    assert maps.shape == (2, 120, 120)


def test_intermediate_layers(vit_golden, params):
    outs = get_intermediate_layers(params, _nhwc(vit_golden["x240"]), CFG, n=2)
    np.testing.assert_allclose(outs[0], vit_golden["inter240_0"], atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(outs[1], vit_golden["inter240_1"], atol=ATOL, rtol=RTOL)


def test_forward_mask(vit_golden, params):
    out = forward_mask(params, _nhwc(vit_golden["x120"]),
                       vit_golden["cls_mask"], CFG)
    np.testing.assert_allclose(out, vit_golden["fm120"], atol=ATOL, rtol=RTOL)


def test_forward_mask_long_sequence_no_quadratic():
    """Region embedding at a 960px-shaped sequence (N = 14,401): the CLS
    query row is sliced before the score dot (ops/attention.py
    attention_probs_xla), so forward_mask is O(n_masks*N) memory — the
    lowered program contains no (N, N) intermediate — and runs on a thin
    ViT where the full matrix would be ~1.7 GB f32 per head."""
    import jax
    from dino_tpu.models.vit import init_vit_params
    cfg = ViTConfig(patch_size=8, embed_dim=32, depth=1, num_heads=2)
    p = init_vit_params(jax.random.PRNGKey(0), cfg, depth=1)
    x = np.random.RandomState(1).randn(1, 960, 960, 3).astype(np.float32)
    mask = np.zeros((3, 120, 120), np.float32)
    mask[0, :40], mask[1, 40:80], mask[2, 80:] = 1, 1, 1
    fn = jax.jit(lambda p, x, m: forward_mask(p, x, m, cfg))
    hlo = fn.lower(p, x, mask).as_text()
    n = 120 * 120 + 1
    assert f"{n},{n}" not in hlo, "full (N, N) score matrix materialized"
    out = fn(p, x, mask)
    assert out.shape == (3, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_masked_attention(vit_golden, params):
    attn = get_last_selfattention(params, _nhwc(vit_golden["x120"]), CFG,
                                  cls_mask=vit_golden["cls_mask"])
    np.testing.assert_allclose(attn, vit_golden["attn_masked"], atol=ATOL, rtol=RTOL)
