"""Flash-attention kernel (interpret mode on CPU) vs XLA reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dino_tpu.ops.attention import attention_xla, flash_attention


@pytest.mark.parametrize("n", [226, 901, 1024, 37])
def test_flash_matches_xla(n):
    key = jax.random.PRNGKey(n)
    kq, kk, kv = jax.random.split(key, 3)
    b, nh, hd = 2, 3, 64
    q = jax.random.normal(kq, (b, nh, n, hd), jnp.float32)
    k = jax.random.normal(kk, (b, nh, n, hd), jnp.float32)
    v = jax.random.normal(kv, (b, nh, n, hd), jnp.float32)
    scale = hd ** -0.5
    ref, _ = attention_xla(q, k, v, scale)
    out = flash_attention(q, k, v, scale, True)  # interpret mode
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_chunked_bwd_matches_xla_vjp():
    """Memory-linear backward == full-probs backward."""
    from dino_tpu.ops.attention import _flash_bwd_chunked
    key = jax.random.PRNGKey(5)
    kq, kk, kv, kg = jax.random.split(key, 4)
    b, nh, n, hd = 2, 3, 310, 64  # non-multiple of the 128 block
    q = jax.random.normal(kq, (b, nh, n, hd), jnp.float32)
    k = jax.random.normal(kk, (b, nh, n, hd), jnp.float32)
    v = jax.random.normal(kv, (b, nh, n, hd), jnp.float32)
    g = jax.random.normal(kg, (b, nh, n, hd), jnp.float32)
    scale = 0.125
    _, vjp = jax.vjp(lambda q_, k_, v_: attention_xla(q_, k_, v_, scale)[0],
                     q, k, v)
    ref = vjp(g)
    ours = _flash_bwd_chunked(q, k, v, g, scale)
    for a, b_ in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("n", [226, 901])
def test_pallas_bwd_kernel_matches_xla_vjp(n):
    """The resident flash backward kernel (interpret mode) == XLA vjp,
    including padded q-rows and padded k-columns."""
    from dino_tpu.ops.attention import _flash_bwd_pallas, _flash_fwd_impl
    key = jax.random.PRNGKey(n)
    kq, kk, kv, kg = jax.random.split(key, 4)
    b, nh, hd = 2, 3, 64
    q = jax.random.normal(kq, (b, nh, n, hd), jnp.float32)
    k = jax.random.normal(kk, (b, nh, n, hd), jnp.float32)
    v = jax.random.normal(kv, (b, nh, n, hd), jnp.float32)
    g = jax.random.normal(kg, (b, nh, n, hd), jnp.float32)
    scale = hd ** -0.5
    out, lse = _flash_fwd_impl(q, k, v, scale, True, return_lse=True)
    dsum = jnp.sum(g * out, axis=-1)
    ours = _flash_bwd_pallas(q, k, v, lse, g, dsum, scale, True)
    _, vjp = jax.vjp(lambda q_, k_, v_: attention_xla(q_, k_, v_, scale)[0],
                     q, k, v)
    ref = vjp(g)
    for a, r in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=5e-5, rtol=1e-4)


def test_resident_split_fwd_and_bwd_match_xla(monkeypatch):
    """Force the resident-split (multi-pass + online-softmax merge) path at a
    small N by shrinking the VMEM budgets; fwd and grads must match XLA."""
    import dino_tpu.ops.attention as A
    monkeypatch.setattr(A, "_KV_VMEM_BUDGET", 300 * 1024)
    monkeypatch.setattr(A, "_BWD_VMEM_BUDGET", 600 * 1024)
    n, b, nh, hd = 700, 1, 2, 64
    assert A._split_count(n, hd, 4, A._KV_VMEM_BUDGET) > 1
    key = jax.random.PRNGKey(7)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, nh, n, hd), jnp.float32)
    k = jax.random.normal(kk, (b, nh, n, hd), jnp.float32)
    v = jax.random.normal(kv, (b, nh, n, hd), jnp.float32)
    scale = hd ** -0.5
    ref, _ = attention_xla(q, k, v, scale)
    out = flash_attention(q, k, v, scale, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
    gf = jax.grad(lambda q, k, v: jnp.sum(
        flash_attention(q, k, v, scale, True) ** 2), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda q, k, v: jnp.sum(
        attention_xla(q, k, v, scale)[0] ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, r in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=5e-4, rtol=1e-4)


def test_flash_grad_matches_xla():
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 2, 130, 64), jnp.float32)
    k = jax.random.normal(kk, (1, 2, 130, 64), jnp.float32)
    v = jax.random.normal(kv, (1, 2, 130, 64), jnp.float32)
    scale = 0.125

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale, True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(attention_xla(q, k, v, scale)[0] ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4)


def test_fused_mlp_xla_reference_matches_block():
    """The fused kernel's bwd oracle == the unfused block composition."""
    from dino_tpu.models.vit import (ViTConfig, dense, init_block_params,
                                     layer_norm)
    from dino_tpu.ops.fused_mlp import _xla_reference
    cfg = ViTConfig(embed_dim=64, num_heads=2)
    p = init_block_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 33, 64))
    ref = _xla_reference(p["norm2"], p["mlp"], x, cfg.ln_eps)
    h = layer_norm(p["norm2"], x, cfg.ln_eps)
    h = dense(p["mlp"]["fc1"], h)
    h = jax.nn.gelu(h, approximate=False)
    manual = x + dense(p["mlp"]["fc2"], h)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(manual),
                               atol=2e-5, rtol=1e-5)
