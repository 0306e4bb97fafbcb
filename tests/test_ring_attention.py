"""Ring attention / sequence parallelism vs the single-device forward."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dino_tpu.models.vit import ViTConfig, init_vit_params, vit_forward
from dino_tpu.parallel.mesh import make_mesh
from dino_tpu.parallel.ring_attention import vit_forward_seq_parallel

CFG = ViTConfig(patch_size=8, embed_dim=192, depth=2, num_heads=3)


def test_seq_parallel_matches_single_device():
    params = init_vit_params(jax.random.PRNGKey(0), CFG, depth=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))  # N+1 = 50
    ref = vit_forward(params, x, CFG)

    mesh = make_mesh(8, model_axis=1)
    out = vit_forward_seq_parallel(params, x, CFG, mesh, seq_axis="data")
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_seq_parallel_no_padding_case():
    # N+1 = 1 + 7*7 = 50 pads to 56 over 8 devices; also hit an exact split:
    # 31*31+1 = 962 ... use 8*8 grid => 65 -> pad 72. Just exercise a second
    # resolution for shape coverage.
    params = init_vit_params(jax.random.PRNGKey(2), CFG, depth=2)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 3))
    mesh = make_mesh(8, model_axis=1)
    out = vit_forward_seq_parallel(params, x, CFG, mesh)
    ref = vit_forward(params, x, CFG)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_ring_flash_matches_replicated():
    """Ring attention with the Pallas flash kernel per hop (dynamic valid-K
    bound, interpret mode off-TPU) == replicated forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dino_tpu.models.vit import ViTConfig, init_vit_params, vit_forward
    from dino_tpu.parallel.mesh import make_mesh
    from dino_tpu.parallel.ring_attention import vit_forward_seq_parallel

    cfg = ViTConfig(patch_size=8, embed_dim=64, num_heads=2)
    p = init_vit_params(jax.random.PRNGKey(0), cfg, depth=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 48, 48, 3), jnp.float32)
    mesh = make_mesh(8, model_axis=1)
    ref = vit_forward(p, x, cfg, use_flash=False)
    out = vit_forward_seq_parallel(p, x, cfg, mesh, seq_axis="data",
                                   flash="force")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-4)


def test_dyn_mask_flash_kernel():
    """The dynamic-bound resident kernel == XLA attention on the valid K
    prefix, for several traced bounds through one compiled program."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dino_tpu.ops.attention import (attention_xla,
                                        flash_attention_with_lse_dyn)
    b, nh, n, nk, hd = 1, 2, 130, 96, 64
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, nh, n, hd), jnp.float32)
    k = jax.random.normal(kk, (b, nh, nk, hd), jnp.float32)
    v = jax.random.normal(kv, (b, nh, nk, hd), jnp.float32)
    scale = hd ** -0.5
    fn = jax.jit(lambda q, k, v, vd: flash_attention_with_lse_dyn(
        q, k, v, scale, vd, interpret=True)[0])
    for valid in (96, 50, 1):
        out = fn(q, k, v, jnp.int32(valid))
        ref, _ = attention_xla(q, k[:, :, :valid], v[:, :, :valid], scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)
