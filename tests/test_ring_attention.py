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
