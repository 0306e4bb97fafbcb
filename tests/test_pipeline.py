"""Pipeline parallelism: GPipe stages over a mesh axis == replicated forward."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from dino_tpu.models.vit import ViTConfig, init_vit_params, vit_forward
from dino_tpu.parallel.pipeline import (stack_block_stages,
                                        vit_forward_pipelined)

CFG = ViTConfig(patch_size=8, embed_dim=64, num_heads=2)


@pytest.mark.parametrize("n_stages,n_mb", [(4, 2), (8, 4), (2, 4)])
def test_pipelined_forward_matches_replicated(n_stages, n_mb):
    p = init_vit_params(jax.random.PRNGKey(0), CFG, depth=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 48, 48, 3), jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:n_stages]), ("stage",))
    out = vit_forward_pipelined(p, x, CFG, mesh, n_microbatches=n_mb,
                                use_flash=False)
    ref = vit_forward(p, x, CFG, use_flash=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_stage_param_sharding_is_real():
    """Each stage device holds only its slab of block weights."""
    p = init_vit_params(jax.random.PRNGKey(0), CFG, depth=8)
    stacked = stack_block_stages(p["blocks"], 4)
    leaf = jax.tree.leaves(stacked)[0]
    assert leaf.shape[:2] == (4, 2)  # 4 stages x 2 blocks per stage
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = Mesh(np.array(jax.devices()[:4]), ("stage",))
    sharded = jax.device_put(leaf, NamedSharding(mesh, P("stage")))
    shard = sharded.addressable_shards[0]
    assert shard.data.shape[0] == 1  # one stage slab per device


def test_depth_and_batch_divisibility_errors():
    p = init_vit_params(jax.random.PRNGKey(0), CFG, depth=6)
    mesh = Mesh(np.array(jax.devices()[:4]), ("stage",))
    x = jnp.zeros((4, 48, 48, 3))
    with pytest.raises(ValueError, match="not divisible"):
        vit_forward_pipelined(p, x, CFG, mesh)
    p8 = init_vit_params(jax.random.PRNGKey(0), CFG, depth=8)
    with pytest.raises(ValueError, match="microbatches"):
        vit_forward_pipelined(p8, jnp.zeros((3, 48, 48, 3)), CFG, mesh,
                              n_microbatches=2)
