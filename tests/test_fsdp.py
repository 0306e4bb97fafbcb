"""FSDP (ZeRO-3): sharded param/grad/moment storage == the replicated step.

The reference is single-GPU (its DDP scaffolding utils.py:467-499 is
dormant); FSDP is the ZeRO-3 member of the parallelism matrix
(docs/SCALING.md): params and Adam moments live 1/N-per-device, weights
all-gather transiently at their point of use, gradients reduce-scatter
into the sharded update — all via sharding constraints, no hand-written
collectives.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from dino_tpu.models.heads import init_head
from dino_tpu.models.vit import ViTConfig, init_vit_params
from dino_tpu.train.loop import (init_opt_state, make_optimizer,
                                 make_train_step)

CFG = ViTConfig(patch_size=8, embed_dim=64, num_heads=2)


def _mesh():
    return Mesh(np.array(jax.devices()[:8]), ("data",))


def _fixtures(depth=4, n_classes=5, b=8):
    vit_p = init_vit_params(jax.random.PRNGKey(0), CFG, depth=depth)
    head_p = init_head(jax.random.PRNGKey(1), "mlp", n_classes,
                       CFG.embed_dim)
    rs = np.random.RandomState(0)
    images = rs.randint(0, 255, (b, 48, 48, 3)).astype(np.uint8)
    labels = rs.randint(0, n_classes, (b, 36)).astype(np.int32)
    return vit_p, head_p, images, labels


def _leaf_specs(tree):
    return [getattr(x.sharding, "spec", None) for x in jax.tree.leaves(tree)
            if hasattr(x, "sharding")]


def test_fsdp_step_matches_replicated_and_stays_sharded():
    n_classes = 5
    vit_p, head_p, images, labels = _fixtures(n_classes=n_classes)
    opt = make_optimizer("adam", 1e-3)

    ref_step = make_train_step(CFG, "mlp", n_classes, opt,
                               freeze_backbone=False, donate=False)
    r_vit, r_head, r_opt, r_loss, _ = ref_step(
        vit_p, head_p, init_opt_state(opt, vit_p, head_p, False),
        images, labels)
    r_vit2, r_head2, _, r_loss2, _ = ref_step(r_vit, r_head, r_opt,
                                              images, labels)

    mesh = _mesh()
    fsdp_step = make_train_step(CFG, "mlp", n_classes, opt,
                                freeze_backbone=False, donate=False,
                                fsdp_mesh=mesh)
    f_vit, f_head, f_opt, f_loss, _ = fsdp_step(
        vit_p, head_p, init_opt_state(opt, vit_p, head_p, False),
        images, labels)

    # loss is pre-update: bit-close; params go through Adam's step-1
    # g/sqrt(g^2) which amplifies reduction-order noise (reduce-scatter
    # vs all-reduce sum order) -- same tolerance as tests/test_pipeline.py
    np.testing.assert_allclose(float(f_loss), float(r_loss), rtol=1e-6)
    for a, b_ in zip(jax.tree.leaves(f_vit), jax.tree.leaves(r_vit)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=1e-3)
    for a, b_ in zip(jax.tree.leaves(f_head), jax.tree.leaves(r_head)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=1e-3)

    # params STAY sharded: every divisible leaf carries the 'data' axis
    # and each device holds exactly 1/8 of it
    qkv = f_vit["blocks"][0]["attn"]["qkv"]["kernel"]
    assert "data" in tuple(qkv.sharding.spec)
    shard = qkv.addressable_shards[0]
    assert shard.data.shape[0] == qkv.shape[0] // 8
    # ... and so do the Adam moments (shape-driven rule covers the state)
    mom_specs = [sp for sp in _leaf_specs(f_opt) if sp is not None]
    assert any("data" in tuple(sp) for sp in mom_specs)

    # indivisible leaves (e.g. the 5-class head bias) replicate
    bias = f_head["layer_3"]["bias"]
    assert bias.sharding.spec in (P(), None) or all(
        p is None for p in bias.sharding.spec)

    # second step FED BACK the sharded params/state: still equals the
    # replicated trajectory (the entry constraint path on sharded inputs)
    f_vit2, f_head2, _, f_loss2, _ = fsdp_step(f_vit, f_head, f_opt,
                                               images, labels)
    np.testing.assert_allclose(float(f_loss2), float(r_loss2), rtol=1e-6)
    for a, b_ in zip(jax.tree.leaves(f_vit2), jax.tree.leaves(r_vit2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=1e-3)


def test_fsdp_zero_mutually_exclusive():
    import pytest
    opt = make_optimizer("adam", 1e-3)
    mesh = _mesh()
    with pytest.raises(ValueError, match="mutually exclusive"):
        make_train_step(CFG, "mlp", 5, opt, freeze_backbone=False,
                        fsdp_mesh=mesh, zero_mesh=mesh)


def test_fsdp_place_and_gather_guard():
    """fsdp_place puts array leaves straight into the sharded layout
    (python config leaves pass through); gather_if_sharded is the
    IDENTITY on host-local trees — the guard that keeps a restored,
    never-stepped state from being mis-concatenated across processes by
    a blind tiled allgather."""
    from dino_tpu.parallel.mesh import fsdp_place, gather_if_sharded
    mesh = _mesh()
    tree = {"w": jnp.ones((16, 4)), "meta": {"flag": True, "n": 3}}
    placed = fsdp_place(tree, mesh)
    assert placed["meta"] == {"flag": True, "n": 3}
    assert "data" in tuple(placed["w"].sharding.spec)
    assert placed["w"].addressable_shards[0].data.shape[0] == 2
    # single-process: everything is fully addressable -> identity,
    # sharded or not
    out = gather_if_sharded(placed)
    assert out["w"] is placed["w"] and out["meta"]["n"] == 3


def test_fsdp_spec_shape_rule():
    from dino_tpu.parallel.mesh import fsdp_spec
    mesh = _mesh()
    tree = {"a": jnp.zeros((16, 3)), "b": jnp.zeros((3, 5)),
            "c": jnp.zeros(()), "d": jnp.zeros((3, 24))}
    spec = fsdp_spec(tree, mesh)
    assert spec["a"] == P("data", None)   # first divisible dim
    assert spec["b"] == P()               # nothing divisible -> replicated
    assert spec["c"] == P()               # scalar
    assert spec["d"] == P(None, "data")   # divisibility found on dim 1
