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


def _unstack_stages(stages, n_stages: int):
    """Inverse of stack_block_stages: stacked (S, per, ...) -> block list."""
    per = jax.tree.leaves(stages)[0].shape[1]
    return [jax.tree.map(lambda t: np.asarray(t)[s, i], stages)
            for s in range(n_stages) for i in range(per)]


@pytest.mark.parametrize("n_stages,n_mb,remat", [(4, 2, False), (8, 2, True)])
def test_pp_train_step_matches_replicated(n_stages, n_mb, remat):
    """Training THROUGH the pipeline: one unfrozen Adam step under PP (the
    AD-generated reverse fill-drain) == the replicated make_train_step,
    including the stage-sharded block params and the replicated
    embedding/norm/head params."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dino_tpu.models.heads import init_head
    from dino_tpu.parallel.pipeline import (init_pp_train_state,
                                            make_pp_train_step)
    from dino_tpu.train.loop import (init_opt_state, make_optimizer,
                                     make_train_step)

    depth, n_classes = 8, 5
    vit_p = init_vit_params(jax.random.PRNGKey(0), CFG, depth=depth)
    head_p = init_head(jax.random.PRNGKey(1), "mlp", n_classes,
                       CFG.embed_dim)
    rs = np.random.RandomState(0)
    images = rs.randint(0, 255, (4, 48, 48, 3)).astype(np.uint8)
    labels = rs.randint(0, n_classes, (4, 36)).astype(np.int32)

    opt = make_optimizer("adam", 1e-3)
    ref_vit, ref_head, _, ref_loss, _ = make_train_step(
        CFG, "mlp", n_classes, opt, freeze_backbone=False, donate=False)(
        vit_p, head_p, init_opt_state(opt, vit_p, head_p, False),
        images, labels)

    mesh = Mesh(np.array(jax.devices()[:n_stages]), ("stage",))
    stages = jax.device_put(stack_block_stages(vit_p["blocks"], n_stages),
                            NamedSharding(mesh, P("stage")))
    rest = {k: v for k, v in vit_p.items() if k != "blocks"}
    pp_step = make_pp_train_step(CFG, "mlp", n_classes, opt, mesh,
                                 n_microbatches=n_mb, remat=remat)
    opt_state = init_pp_train_state(opt, stages, rest, head_p)
    new_stages, new_rest, new_head, _, pp_loss = pp_step(
        stages, rest, head_p, opt_state, images, labels)

    np.testing.assert_allclose(float(pp_loss), float(ref_loss), rtol=1e-5)
    for got, want in zip(_unstack_stages(new_stages, n_stages),
                         ref_vit["blocks"]):
        for g_l, w_l in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_allclose(g_l, np.asarray(w_l),
                                       atol=2e-4, rtol=1e-3)
    for k in rest:
        for g_l, w_l in zip(jax.tree.leaves(new_rest[k]),
                            jax.tree.leaves(ref_vit[k])):
            np.testing.assert_allclose(np.asarray(g_l), np.asarray(w_l),
                                       atol=2e-4, rtol=1e-3)
    for g_l, w_l in zip(jax.tree.leaves(new_head), jax.tree.leaves(ref_head)):
        np.testing.assert_allclose(np.asarray(g_l), np.asarray(w_l),
                                   atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("n_stages,n_mb,scan",
                         [(4, 2, False), (4, 6, False), (8, 4, False),
                          (4, 6, True)])
def test_pp_1f1b_train_step_matches_replicated(n_stages, n_mb, scan):
    """The hand-written 1F1B schedule (O(S) activation memory) computes the
    same Adam step as the replicated make_train_step — including M > 2S-1
    microbatches, where the ring-buffer stash actually wraps."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dino_tpu.models.heads import init_head
    from dino_tpu.parallel.pipeline import (init_pp_train_state,
                                            make_pp_1f1b_train_step)
    from dino_tpu.train.loop import (init_opt_state, make_optimizer,
                                     make_train_step)

    depth, n_classes = 8, 5
    vit_p = init_vit_params(jax.random.PRNGKey(0), CFG, depth=depth)
    head_p = init_head(jax.random.PRNGKey(1), "mlp", n_classes,
                       CFG.embed_dim)
    rs = np.random.RandomState(0)
    b = 2 * n_mb
    images = rs.randint(0, 255, (b, 48, 48, 3)).astype(np.uint8)
    labels = rs.randint(0, n_classes, (b, 36)).astype(np.int32)

    opt = make_optimizer("adam", 1e-3)
    ref_vit, ref_head, _, ref_loss, ref_cm = make_train_step(
        CFG, "mlp", n_classes, opt, freeze_backbone=False, donate=False)(
        vit_p, head_p, init_opt_state(opt, vit_p, head_p, False),
        images, labels)

    mesh = Mesh(np.array(jax.devices()[:n_stages]), ("stage",))
    stages = jax.device_put(stack_block_stages(vit_p["blocks"], n_stages),
                            NamedSharding(mesh, P("stage")))
    rest = {k: v for k, v in vit_p.items() if k != "blocks"}
    pp_step = make_pp_1f1b_train_step(CFG, "mlp", n_classes, opt, mesh,
                                      n_microbatches=n_mb, scan=scan)
    opt_state = init_pp_train_state(opt, stages, rest, head_p)
    new_stages, new_rest, new_head, _, pp_loss, pp_cm = pp_step(
        stages, rest, head_p, opt_state, images, labels)

    np.testing.assert_allclose(float(pp_loss), float(ref_loss), rtol=1e-5)
    # the head-slot train CM equals the replicated step's exactly (argmax
    # of the same f32 logits; counts are integers)
    np.testing.assert_array_equal(np.asarray(pp_cm), np.asarray(ref_cm))
    for got, want in zip(_unstack_stages(new_stages, n_stages),
                         ref_vit["blocks"]):
        for g_l, w_l in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_allclose(g_l, np.asarray(w_l),
                                       atol=2e-4, rtol=1e-3)
    for k in rest:
        for g_l, w_l in zip(jax.tree.leaves(new_rest[k]),
                            jax.tree.leaves(ref_vit[k])):
            np.testing.assert_allclose(np.asarray(g_l), np.asarray(w_l),
                                       atol=2e-4, rtol=1e-3)
    for g_l, w_l in zip(jax.tree.leaves(new_head), jax.tree.leaves(ref_head)):
        np.testing.assert_allclose(np.asarray(g_l), np.asarray(w_l),
                                   atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("n_stages,n_chunks,n_mb",
                         [(4, 2, 4), (4, 2, 2), (2, 4, 2), (8, 2, 8)])
def test_pp_interleaved_train_step_matches_replicated(n_stages, n_chunks,
                                                      n_mb):
    """Megatron's interleaved (virtual-chunk) placement: each device holds V
    non-contiguous depth slivers, activations wrap the ring V times, and the
    AD-reversed interleaved fill-drain computes the same Adam step as the
    replicated make_train_step — including M = S, where every ring slot is
    occupied during the steady state."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dino_tpu.models.heads import init_head
    from dino_tpu.parallel.pipeline import (init_pp_interleaved_train_state,
                                            make_pp_interleaved_train_step,
                                            stack_block_chunks)
    from dino_tpu.train.loop import (init_opt_state, make_optimizer,
                                     make_train_step)

    depth, n_classes = 16, 5
    vit_p = init_vit_params(jax.random.PRNGKey(0), CFG, depth=depth)
    head_p = init_head(jax.random.PRNGKey(1), "mlp", n_classes,
                       CFG.embed_dim)
    rs = np.random.RandomState(0)
    b = n_mb
    images = rs.randint(0, 255, (b, 48, 48, 3)).astype(np.uint8)
    labels = rs.randint(0, n_classes, (b, 36)).astype(np.int32)

    opt = make_optimizer("adam", 1e-3)
    ref_vit, ref_head, _, ref_loss, _ = make_train_step(
        CFG, "mlp", n_classes, opt, freeze_backbone=False, donate=False)(
        vit_p, head_p, init_opt_state(opt, vit_p, head_p, False),
        images, labels)

    mesh = Mesh(np.array(jax.devices()[:n_stages]), ("stage",))
    chunks = jax.device_put(
        stack_block_chunks(vit_p["blocks"], n_stages, n_chunks),
        NamedSharding(mesh, P(None, "stage")))
    rest = {k: v for k, v in vit_p.items() if k != "blocks"}
    pp_step = make_pp_interleaved_train_step(CFG, "mlp", n_classes, opt,
                                             mesh, n_chunks=n_chunks,
                                             n_microbatches=n_mb)
    opt_state = init_pp_interleaved_train_state(opt, chunks, rest, head_p)
    new_chunks, new_rest, new_head, _, pp_loss = pp_step(
        chunks, rest, head_p, opt_state, images, labels)

    np.testing.assert_allclose(float(pp_loss), float(ref_loss), rtol=1e-5)
    # unstack (V, S, per) -> depth order: block (v*S + s)*per + i
    per = depth // (n_stages * n_chunks)
    got_blocks = [
        jax.tree.map(lambda t: np.asarray(t)[v, s, i], new_chunks)
        for v in range(n_chunks) for s in range(n_stages)
        for i in range(per)]
    for got, want in zip(got_blocks, ref_vit["blocks"]):
        for g_l, w_l in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_allclose(g_l, np.asarray(w_l),
                                       atol=2e-4, rtol=1e-3)
    for k in rest:
        for g_l, w_l in zip(jax.tree.leaves(new_rest[k]),
                            jax.tree.leaves(ref_vit[k])):
            np.testing.assert_allclose(np.asarray(g_l), np.asarray(w_l),
                                       atol=2e-4, rtol=1e-3)
    for g_l, w_l in zip(jax.tree.leaves(new_head), jax.tree.leaves(ref_head)):
        np.testing.assert_allclose(np.asarray(g_l), np.asarray(w_l),
                                   atol=2e-4, rtol=1e-3)


def test_pp_interleaved_waves_accumulate_exactly():
    """waves=K sweeps K wave-slabs of M <= S microbatches through the
    pipeline and takes ONE optimizer update on the exact full-batch mean
    gradient — the interleaved schedule's gradient-accumulation form for
    batches larger than its M <= S wave."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dino_tpu.models.heads import init_head
    from dino_tpu.parallel.pipeline import (init_pp_interleaved_train_state,
                                            make_pp_interleaved_train_step,
                                            stack_block_chunks)
    from dino_tpu.train.loop import (init_opt_state, make_optimizer,
                                     make_train_step)

    n_stages, n_chunks, n_mb, waves = 4, 2, 2, 2
    depth, n_classes = 8, 5
    vit_p = init_vit_params(jax.random.PRNGKey(0), CFG, depth=depth)
    head_p = init_head(jax.random.PRNGKey(1), "mlp", n_classes,
                       CFG.embed_dim)
    rs = np.random.RandomState(0)
    b = waves * n_mb
    images = rs.randint(0, 255, (b, 48, 48, 3)).astype(np.uint8)
    labels = rs.randint(0, n_classes, (b, 36)).astype(np.int32)

    opt = make_optimizer("adam", 1e-3)
    ref_vit, ref_head, _, ref_loss, _ = make_train_step(
        CFG, "mlp", n_classes, opt, freeze_backbone=False, donate=False)(
        vit_p, head_p, init_opt_state(opt, vit_p, head_p, False),
        images, labels)

    mesh = Mesh(np.array(jax.devices()[:n_stages]), ("stage",))
    chunks = jax.device_put(
        stack_block_chunks(vit_p["blocks"], n_stages, n_chunks),
        NamedSharding(mesh, P(None, "stage")))
    rest = {k: v for k, v in vit_p.items() if k != "blocks"}
    pp_step = make_pp_interleaved_train_step(CFG, "mlp", n_classes, opt,
                                             mesh, n_chunks=n_chunks,
                                             n_microbatches=n_mb,
                                             waves=waves)
    opt_state = init_pp_interleaved_train_state(opt, chunks, rest, head_p)
    new_chunks, new_rest, new_head, _, pp_loss = pp_step(
        chunks, rest, head_p, opt_state, images, labels)

    np.testing.assert_allclose(float(pp_loss), float(ref_loss), rtol=1e-5)
    per = depth // (n_stages * n_chunks)
    got_blocks = [
        jax.tree.map(lambda t: np.asarray(t)[v, s, i], new_chunks)
        for v in range(n_chunks) for s in range(n_stages)
        for i in range(per)]
    for got, want in zip(got_blocks, ref_vit["blocks"]):
        for g_l, w_l in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_allclose(g_l, np.asarray(w_l),
                                       atol=2e-4, rtol=1e-3)
    for g_l, w_l in zip(jax.tree.leaves(new_head), jax.tree.leaves(ref_head)):
        np.testing.assert_allclose(np.asarray(g_l), np.asarray(w_l),
                                   atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("n_stages,n_chunks,n_mb,scan",
                         [(2, 2, 4, False),   # M = 2S: the case waves existed for
                          (4, 2, 8, False),   # M = 2S at S=4, ring wraps
                          (2, 2, 3, False),   # M % S != 0: partial last group
                          (2, 4, 2, False),   # deep chunking, M = S
                          (2, 2, 4, True)])   # lax.scan form, same table
def test_pp_interleaved_1f1b_matches_replicated(n_stages, n_chunks, n_mb,
                                                scan):
    """The hand-scheduled interleaved 1F1B: M > S microbatches run through
    the virtual-chunk placement in ONE schedule (no waves), each backward
    launching as its microbatch leaves chunk SV-1, with the 2SV-slot ring
    stash — and the Adam step equals the replicated make_train_step."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dino_tpu.models.heads import init_head
    from dino_tpu.parallel.pipeline import (
        init_pp_interleaved_train_state,
        make_pp_interleaved_1f1b_train_step, stack_block_chunks)
    from dino_tpu.train.loop import (init_opt_state, make_optimizer,
                                     make_train_step)

    depth, n_classes = 8, 5
    vit_p = init_vit_params(jax.random.PRNGKey(0), CFG, depth=depth)
    head_p = init_head(jax.random.PRNGKey(1), "mlp", n_classes,
                       CFG.embed_dim)
    rs = np.random.RandomState(0)
    b = 2 * n_mb
    images = rs.randint(0, 255, (b, 48, 48, 3)).astype(np.uint8)
    labels = rs.randint(0, n_classes, (b, 36)).astype(np.int32)

    opt = make_optimizer("adam", 1e-3)
    ref_vit, ref_head, _, ref_loss, ref_cm = make_train_step(
        CFG, "mlp", n_classes, opt, freeze_backbone=False, donate=False)(
        vit_p, head_p, init_opt_state(opt, vit_p, head_p, False),
        images, labels)

    mesh = Mesh(np.array(jax.devices()[:n_stages]), ("stage",))
    chunks = jax.device_put(
        stack_block_chunks(vit_p["blocks"], n_stages, n_chunks),
        NamedSharding(mesh, P(None, "stage")))
    rest = {k: v for k, v in vit_p.items() if k != "blocks"}
    pp_step = make_pp_interleaved_1f1b_train_step(
        CFG, "mlp", n_classes, opt, mesh, n_chunks=n_chunks,
        n_microbatches=n_mb, scan=scan)
    opt_state = init_pp_interleaved_train_state(opt, chunks, rest, head_p)
    new_chunks, new_rest, new_head, _, pp_loss, pp_cm = pp_step(
        chunks, rest, head_p, opt_state, images, labels)

    np.testing.assert_allclose(float(pp_loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(pp_cm), np.asarray(ref_cm))
    per = depth // (n_stages * n_chunks)
    got_blocks = [
        jax.tree.map(lambda t: np.asarray(t)[v, s, i], new_chunks)
        for v in range(n_chunks) for s in range(n_stages)
        for i in range(per)]
    for got, want in zip(got_blocks, ref_vit["blocks"]):
        for g_l, w_l in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_allclose(g_l, np.asarray(w_l),
                                       atol=2e-4, rtol=1e-3)
    for k in rest:
        for g_l, w_l in zip(jax.tree.leaves(new_rest[k]),
                            jax.tree.leaves(ref_vit[k])):
            np.testing.assert_allclose(np.asarray(g_l), np.asarray(w_l),
                                       atol=2e-4, rtol=1e-3)
    for g_l, w_l in zip(jax.tree.leaves(new_head), jax.tree.leaves(ref_head)):
        np.testing.assert_allclose(np.asarray(g_l), np.asarray(w_l),
                                   atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("maker_kind", ["contiguous", "interleaved"])
def test_pp_1f1b_bf16_stash_is_compute_dtype(maker_kind):
    """compute_dtype=bf16: the 1F1B schedules run their stage compute, stash
    ring, and both relays in bf16 (halving the schedule's memory bound) and
    still track the replicated bf16 step to bf16-level tolerance."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dino_tpu.models.heads import init_head
    from dino_tpu.parallel.pipeline import (
        init_pp_interleaved_train_state, init_pp_train_state,
        make_pp_1f1b_train_step, make_pp_interleaved_1f1b_train_step,
        stack_block_chunks, stack_block_stages)
    from dino_tpu.train.loop import (init_opt_state, make_optimizer,
                                     make_train_step)

    n_stages, n_mb, depth, n_classes = 2, 4, 8, 5
    vit_p = init_vit_params(jax.random.PRNGKey(0), CFG, depth=depth)
    head_p = init_head(jax.random.PRNGKey(1), "mlp", n_classes,
                       CFG.embed_dim)
    rs = np.random.RandomState(0)
    b = 2 * n_mb
    images = rs.randint(0, 255, (b, 48, 48, 3)).astype(np.uint8)
    labels = rs.randint(0, n_classes, (b, 36)).astype(np.int32)

    opt = make_optimizer("adam", 1e-3)
    ref_vit, ref_head, _, ref_loss, _ = make_train_step(
        CFG, "mlp", n_classes, opt, freeze_backbone=False, donate=False,
        compute_dtype=jnp.bfloat16)(
        vit_p, head_p, init_opt_state(opt, vit_p, head_p, False),
        images, labels)

    mesh = Mesh(np.array(jax.devices()[:n_stages]), ("stage",))
    rest = {k: v for k, v in vit_p.items() if k != "blocks"}
    if maker_kind == "contiguous":
        stages = jax.device_put(
            stack_block_stages(vit_p["blocks"], n_stages),
            NamedSharding(mesh, P("stage")))
        step = make_pp_1f1b_train_step(
            CFG, "mlp", n_classes, opt, mesh, n_microbatches=n_mb,
            compute_dtype=jnp.bfloat16)
        opt_state = init_pp_train_state(opt, stages, rest, head_p)
        new_bb, new_rest, new_head, _, pp_loss, _cm = step(
            stages, rest, head_p, opt_state, images, labels)
    else:
        chunks = jax.device_put(
            stack_block_chunks(vit_p["blocks"], n_stages, 2),
            NamedSharding(mesh, P(None, "stage")))
        step = make_pp_interleaved_1f1b_train_step(
            CFG, "mlp", n_classes, opt, mesh, n_chunks=2,
            n_microbatches=n_mb, compute_dtype=jnp.bfloat16)
        opt_state = init_pp_interleaved_train_state(opt, chunks, rest,
                                                    head_p)
        new_bb, new_rest, new_head, _, pp_loss, _cm = step(
            chunks, rest, head_p, opt_state, images, labels)

    # bf16 compute reduces in a different order than the replicated step's
    # single-pass bf16 graph: bf16-level tolerance, NOT the f32 2e-4 gate
    np.testing.assert_allclose(float(pp_loss), float(ref_loss), rtol=2e-2,
                               atol=2e-2)
    for g_l, w_l in zip(jax.tree.leaves(new_head), jax.tree.leaves(ref_head)):
        np.testing.assert_allclose(np.asarray(g_l), np.asarray(w_l),
                                   atol=5e-3, rtol=5e-2)

    # the memory claim is structural: the (cap, mb, N, D) stash ring must
    # lower as a bf16 HLO tensor (CPU XLA upcasts bf16 COMPUTE to f32
    # buffers, so whole-program temp can't show the halving here — see
    # docs/SCALING.md "Stash dtype"; the ring dtype is checkable anywhere)
    cap = 2 * n_stages if maker_kind == "contiguous" else 2 * n_stages * 2
    mb = b // n_mb
    n_tok = 36 + 1
    hlo = step.lower(*((stages, rest, head_p, opt_state, images, labels)
                       if maker_kind == "contiguous" else
                       (chunks, rest, head_p, opt_state, images, labels))
                     ).as_text()
    ring_ty = f"tensor<{cap}x{mb}x{n_tok}x{CFG.embed_dim}xbf16>"
    assert ring_ty in hlo, f"stash ring not bf16 ({ring_ty} absent)"


def test_pp_interleaved_constraints():
    """M > S and indivisible depth are rejected with actionable messages."""
    from dino_tpu.parallel.pipeline import (make_pp_interleaved_train_step,
                                            stack_block_chunks)
    from dino_tpu.train.loop import make_optimizer

    mesh = Mesh(np.array(jax.devices()[:4]), ("stage",))
    with pytest.raises(ValueError, match="accumulate gradients"):
        make_pp_interleaved_train_step(CFG, "mlp", 5, make_optimizer(
            "adam", 1e-3), mesh, n_chunks=2, n_microbatches=8)
    p = init_vit_params(jax.random.PRNGKey(0), CFG, depth=6)
    with pytest.raises(ValueError, match="not divisible"):
        stack_block_chunks(p["blocks"], 4, 2)


def test_pp_tp_forward_matches_replicated():
    """3-axis composition forward: batch over data, blocks pipelined over
    stage, block math Megatron-split over model — equals the replicated
    forward on the (data=2, stage=2, model=2) virtual mesh."""
    from dino_tpu.parallel.pipeline import vit_forward_pp_tp

    p = init_vit_params(jax.random.PRNGKey(0), CFG, depth=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 48, 48, 3), jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 2, 2),
                ("data", "stage", "model"))
    out = vit_forward_pp_tp(p, x, CFG, mesh, n_microbatches=2, flash="off")
    ref = vit_forward(p, x, CFG, use_flash=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("remat", [False, True])
def test_dp_pp_tp_train_step_matches_replicated(remat):
    """Training through all three axes at once: one unfrozen Adam step on
    the (data=2, stage=2, model=2) mesh == the replicated make_train_step
    (standard param layout, so the comparison is leaf-by-leaf direct)."""
    from dino_tpu.models.heads import init_head
    from dino_tpu.parallel.pipeline import make_dp_pp_tp_train_step
    from dino_tpu.train.loop import (init_opt_state, make_optimizer,
                                     make_train_step)

    depth, n_classes = 4, 5
    vit_p = init_vit_params(jax.random.PRNGKey(0), CFG, depth=depth)
    head_p = init_head(jax.random.PRNGKey(1), "mlp", n_classes,
                       CFG.embed_dim)
    rs = np.random.RandomState(0)
    images = rs.randint(0, 255, (4, 48, 48, 3)).astype(np.uint8)
    labels = rs.randint(0, n_classes, (4, 36)).astype(np.int32)

    opt = make_optimizer("adam", 1e-3)
    ref_vit, ref_head, _, ref_loss, ref_cm = make_train_step(
        CFG, "mlp", n_classes, opt, freeze_backbone=False, donate=False)(
        vit_p, head_p, init_opt_state(opt, vit_p, head_p, False),
        images, labels)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 2, 2),
                ("data", "stage", "model"))
    step = make_dp_pp_tp_train_step(CFG, "mlp", n_classes, opt, mesh,
                                    n_microbatches=2, flash="off",
                                    remat=remat)
    opt_state = init_opt_state(opt, vit_p, head_p, False)
    new_vit, new_head, _, loss, cm = step(vit_p, head_p, opt_state,
                                          images, labels)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(cm), np.asarray(ref_cm))
    for g_l, w_l in zip(jax.tree.leaves(new_vit), jax.tree.leaves(ref_vit)):
        np.testing.assert_allclose(np.asarray(g_l), np.asarray(w_l),
                                   atol=2e-4, rtol=1e-3)
    for g_l, w_l in zip(jax.tree.leaves(new_head), jax.tree.leaves(ref_head)):
        np.testing.assert_allclose(np.asarray(g_l), np.asarray(w_l),
                                   atol=2e-4, rtol=1e-3)


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


@pytest.mark.parametrize("maker_kind,scan", [("contiguous", False),
                                             ("contiguous", True),
                                             ("interleaved", False)])
def test_pp_1f1b_ragged_tail_mask_matches_replicated(maker_kind, scan):
    """Ragged-tail batches under both 1F1B schedules: padded samples are
    excluded from loss, gradients, AND the train CM exactly as in the
    plain step — the schedule's masked-mean divide is the whole-batch
    weight total, not the padded token count (reference trains on partial
    batches, pl_torch_modules.py:354)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dino_tpu.models.heads import init_head
    from dino_tpu.parallel.pipeline import (
        init_pp_interleaved_train_state, init_pp_train_state,
        make_pp_1f1b_train_step, make_pp_interleaved_1f1b_train_step,
        stack_block_chunks, stack_block_stages)
    from dino_tpu.train.loop import (init_opt_state, make_optimizer,
                                     make_train_step)

    n_stages, n_mb, depth, n_classes = 2, 4, 8, 5
    b = 2 * n_mb
    n_real = b - 3                              # ragged: 3 padded samples
    vit_p = init_vit_params(jax.random.PRNGKey(0), CFG, depth=depth)
    head_p = init_head(jax.random.PRNGKey(1), "mlp", n_classes,
                       CFG.embed_dim)
    rs = np.random.RandomState(0)
    images = rs.randint(0, 255, (b, 48, 48, 3)).astype(np.uint8)
    labels = rs.randint(0, n_classes, (b, 36)).astype(np.int32)
    mask = np.zeros((b,), np.float32)
    mask[:n_real] = 1.0

    opt = make_optimizer("adam", 1e-3)
    ref_vit, ref_head, _, ref_loss, ref_cm = make_train_step(
        CFG, "mlp", n_classes, opt, freeze_backbone=False, donate=False)(
        vit_p, head_p, init_opt_state(opt, vit_p, head_p, False),
        images, labels, mask)

    mesh = Mesh(np.array(jax.devices()[:n_stages]), ("stage",))
    rest = {k: v for k, v in vit_p.items() if k != "blocks"}
    if maker_kind == "contiguous":
        stages = jax.device_put(
            stack_block_stages(vit_p["blocks"], n_stages),
            NamedSharding(mesh, P("stage")))
        step = make_pp_1f1b_train_step(CFG, "mlp", n_classes, opt, mesh,
                                       n_microbatches=n_mb, scan=scan)
        opt_state = init_pp_train_state(opt, stages, rest, head_p)
        new_bb, new_rest, new_head, _, pp_loss, pp_cm = step(
            stages, rest, head_p, opt_state, images, labels, mask)
        got_blocks = _unstack_stages(new_bb, n_stages)
    else:
        n_chunks = 2
        chunks = jax.device_put(
            stack_block_chunks(vit_p["blocks"], n_stages, n_chunks),
            NamedSharding(mesh, P(None, "stage")))
        step = make_pp_interleaved_1f1b_train_step(
            CFG, "mlp", n_classes, opt, mesh, n_chunks=n_chunks,
            n_microbatches=n_mb, scan=scan)
        opt_state = init_pp_interleaved_train_state(opt, chunks, rest,
                                                    head_p)
        new_bb, new_rest, new_head, _, pp_loss, pp_cm = step(
            chunks, rest, head_p, opt_state, images, labels, mask)
        per = depth // (n_stages * n_chunks)
        got_blocks = [
            jax.tree.map(lambda t: np.asarray(t)[v, s, i], new_bb)
            for v in range(n_chunks) for s in range(n_stages)
            for i in range(per)]

    np.testing.assert_allclose(float(pp_loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(pp_cm), np.asarray(ref_cm))
    assert int(np.asarray(pp_cm).sum()) == n_real * 36  # pads not counted
    for got, want in zip(got_blocks, ref_vit["blocks"]):
        for g_l, w_l in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_allclose(g_l, np.asarray(w_l),
                                       atol=2e-4, rtol=1e-3)
    for g_l, w_l in zip(jax.tree.leaves(new_head), jax.tree.leaves(ref_head)):
        np.testing.assert_allclose(np.asarray(g_l), np.asarray(w_l),
                                   atol=2e-4, rtol=1e-3)
