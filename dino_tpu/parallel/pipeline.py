"""Pipeline parallelism (PP): GPipe-style ViT block stages over a mesh axis.

The reference is single-GPU (SURVEY §2.3: no TP/PP/SP anywhere); this module
extends the parallelism matrix for deep backbones: blocks are partitioned
contiguously into S stages (one per device along ``stage_axis``), the batch
splits into M microbatches, and activations flow stage-to-stage with
``lax.ppermute`` over ICI inside one ``shard_map`` — the TPU-native
equivalent of a NCCL send/recv pipeline, compiled into a single XLA program.

Schedule: plain GPipe fill-drain, T = M + S - 1 ticks.  At tick t, stage s
works on microbatch (t - s) when 0 <= t - s < M; inactive ticks run the same
block math on garbage and mask the result (static shapes, no data-dependent
control flow — XLA-friendly).  Bubble fraction = (S-1)/T, amortized by M.

Param layout: per-stage block slabs stacked on a leading axis, sharded
P("stage") — each device holds only its own blocks' weights (the memory
win PP exists for).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dino_tpu.models.vit import (ViTConfig, block_apply, layer_norm,
                                 prepare_tokens)

from jax import shard_map

Params = Dict[str, Any]


def stack_block_stages(blocks: list, n_stages: int):
    """[depth x block-pytree] -> pytree with leading (n_stages, depth//S)
    axes, ready to shard P('stage') on axis 0."""
    depth = len(blocks)
    if depth % n_stages != 0:
        raise ValueError(f"depth {depth} not divisible by {n_stages} stages")
    per = depth // n_stages
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return jax.tree.map(
        lambda x: x.reshape((n_stages, per) + x.shape[1:]), stacked)


def vit_forward_pipelined(params: Params, x: jnp.ndarray, cfg: ViTConfig,
                          mesh: Mesh, stage_axis: str = "stage",
                          n_microbatches: int = 2,
                          use_flash: bool = True) -> jnp.ndarray:
    """Full ViT forward with blocks pipelined over ``stage_axis``.

    x: (B, H, W, 3) with B % n_microbatches == 0. Returns (B, 1+N, D) normed
    tokens, numerically equal to ``vit_forward`` (tested on the virtual CPU
    mesh).  Embedding/positional work runs on every device (it is ~1% of the
    FLOPs and keeps stage 0 from being a special shape).
    """
    n_stages = mesh.shape[stage_axis]
    n_mb = n_microbatches
    b = x.shape[0]
    if b % n_mb != 0:
        raise ValueError(f"batch {b} not divisible by {n_mb} microbatches")

    stages = stack_block_stages(params["blocks"], n_stages)
    rest = {k: v for k, v in params.items() if k != "blocks"}

    def run(stages_local, rest_rep, x_rep):
        s = jax.lax.axis_index(stage_axis)
        stages_local = jax.tree.map(lambda t: t[0], stages_local)  # (per,...)
        per = jax.tree.leaves(stages_local)[0].shape[0]

        tokens = prepare_tokens(rest_rep, x_rep, cfg)       # (B, 1+N, D)
        mbs = tokens.reshape((n_mb, b // n_mb) + tokens.shape[1:])

        def my_stage(h):
            def body(h, blk):
                return block_apply(blk, h, cfg, use_flash=use_flash)[0], None
            # python loop over the stage's blocks (per is small and static)
            for i in range(per):
                blk = jax.tree.map(lambda t: t[i], stages_local)
                h, _ = body(h, blk)
            return h

        out = jnp.zeros_like(mbs)
        recv = jnp.zeros_like(mbs[0])
        last = n_stages - 1
        for t in range(n_mb + n_stages - 1):   # static fill-drain schedule
            # stage 0 injects microbatch t; others consume the permuted recv
            mb_in = mbs[min(t, n_mb - 1)]
            h_in = jnp.where(s == 0, mb_in, recv)
            y = my_stage(h_in)
            # last stage banks finished microbatch (t - last); t is static
            mb_idx = t - last
            if 0 <= mb_idx < n_mb:
                out = jnp.where(s == last, out.at[mb_idx].set(y), out)
            recv = jax.lax.ppermute(
                y, stage_axis,
                [(i, (i + 1) % n_stages) for i in range(n_stages)])
        # replicate the last stage's banked outputs to every device
        out = jax.lax.psum(
            jnp.where(s == last, out, jnp.zeros_like(out)), stage_axis)
        tokens_out = out.reshape(tokens.shape)
        return layer_norm(rest_rep["norm"], tokens_out, cfg.ln_eps)

    fn = shard_map(run, mesh=mesh,
                   in_specs=(P(stage_axis), P(), P()),
                   out_specs=P(), check_vma=False)
    stages_sharded = jax.device_put(
        stages, NamedSharding(mesh, P(stage_axis)))
    return fn(stages_sharded, rest, x)


# ---------------------------------------------------------------------------
# Pipeline-parallel training (GPipe with the AD-generated reverse schedule)
# ---------------------------------------------------------------------------

def make_pp_train_step(cfg: ViTConfig, head_type: str, n_classes: int,
                       optimizer, mesh: Mesh, stage_axis: str = "stage",
                       n_microbatches: int = 2, use_flash: bool = True,
                       remat: bool = False, donate: bool = False):
    """Unfrozen train step with the backbone blocks pipelined over stages.

    step(stages, rest, head_p, opt_state, images_u8, labels) ->
    (stages, rest, head_p, opt_state, loss), where ``stages`` is the stacked
    per-stage block pytree from :func:`stack_block_stages`, sharded
    ``P(stage_axis)`` (each device holds and updates ONLY its own blocks'
    weights and optimizer moments — the memory win PP exists for).

    The backward schedule is not hand-written: differentiating the
    fill-drain forward transposes every ``ppermute`` hop into the reverse
    hop, so AD generates the drain-fill backward pipeline automatically
    (T = M + S - 1 reverse ticks).  Gradient bookkeeping is made exact by
    construction: the NLL is computed on every device but gated to the LAST
    stage (``where(s == last, nll, 0)``), so the output cotangent enters the
    pipeline exactly once and flows back stage-to-stage; embedding grads
    land on stage 0, final-norm/head grads on the last stage, and one psum
    over ``stage_axis`` assembles the replicated-parameter grads while the
    per-stage block grads stay sharded (out_spec ``P(stage_axis)``) —
    matching the replicated step's gradient to reduction-order tolerance
    (tests/test_pipeline.py).  ``remat=True`` rematerializes each pipeline
    tick on the backward (activation memory ~1 tick instead of M+S-1).
    """
    from dino_tpu.models.heads import head_apply
    from dino_tpu.ops.preprocess import normalize_imagenet

    n_stages = mesh.shape[stage_axis]
    n_mb = n_microbatches
    last = n_stages - 1
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def step(stages, rest, head_p, opt_state, images, labels):
        x = normalize_imagenet(images)
        b = x.shape[0]
        if b % n_mb != 0:
            raise ValueError(f"batch {b} not divisible by {n_mb} microbatches")

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(stage_axis), P(), P(), P(), P()),
                 out_specs=(P(), P(stage_axis), P(), P()), check_vma=False)
        def value_and_grads(stages_in, rest_in, head_in, x_rep, y_rep):
            s = jax.lax.axis_index(stage_axis)

            def local_loss(ps):
                stages_local, rest, head_p = ps
                st = jax.tree.map(lambda t: t[0], stages_local)
                per = jax.tree.leaves(st)[0].shape[0]
                tokens = prepare_tokens(rest, x_rep, cfg)
                mbs = tokens.reshape((n_mb, b // n_mb) + tokens.shape[1:])

                def my_stage(h):
                    for i in range(per):
                        blk = jax.tree.map(lambda t: t[i], st)
                        h = block_apply(blk, h, cfg, use_flash=use_flash)[0]
                    return h
                if remat:
                    my_stage = jax.checkpoint(my_stage)

                out = jnp.zeros_like(mbs)
                recv = jnp.zeros_like(mbs[0])
                for t in range(n_mb + n_stages - 1):  # static fill-drain
                    mb_in = mbs[min(t, n_mb - 1)]
                    h_in = jnp.where(s == 0, mb_in, recv)
                    y = my_stage(h_in)
                    mb_idx = t - last
                    if 0 <= mb_idx < n_mb:
                        out = jnp.where(s == last, out.at[mb_idx].set(y), out)
                    recv = jax.lax.ppermute(y, stage_axis, perm)
                tokens_out = out.reshape(tokens.shape)
                normed = layer_norm(rest["norm"], tokens_out, cfg.ln_eps)
                feats = normed[:, 1:, :].reshape(-1, normed.shape[-1])
                logp = head_apply(head_type, head_p, feats)
                picked = jnp.take_along_axis(
                    logp, y_rep.reshape(-1)[:, None].astype(jnp.int32),
                    axis=1)[:, 0]
                nll = -jnp.mean(picked)
                # gate to the last stage: non-last devices ran the head on
                # zero-banked garbage, and the gate both kills their loss
                # contribution AND zeroes their cotangents, so every
                # gradient path is counted exactly once
                return jnp.where(s == last, nll, 0.0)

            loss, (g_st, g_rest, g_head) = jax.value_and_grad(local_loss)(
                (stages_in, rest_in, head_in))
            loss = jax.lax.psum(loss, stage_axis)
            g_rest = jax.tree.map(lambda t: jax.lax.psum(t, stage_axis),
                                  g_rest)
            g_head = jax.tree.map(lambda t: jax.lax.psum(t, stage_axis),
                                  g_head)
            return loss, g_st, g_rest, g_head

        loss, g_st, g_rest, g_head = value_and_grads(stages, rest, head_p,
                                                     x, labels)
        params = {"stages": stages, "rest": rest, "head": head_p}
        grads = {"stages": g_st, "rest": g_rest, "head": g_head}
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params["stages"], params["rest"], params["head"], opt_state,
                loss)

    return jax.jit(step, donate_argnums=(0, 1, 2, 3) if donate else ())


def init_pp_train_state(optimizer, stages, rest, head_p):
    """Optimizer state over the PP param layout ({stages, rest, head});
    stage moments shard with the stage params."""
    return optimizer.init({"stages": stages, "rest": rest, "head": head_p})
