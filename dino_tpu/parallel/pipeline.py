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
