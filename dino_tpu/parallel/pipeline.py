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
                       remat: bool = False, donate: bool = False,
                       moe_dispatch: str = "dense",
                       moe_capacity: float = 1.25):
    """Unfrozen train step with the backbone blocks pipelined over stages.

    step(stages, rest, head_p, opt_state, images_u8, labels) ->
    (stages, rest, head_p, opt_state, loss), where ``stages`` is the stacked
    per-stage block pytree from :func:`stack_block_stages`, sharded
    ``P(stage_axis)`` (each device holds and updates ONLY its own blocks'
    weights and optimizer moments — the memory win PP exists for).

    The backward schedule is not hand-written: differentiating the
    fill-drain forward transposes every ``ppermute`` hop into the reverse
    hop, so AD generates the drain-fill backward pipeline automatically
    (T = M + S - 1 reverse ticks).  The final norm + head are SHARDED over
    the stages: a psum replicates the last stage's banked tokens, each
    device scores its 1/S chunk of the patch tokens, and the psum's
    transpose assembles the full output cotangent back on the last stage —
    so the output cotangent enters the pipeline exactly once and flows back
    stage-to-stage; embedding grads land on stage 0, and one psum over
    ``stage_axis`` assembles the replicated-parameter (rest/head) grads
    while the per-stage block grads stay sharded (out_spec
    ``P(stage_axis)``) — matching the replicated step's gradient to
    reduction-order tolerance (tests/test_pipeline.py).  ``remat=True``
    rematerializes each pipeline tick on the backward (activation memory
    ~1 tick instead of M+S-1).
    """
    from dino_tpu.models.heads import head_apply
    from dino_tpu.ops.preprocess import normalize_imagenet

    if head_type not in ("mlp", "linear", "moe"):
        raise ValueError(f"unknown head for PP training: {head_type!r}")
    if head_type == "moe" and moe_dispatch == "sparse":
        raise ValueError("PP training with moe_dispatch='sparse' changes "
                         "the capacity semantics (slots allocate per stage "
                         "chunk, not per batch, so different patches drop) "
                         "— use the dense dispatch")
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
                # Final norm + head, sharded over the stages: one psum
                # replicates the last stage's banked tokens, then each
                # device norms/scores only ITS 1/S chunk of the patch
                # tokens and returns its partial of the global-mean NLL —
                # instead of every device running head fwd+bwd over the
                # full B*N tokens gated by where(s == last, ...), which
                # wastes (S-1)/S of the head work on zero-banked garbage.
                # Gradient exactness: the psum transposes to a psum of the
                # chunk cotangents, so the full output cotangent assembles
                # on the last stage and the AD-reversed pipeline carries it
                # back as before (probed + grad-equality-tested).
                full = jax.lax.psum(
                    jnp.where(s == last, out, jnp.zeros_like(out)),
                    stage_axis)
                feats = full.reshape(tokens.shape)[:, 1:, :]
                feats = feats.reshape(-1, feats.shape[-1])   # (B*N, D)
                y_all = y_rep.reshape(-1).astype(jnp.int32)
                total = feats.shape[0]
                pad = (-total) % n_stages
                if pad:  # dead padding rows so chunks are equal-sized
                    feats = jnp.pad(feats, ((0, pad), (0, 0)))
                    y_all = jnp.pad(y_all, (0, pad))
                chunk = (total + pad) // n_stages
                my_f = jax.lax.dynamic_slice_in_dim(feats, s * chunk,
                                                    chunk, 0)
                my_y = jax.lax.dynamic_slice_in_dim(y_all, s * chunk,
                                                    chunk, 0)
                w = (jnp.arange(chunk) + s * chunk < total).astype(
                    jnp.float32)
                normed = layer_norm(rest["norm"], my_f, cfg.ln_eps)
                logp = head_apply(head_type, head_p, normed,
                                  moe_dispatch=moe_dispatch,
                                  moe_capacity=moe_capacity)
                picked = jnp.take_along_axis(logp, my_y[:, None],
                                             axis=1)[:, 0]
                # partial of -mean over the B*N real tokens; the psum
                # after value_and_grad assembles the total (as it already
                # does for g_rest/g_head)
                partial = -jnp.sum(picked * w) / total
                if head_type == "moe":
                    # Switch balance auxiliary from psum'd E-dim statistics
                    # (2E+1 floats cross the stages, not the features); w
                    # zeros this chunk's dead padding rows, so the global
                    # f/pbar equal the monolithic step's.  Each stage adds
                    # balance/S because the caller psums the loss; the
                    # gradient flows only through the gate-prob sums (psum
                    # transpose = psum), riding the same feats cotangent
                    # transport as the NLL (tests/test_moe.py).
                    from dino_tpu.models.heads import moe_balance_stats
                    a_l, b_l, w_l = moe_balance_stats(head_p, normed,
                                                      weights=w)
                    a_g = jax.lax.psum(a_l, stage_axis)
                    b_g = jax.lax.psum(b_l, stage_axis)
                    w_g = jnp.maximum(jax.lax.psum(w_l, stage_axis), 1.0)
                    balance = a_g.shape[0] * jnp.dot(a_g / w_g, b_g / w_g)
                    partial = partial + 0.01 * balance / n_stages
                return partial

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


# ---------------------------------------------------------------------------
# 1F1B (PipeDream-flush) schedule: activation memory O(S), not O(M)
# ---------------------------------------------------------------------------

def make_pp_1f1b_train_step(cfg: ViTConfig, head_type: str, n_classes: int,
                            optimizer, mesh: Mesh, stage_axis: str = "stage",
                            n_microbatches: int = 2, use_flash: bool = True,
                            scan: bool = False, compute_dtype=None,
                            donate: bool = False):
    """PP train step on a hand-written 1F1B schedule.

    step(stages, rest, head_p, opt_state, images_u8, labels, mask=None) ->
    (stages, rest, head_p, opt_state, loss, cm) — make_train_step's loss/
    CM/mask contract on make_pp_train_step's stage-sharded param layout.
    ``mask`` (per-sample 0/1, shape (B,)) excludes padded ragged-tail
    samples from loss, gradients, AND the confusion matrix: each head-slot
    microbatch contributes its weighted SUM of per-patch NLLs and the
    single divide by the global weight total happens in the per-microbatch
    cotangent (the weight total is a whole-batch scalar computed before
    the sweep), so the masked-mean semantics are identical to the plain
    step (train/loop.py:nll_loss) — the reference trains on partial
    batches, pl_torch_modules.py:354.  The (C, C) train CM is assembled on
    the head slot of the last stage and psum'd (zeros elsewhere), giving
    fit('pp') the same per-epoch train metrics as every other mode.

    Why it exists: differentiating the GPipe fill-drain (``make_pp_train_step``)
    keeps one stashed activation per *tick* live across the whole forward
    sweep — O(M + S) microbatch activations at peak, so raising M to amortize
    the (S-1)/T bubble raises peak memory with it.  The production schedule
    (PipeDream-flush / 1F1B, the default in Megatron-LM) starts each
    microbatch's backward as soon as its forward leaves the last stage, so a
    stage never holds more than O(S) stashes no matter how large M is.

    TPU-native formulation: one SPMD program over ``stage_axis``, Python-
    unrolled over T = M + 2S - 1 ticks.  Each tick every device runs one
    forward slot and one backward slot (masked by its ``axis_index`` when its
    lane is outside the wave), with two ``ppermute`` hops per tick —
    activations ride +1 along the ring, cotangents ride -1.  Tick table
    (stage s, microbatch m):

        forward   f(m, s)  at tick  m + s
        head vjp  (s = S-1) at tick  m + S - 1   (right after its forward)
        backward  b(m, s)  at tick  m + (2S - 1 - s)

    so a microbatch's backward trails its forward by 2(S - s) - 1 ticks.
    The stage *input* is stashed in a 2S-slot ring buffer; the backward slot
    re-runs its stage under ``jax.vjp`` from the stashed input (recompute ==
    ``remat=True``'s FLOP trade) and reads its slot at the device-dependent
    index (t - (2S-1) + 2s) mod 2S — always within the last 2S-1 writes, and
    never the slot written this tick (the offset is odd).  Peak live state is
    therefore structurally bounded: one ring buffer of 2S microbatch
    activations + one in-flight vjp — independent of M (measured: see
    docs/SCALING.md "pipeline schedules").  Embedding and head grads are
    recomputed per-microbatch at the tick where their cotangent exists
    (masked to stage 0 / S-1), so no O(M) token or cotangent buffer is ever
    allocated.  Gradients match the replicated step to reduction order
    (tests/test_pipeline.py::test_pp_1f1b_train_step_matches_replicated).

    The head lives on the last stage (the standard 1F1B placement): its
    per-microbatch vjp must produce the output cotangent the moment the
    forward leaves the pipe, so it cannot be chunk-sharded across stages
    the way the GPipe step's barrier-style head is — every device runs the
    masked head math and (S-1)/S of it is discarded.  That is the same
    trade Megatron makes; the head is ~1% of a deep backbone's FLOPs,
    which is the regime PP exists for.

    ``scan=True`` rolls the tick into one ``lax.scan`` body (static window
    gates become masks, static microbatch indices become dynamic slices):
    identical math and memory bound, but HLO size and compile time become
    O(1) in M instead of O(M) — the form to use at production microbatch
    counts.  The unrolled default gives XLA per-tick scheduling freedom and
    skips out-of-window slots at the edges, so it stays default for small M.

    ``compute_dtype=jnp.bfloat16`` runs the stage compute in bf16 (params
    stay f32 masters; the loss reduction stays f32) — and because the ring
    stash, both ppermute relays, and the pending head cotangent all carry
    the activation dtype, the schedule's entire O(S) memory story (and its
    ICI byte count) halves with it.  The stash is the value actually fed to
    the stage, so the recompute-from-stash backward is bit-consistent with
    the forward — no extra rounding beyond bf16 compute itself.

    Reference: single-GPU, no PP (SURVEY §2.3); this extends the dormant DDP
    scaffolding's role (utils.py:467-499) the TPU way.
    """
    from dino_tpu.models.heads import head_apply
    from dino_tpu.ops.preprocess import normalize_imagenet
    from dino_tpu.train.metrics import confusion_matrix

    if head_type not in ("mlp", "linear"):
        # MoE composes with the GPipe PP step (make_pp_train_step: its
        # barrier-style head sees the full batch, so the psum'd E-dim
        # balance statistics are exact) but NOT with 1F1B: here each
        # microbatch's head backward launches the tick its forward leaves
        # the pipe — before the full-batch routing fractions f exist —
        # and the balance gradient needs f (grad = 0.01*E/W * f . db_k).
        # Making f available would take a second full forward sweep per
        # step, which surrenders exactly the memory/latency edge 1F1B has
        # over GPipe; use make_pp_train_step for MoE+PP instead.
        raise ValueError(f"1F1B PP training supports the mlp/linear heads; "
                         f"got {head_type!r} (for head='moe' use the GPipe "
                         f"step make_pp_train_step — see the guard comment)")
    n_stages = mesh.shape[stage_axis]
    n_mb = n_microbatches
    last = n_stages - 1
    cap = 2 * n_stages                       # ring-buffer slots
    perm_f = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    perm_b = [(i, (i - 1) % n_stages) for i in range(n_stages)]

    act_dtype = compute_dtype if compute_dtype is not None else jnp.float32

    def step(stages, rest, head_p, opt_state, images, labels, mask=None):
        x = normalize_imagenet(images)
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
        b = x.shape[0]
        if b % n_mb != 0:
            raise ValueError(f"batch {b} not divisible by {n_mb} microbatches")
        mb = b // n_mb
        n_pat = labels.shape[-1]
        m = (jnp.ones((b,), jnp.float32) if mask is None
             else mask.astype(jnp.float32))
        # global weight total for the masked mean: a whole-batch scalar, so
        # every microbatch's loss partial (and its cotangent) can divide by
        # it up front — grads of the weighted sums then add exactly
        w_total = jnp.maximum(jnp.sum(m) * n_pat, 1.0)
        x_mbs = x.reshape((n_mb, mb) + x.shape[1:])
        y_mbs = labels.reshape(n_mb, mb, n_pat)
        w_mbs = m.reshape(n_mb, mb)

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(stage_axis), P(), P(), P(), P(), P(), P()),
                 out_specs=(P(), P(stage_axis), P(), P(), P()),
                 check_vma=False)
        def value_and_grads(stages_in, rest_in, head_in, x_in, y_in, w_in,
                            w_tot):
            s = jax.lax.axis_index(stage_axis)
            st = jax.tree.map(lambda t: t[0], stages_in)       # (per, ...)
            per = jax.tree.leaves(st)[0].shape[0]

            def stage_fwd(st_p, h):
                for i in range(per):
                    blk = jax.tree.map(lambda t, i=i: t[i], st_p)
                    h = block_apply(blk, h, cfg, use_flash=use_flash)[0]
                return h

            def head_loss(rest_r, head_r, tokens):
                feats = tokens[:, 1:, :].reshape(-1, cfg.embed_dim)
                normed = layer_norm(rest_r["norm"], feats, cfg.ln_eps)
                logp = head_apply(head_type, head_r, normed)
                return logp                   # (mb*n_pat, C)

            def mb_loss(rest_r, head_r, tokens, y_lab, w_s):
                logp = head_loss(rest_r, head_r, tokens)
                yi = y_lab.reshape(-1).astype(jnp.int32)
                w = jnp.repeat(w_s, n_pat)           # per-patch 0/1 weights
                picked = jnp.take_along_axis(logp, yi[:, None], axis=1)[:, 0]
                # partial of the global masked mean; f32 under bf16 compute
                loss = -jnp.sum(picked.astype(jnp.float32) * w) / w_tot
                cm = confusion_matrix(jnp.argmax(logp, axis=-1), yi,
                                      n_classes, weights=w)
                return loss, cm

            tok_shape = (mb, (x_in.shape[2] // cfg.patch_size) *
                         (x_in.shape[3] // cfg.patch_size) + 1, cfg.embed_dim)
            # stash + relays + pending cotangent carry the ACTIVATION dtype:
            # under bf16 compute the 2S-slot ring (the schedule's whole
            # memory bound) and both per-tick ppermutes halve with it
            ring = jnp.zeros((cap,) + tok_shape, act_dtype)
            recv_f = jnp.zeros(tok_shape, act_dtype)
            recv_b = jnp.zeros(tok_shape, act_dtype)
            dy_pend = jnp.zeros(tok_shape, act_dtype)
            loss_acc = jnp.zeros((), jnp.float32)
            cm_acc = jnp.zeros((n_classes, n_classes), jnp.int32)
            g_st = jax.tree.map(jnp.zeros_like, st)
            g_rest = jax.tree.map(jnp.zeros_like, rest_in)
            g_head = jax.tree.map(jnp.zeros_like, head_in)

            def acc(tree_acc, tree_g, active):
                w = active.astype(jnp.float32)
                return jax.tree.map(lambda a, g: a + g * w, tree_acc, tree_g)

            def mb_slice(arr, idx, static):
                """arr[idx] with a Python-int (static trace) or traced
                (clipped dynamic-slice) microbatch index."""
                if static:
                    return arr[idx]
                return jax.lax.dynamic_index_in_dim(
                    arr, jnp.clip(idx, 0, n_mb - 1), 0, keepdims=False)

            # ONE tick body for both schedule forms.  static=True: t is a
            # Python int — window gates are `if`s that skip out-of-window
            # slots entirely and microbatch indices trace as constants.
            # static=False (the lax.scan body): t is traced — the same
            # gates become masks/clips, every slot always computes
            # (garbage on masked lanes/edges is discarded by the same
            # `acc` masks both forms share).  Keeping one copy means a
            # schedule fix can't silently diverge the two forms.
            def tick(carry, t, static):
                (ring, recv_f, recv_b, dy_pend, loss_acc, cm_acc,
                 g_st, g_rest, g_head) = carry
                y_f = None
                if (not static) or t <= n_mb + n_stages - 2:  # fwd slot
                    f0 = min(t, n_mb - 1) if static else t   # stage-0 inject
                    tok_in = prepare_tokens(rest_in,
                                            mb_slice(x_in, f0, static), cfg)
                    h_in = jnp.where(s == 0, tok_in, recv_f)
                    ring = jax.lax.dynamic_update_index_in_dim(
                        ring, h_in, t % cap if static else jnp.mod(t, cap),
                        0)
                    y_f = stage_fwd(st, h_in)
                    recv_f = jax.lax.ppermute(y_f, stage_axis, perm_f)

                if (not static) or t >= n_stages:             # bwd slot
                    active_b = jnp.logical_and(
                        t - (2 * n_stages - 1) + s >= 0,
                        t - (2 * n_stages - 1) + s < n_mb)
                    g_in = jnp.where(s == last, dy_pend, recv_b)
                    slot = jnp.mod(t - (2 * n_stages - 1) + 2 * s, cap)
                    h_st = jax.lax.dynamic_index_in_dim(ring, slot, 0,
                                                        keepdims=False)
                    _, vjp_fn = jax.vjp(stage_fwd, st, h_st)
                    g_st_mb, dh = vjp_fn(g_in)
                    g_st = acc(g_st, g_st_mb, active_b)
                    m0 = t - (2 * n_stages - 1)          # stage-0 bwd mb
                    if (not static) or 0 <= m0 < n_mb:   # embedding grads
                        x_b = mb_slice(x_in, m0, static)
                        _, vjp_prep = jax.vjp(
                            lambda r: prepare_tokens(r, x_b, cfg), rest_in)
                        (g_emb,) = vjp_prep(
                            jnp.where(s == 0, dh, jnp.zeros_like(dh)))
                        g_rest = acc(g_rest, g_emb, active_b)
                    recv_b = jax.lax.ppermute(dh, stage_axis, perm_b)

                m_h = t - (n_stages - 1)                      # head slot
                if (not static) or 0 <= m_h < n_mb:
                    active_h = s == last
                    if not static:  # window gate as a predicate
                        active_h = jnp.logical_and(
                            active_h,
                            jnp.logical_and(m_h >= 0, m_h < n_mb))
                    (loss_m, cm_m), (g_nr, g_hd, dy) = jax.value_and_grad(
                        mb_loss, argnums=(0, 1, 2), has_aux=True)(
                        rest_in, head_in, y_f, mb_slice(y_in, m_h, static),
                        mb_slice(w_in, m_h, static))
                    loss_acc += jnp.where(active_h, loss_m, 0.0)
                    cm_acc += jnp.where(active_h, cm_m,
                                        jnp.zeros_like(cm_m))
                    g_rest = acc(g_rest, g_nr, active_h)
                    g_head = acc(g_head, g_hd, active_h)
                    dy_pend = jnp.where(active_h, dy, dy_pend)
                return (ring, recv_f, recv_b, dy_pend, loss_acc, cm_acc,
                        g_st, g_rest, g_head)

            carry = (ring, recv_f, recv_b, dy_pend, loss_acc, cm_acc,
                     g_st, g_rest, g_head)
            n_ticks = n_mb + 2 * n_stages - 1
            if scan:
                carry, _ = jax.lax.scan(
                    lambda c, t: (tick(c, t, static=False), None),
                    carry, jnp.arange(n_ticks, dtype=jnp.int32))
            else:
                for t in range(n_ticks):
                    carry = tick(carry, t, static=True)
            (ring, recv_f, recv_b, dy_pend, loss_acc, cm_acc,
             g_st, g_rest, g_head) = carry

            loss = jax.lax.psum(loss_acc, stage_axis)
            cm = jax.lax.psum(cm_acc, stage_axis)  # nonzero on last stage
            g_rest = jax.tree.map(lambda t: jax.lax.psum(t, stage_axis),
                                  g_rest)
            g_head = jax.tree.map(lambda t: jax.lax.psum(t, stage_axis),
                                  g_head)
            g_st = jax.tree.map(lambda t: t[None], g_st)
            return loss, g_st, g_rest, g_head, cm

        loss, g_st, g_rest, g_head, cm = value_and_grads(
            stages, rest, head_p, x_mbs, y_mbs, w_mbs, w_total)
        params = {"stages": stages, "rest": rest, "head": head_p}
        grads = {"stages": g_st, "rest": g_rest, "head": g_head}
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params["stages"], params["rest"], params["head"], opt_state,
                loss, cm)

    return jax.jit(step, donate_argnums=(0, 1, 2, 3) if donate else ())


# ---------------------------------------------------------------------------
# Interleaved (virtual-chunk) pipeline: Megatron's looped placement
# ---------------------------------------------------------------------------

def unstack_block_stages(stacked, n_stages: int) -> list:
    """Inverse of :func:`stack_block_stages`: (S, per, ...) pytree ->
    depth-ordered block list (block s*per + i lives at [s, i])."""
    per = jax.tree.leaves(stacked)[0].shape[1]
    return [jax.tree.map(lambda t: t[s, i], stacked)
            for s in range(n_stages) for i in range(per)]


def unstack_block_chunks(stacked, n_stages: int, n_chunks: int) -> list:
    """Inverse of :func:`stack_block_chunks`: (V, S, per, ...) pytree ->
    depth-ordered block list (block (v*S+s)*per + i lives at [v, s, i])."""
    per = jax.tree.leaves(stacked)[0].shape[2]
    return [jax.tree.map(lambda t: t[v, s, i], stacked)
            for v in range(n_chunks) for s in range(n_stages)
            for i in range(per)]


def stack_block_chunks(blocks: list, n_stages: int, n_chunks: int):
    """[depth x block-pytree] -> pytree with leading (V, S, per) axes.

    Chunk c = v*S + s holds blocks [c*per, (c+1)*per) and lives on device s
    (= c mod S): Megatron-LM's interleaved placement, where each device owns
    V non-contiguous slivers of the depth instead of one contiguous slab.
    Shard axis 1 with ``P(None, stage_axis)``.
    """
    depth = len(blocks)
    if depth % (n_stages * n_chunks) != 0:
        raise ValueError(f"depth {depth} not divisible by stages x chunks "
                         f"({n_stages} x {n_chunks})")
    per = depth // (n_stages * n_chunks)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return jax.tree.map(
        lambda x: x.reshape((n_chunks, n_stages, per) + x.shape[1:]),
        stacked)


def _interleaved_sweep(st, rest, x, cfg, s, stage_axis: str, n_stages: int,
                       n_chunks: int, n_mb: int, use_flash: bool,
                       remat: bool):
    """The interleaved fill-drain forward, inside shard_map.

    ``st``: this device's (V, per, ...) chunk slabs.  Activations ride the
    +1 ring every tick and wrap around it V times; at tick t device s runs
    its loop-v = (t - s) // S chunk (at most one is in-window because
    M <= S).  Microbatch m enters chunk 0 (device 0) at tick m and leaves
    chunk SV-1 (device S-1) at tick m + SV - 1, so the fill/drain bubble is
    S - 1 *chunk*-ticks — V-fold finer than GPipe's S - 1 stage-ticks,
    which is the entire point of the interleaved placement (the win 1F1B
    interleaving buys on hardware, here observable as tick accounting).
    Out-of-window device-ticks compute on garbage and are masked, exactly
    like the GPipe sweeps above.  Returns the banked outputs, nonzero on
    the last stage only (caller psums).
    """
    per = jax.tree.leaves(st)[0].shape[1]
    tokens = prepare_tokens(rest, x, cfg)
    b = tokens.shape[0]
    mbs = tokens.reshape((n_mb, b // n_mb) + tokens.shape[1:])

    def chunk_fwd(ch, h):
        for i in range(per):
            blk = jax.tree.map(lambda t, i=i: t[i], ch)
            h = block_apply(blk, h, cfg, use_flash=use_flash)[0]
        return h
    if remat:
        chunk_fwd = jax.checkpoint(chunk_fwd)

    out = jnp.zeros_like(mbs)
    recv = jnp.zeros_like(mbs[0])
    last = n_stages - 1
    total_chunks = n_stages * n_chunks
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    for t in range(n_mb + total_chunks - 1):
        # loop index of the (single) in-window chunk on this device; the
        # floor div is correct for t < s too (clipped, masked garbage)
        v = jnp.clip((t - s) // n_stages, 0, n_chunks - 1)
        ch = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, v, 0, keepdims=False),
            st)
        # stage 0 injects microbatch t while t < M; on later ticks its
        # input is the wrapped activation arriving from stage S-1
        h_in = jnp.where(s == 0, mbs[t], recv) if t < n_mb else recv
        y = chunk_fwd(ch, h_in)
        mb_idx = t - (total_chunks - 1)
        if 0 <= mb_idx < n_mb:
            out = jnp.where(s == last, out.at[mb_idx].set(y), out)
        recv = jax.lax.ppermute(y, stage_axis, perm)
    return out.reshape(tokens.shape)


def make_pp_interleaved_train_step(cfg: ViTConfig, head_type: str,
                                   n_classes: int, optimizer, mesh: Mesh,
                                   stage_axis: str = "stage",
                                   n_chunks: int = 2,
                                   n_microbatches: int = 2,
                                   waves: int = 1,
                                   use_flash: bool = True,
                                   remat: bool = False,
                                   donate: bool = False):
    """PP train step on the interleaved (virtual-chunk) placement.

    step(chunks, rest, head_p, opt_state, images_u8, labels) ->
    (chunks, rest, head_p, opt_state, loss), where ``chunks`` is the
    (V, S, per) pytree from :func:`stack_block_chunks`, sharded
    ``P(None, stage_axis)`` — each device holds and updates only its V
    chunk slivers' weights and moments (same 1/S weight memory as the
    contiguous layout, different placement).

    Schedule: the interleaved fill-drain (:func:`_interleaved_sweep`);
    differentiating it transposes every ring hop, so AD generates the
    reverse interleaved drain-fill (the same mechanism as
    :func:`make_pp_train_step`).  Constraint: ``n_microbatches <= S`` —
    with M <= S each device has at most one in-window chunk per tick, so
    the tick table stays one-slot-per-device (Megatron's interleaved
    schedule also ties M to S, requiring M % S == 0); larger batches set
    ``waves=K`` — the batch splits into K wave-slabs of M microbatches,
    each swept through the pipeline in turn with gradients accumulated
    across waves (under one ``lax.scan``, so compile time is O(1) in K)
    and ONE optimizer update on the exact full-batch mean (the schedule's
    native gradient-accumulation form).  The final norm + head are
    chunk-sharded across stages exactly as in :func:`make_pp_train_step`.
    NOT a hand-scheduled interleaved 1F1B: activation memory is the AD
    fill-drain's O(M + SV) ticks (remat=True trades FLOPs to ~1 tick
    each) — for the O(2SV)-stash hand schedule that also lifts the M <= S
    constraint, use :func:`make_pp_interleaved_1f1b_train_step`.

    Reference: single-GPU, no PP (SURVEY §2.3); placement follows
    Megatron-LM's interleaved 1F1B (Narayanan et al. 2021), re-derived as
    a masked SPMD tick table over a TPU ring.
    """
    from dino_tpu.models.heads import head_apply
    from dino_tpu.ops.preprocess import normalize_imagenet

    if head_type not in ("mlp", "linear"):
        # the interleaved AD step could carry the GPipe MoE treatment but
        # its waves form accumulates gradients across sweeps, which hits
        # the same f-coupling as accum_steps; use make_pp_train_step for
        # MoE+PP (full-batch head, exact psum'd balance statistics)
        raise ValueError(f"interleaved PP training supports the mlp/linear "
                         f"heads; got {head_type!r} (for head='moe' use "
                         f"the GPipe step make_pp_train_step)")
    n_stages = mesh.shape[stage_axis]
    n_mb = n_microbatches
    if n_mb > n_stages:
        raise ValueError(
            f"interleaved schedule needs n_microbatches ({n_mb}) <= stages "
            f"({n_stages}); accumulate gradients over waves for more")
    if waves < 1:
        raise ValueError(f"waves must be >= 1, got {waves}")
    last = n_stages - 1

    def step(chunks, rest, head_p, opt_state, images, labels):
        x = normalize_imagenet(images)
        b = x.shape[0]
        if b % (waves * n_mb) != 0:
            raise ValueError(f"batch {b} not divisible by waves x "
                             f"microbatches ({waves} x {n_mb})")

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(None, stage_axis), P(), P(), P(), P()),
                 out_specs=(P(), P(None, stage_axis), P(), P()),
                 check_vma=False)
        def value_and_grads(chunks_in, rest_in, head_in, x_rep, y_rep):
            s = jax.lax.axis_index(stage_axis)

            def local_loss(ps):
                chunks_l, rest, head_p = ps
                st = jax.tree.map(lambda t: t[:, 0], chunks_l)  # (V, per,...)
                full = jax.lax.psum(
                    _interleaved_sweep(st, rest, x_rep, cfg, s, stage_axis,
                                       n_stages, n_chunks, n_mb, use_flash,
                                       remat),
                    stage_axis)
                # chunk-sharded norm + head (same partition argument as
                # make_pp_train_step: the psum transposes to a psum of the
                # chunk cotangents, assembling the full output cotangent
                # on the last stage)
                feats = full[:, 1:, :].reshape(-1, full.shape[-1])
                y_all = y_rep.reshape(-1).astype(jnp.int32)
                total = feats.shape[0]
                pad = (-total) % n_stages
                if pad:
                    feats = jnp.pad(feats, ((0, pad), (0, 0)))
                    y_all = jnp.pad(y_all, (0, pad))
                chunk = (total + pad) // n_stages
                my_f = jax.lax.dynamic_slice_in_dim(feats, s * chunk,
                                                    chunk, 0)
                my_y = jax.lax.dynamic_slice_in_dim(y_all, s * chunk,
                                                    chunk, 0)
                w = (jnp.arange(chunk) + s * chunk < total).astype(
                    jnp.float32)
                normed = layer_norm(rest["norm"], my_f, cfg.ln_eps)
                logp = head_apply(head_type, head_p, normed)
                picked = jnp.take_along_axis(logp, my_y[:, None],
                                             axis=1)[:, 0]
                return -jnp.sum(picked * w) / total

            loss, (g_ch, g_rest, g_head) = jax.value_and_grad(local_loss)(
                (chunks_in, rest_in, head_in))
            loss = jax.lax.psum(loss, stage_axis)
            g_rest = jax.tree.map(lambda t: jax.lax.psum(t, stage_axis),
                                  g_rest)
            g_head = jax.tree.map(lambda t: jax.lax.psum(t, stage_axis),
                                  g_head)
            return loss, g_ch, g_rest, g_head

        # one pipeline sweep per wave-slab; equal slab sizes make the
        # full-batch mean the plain average of the per-wave means.  The
        # sweeps run under ONE lax.scan so HLO size and compile time stay
        # O(1) in waves (a Python loop would unroll the whole interleaved
        # sweep K times into the jitted program).
        slab = b // waves
        if waves == 1:
            loss, g_ch, g_rest, g_head = value_and_grads(chunks, rest,
                                                         head_p, x, labels)
        else:
            x_w = x.reshape((waves, slab) + x.shape[1:])
            y_w = labels.reshape((waves, slab) + labels.shape[1:])

            def wave_body(acc_c, xs):
                xw, yw = xs
                out = value_and_grads(chunks, rest, head_p, xw, yw)
                return jax.tree.map(jnp.add, acc_c, out), None

            init = (jnp.zeros((), jnp.float32),
                    jax.tree.map(jnp.zeros_like, chunks),
                    jax.tree.map(jnp.zeros_like, rest),
                    jax.tree.map(jnp.zeros_like, head_p))
            acc_w, _ = jax.lax.scan(wave_body, init, (x_w, y_w))
            loss, g_ch, g_rest, g_head = jax.tree.map(
                lambda t: t / waves, acc_w)
        params = {"chunks": chunks, "rest": rest, "head": head_p}
        grads = {"chunks": g_ch, "rest": g_rest, "head": g_head}
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params["chunks"], params["rest"], params["head"], opt_state,
                loss)

    return jax.jit(step, donate_argnums=(0, 1, 2, 3) if donate else ())


def init_pp_interleaved_train_state(optimizer, chunks, rest, head_p):
    """Optimizer state over the interleaved param layout; chunk moments
    shard with the chunk params."""
    return optimizer.init({"chunks": chunks, "rest": rest, "head": head_p})


# ---------------------------------------------------------------------------
# Interleaved 1F1B: the hand-scheduled backward for the virtual-chunk
# placement — Megatron-LM's production schedule, as one SPMD tick table
# ---------------------------------------------------------------------------

def make_pp_interleaved_1f1b_train_step(cfg: ViTConfig, head_type: str,
                                        n_classes: int, optimizer,
                                        mesh: Mesh,
                                        stage_axis: str = "stage",
                                        n_chunks: int = 2,
                                        n_microbatches: int = 2,
                                        use_flash: bool = True,
                                        scan: bool = False,
                                        compute_dtype=None,
                                        donate: bool = False):
    """PP train step: interleaved (virtual-chunk) placement x hand-written
    1F1B backward.

    step(chunks, rest, head_p, opt_state, images_u8, labels, mask=None) ->
    (chunks, rest, head_p, opt_state, loss, cm) — make_train_step's loss/
    CM/mask contract (ragged-tail masking and the psum'd last-stage train
    CM exactly as in :func:`make_pp_1f1b_train_step`) on
    :func:`make_pp_interleaved_train_step`'s param layout (``chunks`` is
    the (V, S, per) pytree from :func:`stack_block_chunks`, sharded
    ``P(None, stage_axis)``) — but WITHOUT the ``n_microbatches <= S``
    constraint and WITHOUT ``waves``: any M runs in one schedule, each
    microbatch's backward launching as it leaves chunk SV-1, so activation
    memory is a fixed 2SV-slot ring buffer independent of M.

    The tick table.  Write S stages, V chunks/device, C = S*V total chunks,
    chunk c = v*S + s on device s; microbatch m = g*S + r (groups of S, the
    same grouping Megatron's looped schedule uses).  Then

        forward   f(m, c)  at tick  g*C + v*S + r + s
        head vjp  (chunk C-1 exit) at tick  (g+1)*C + r - 1
        backward  b(m, c)  at tick  C + g*C + (V-1-v)*S + r + (S-1-s)

    This is exactly the contiguous 1F1B table at V = 1 (f at m+s, b at
    m+2S-1-s) — the schedule below strictly generalizes
    :func:`make_pp_1f1b_train_step`.  Three structural facts make it one
    clean SPMD program:

    * **Packed slots.**  Per device the forward ticks for group g are the
      consecutive window [g*C + s, (g+1)*C + s) — one forward slot per tick,
      no collisions, for ANY number of groups; the backward table mirrors
      it.  M % S == 0 gives the fully packed schedule (partial last groups
      run with masked lanes, like every edge tick here).
    * **Zero-buffer relays.**  f(m, c) runs one tick before f(m, c+1) for
      every c — including the device-wrap S-1 -> 0 between chunk columns —
      so the +1 ``ppermute`` every tick delivers each activation exactly
      when its consumer fires, and symmetrically for cotangents on the -1
      ring.  No skew/reorder buffers exist anywhere in the schedule.
    * **Ring-buffer stash.**  The stage input stashed at tick t goes to
      slot t mod 2C; backward b(m, c) trails f(m, c) by 2(C - c) - 1 < 2C
      ticks, so a 2C-slot ring per device is structurally safe (the odd
      lag also means a tick never reads the slot it just wrote).  The
      backward re-runs its chunk under ``jax.vjp`` from the stash — the
      same recompute trade as the contiguous schedule and ``remat=True``.

    Versus the AD fill-drain (:func:`make_pp_interleaved_train_step`): that
    schedule stashes O(M + SV) ticks (or recomputes under remat) and caps
    M at S, pushing big batches through ``waves=K`` sweeps whose fill/drain
    bubbles serialize; this one holds 2SV microbatch stashes flat in M and
    amortizes ONE fill/drain over the whole batch.  Versus contiguous 1F1B:
    the bubble is V-fold finer ((S-1) chunk-ticks, each 1/V the work) at
    the cost of a V-fold larger stash ring — exactly Megatron's trade
    (Narayanan et al. 2021).  Gradients match the replicated step to
    reduction order (tests/test_pipeline.py).

    ``scan=True`` and ``compute_dtype`` behave as in
    :func:`make_pp_1f1b_train_step` (one shared tick body for both forms;
    bf16 halves the stash ring and both relays).  Reference: single-GPU, no
    PP (SURVEY §2.3) — this closes the last cell of the schedule matrix.
    """
    from dino_tpu.models.heads import head_apply
    from dino_tpu.ops.preprocess import normalize_imagenet
    from dino_tpu.train.metrics import confusion_matrix

    if head_type not in ("mlp", "linear"):
        # same 1F1B structural limit as make_pp_1f1b_train_step (see the
        # guard comment there); for MoE+PP use the GPipe step
        raise ValueError(f"1F1B PP training supports the mlp/linear heads; "
                         f"got {head_type!r} (for head='moe' use the GPipe "
                         f"step make_pp_train_step)")
    n_stages = mesh.shape[stage_axis]
    n_mb = n_microbatches
    V = n_chunks
    C = n_stages * V                       # total chunks
    last = n_stages - 1
    cap = 2 * C                            # stash ring slots
    delta = C                              # first-backward tick offset
    perm_f = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    perm_b = [(i, (i - 1) % n_stages) for i in range(n_stages)]
    g_max, r_max = divmod(n_mb - 1, n_stages)
    # last active forward tick (lane S-1, chunk C-1, microbatch M-1) and
    # total ticks (last backward = forward mirrored + delta)
    max_tf = g_max * C + (V - 1) * n_stages + r_max + last
    n_ticks = max_tf + delta + 1
    act_dtype = compute_dtype if compute_dtype is not None else jnp.float32

    def step(chunks, rest, head_p, opt_state, images, labels, mask=None):
        x = normalize_imagenet(images)
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
        b = x.shape[0]
        if b % n_mb != 0:
            raise ValueError(f"batch {b} not divisible by {n_mb} microbatches")
        mb = b // n_mb
        n_pat = labels.shape[-1]
        m = (jnp.ones((b,), jnp.float32) if mask is None
             else mask.astype(jnp.float32))
        # whole-batch weight total: see make_pp_1f1b_train_step
        w_total = jnp.maximum(jnp.sum(m) * n_pat, 1.0)
        x_mbs = x.reshape((n_mb, mb) + x.shape[1:])
        y_mbs = labels.reshape(n_mb, mb, n_pat)
        w_mbs = m.reshape(n_mb, mb)

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(None, stage_axis), P(), P(), P(), P(), P(),
                           P()),
                 out_specs=(P(), P(None, stage_axis), P(), P(), P()),
                 check_vma=False)
        def value_and_grads(chunks_in, rest_in, head_in, x_in, y_in, w_in,
                            w_tot):
            s = jax.lax.axis_index(stage_axis)
            st = jax.tree.map(lambda t: t[:, 0], chunks_in)   # (V, per, ...)
            per = jax.tree.leaves(st)[0].shape[1]

            def chunk_fwd(st_p, v_idx, h):
                """Run chunk v_idx of this device's (V, per, ...) slabs.
                Differentiating through the dynamic_index transposes it
                into a scatter-add, so the vjp's chunk gradient lands at
                the right (V, ...) position with zeros elsewhere — no
                manual indexed accumulation."""
                ch = jax.tree.map(
                    lambda t: jax.lax.dynamic_index_in_dim(
                        t, v_idx, 0, keepdims=False), st_p)
                for i in range(per):
                    blk = jax.tree.map(lambda t, i=i: t[i], ch)
                    h = block_apply(blk, h, cfg, use_flash=use_flash)[0]
                return h

            def mb_loss(rest_r, head_r, tokens, y_lab, w_s):
                feats = tokens[:, 1:, :].reshape(-1, cfg.embed_dim)
                normed = layer_norm(rest_r["norm"], feats, cfg.ln_eps)
                logp = head_apply(head_type, head_r, normed)
                yi = y_lab.reshape(-1).astype(jnp.int32)
                w = jnp.repeat(w_s, n_pat)           # per-patch 0/1 weights
                picked = jnp.take_along_axis(logp, yi[:, None], axis=1)[:, 0]
                # partial of the global masked mean; f32 under bf16
                loss = -jnp.sum(picked.astype(jnp.float32) * w) / w_tot
                cm = confusion_matrix(jnp.argmax(logp, axis=-1), yi,
                                      n_classes, weights=w)
                return loss, cm

            tok_shape = (mb, (x_in.shape[2] // cfg.patch_size) *
                         (x_in.shape[3] // cfg.patch_size) + 1, cfg.embed_dim)
            ring = jnp.zeros((cap,) + tok_shape, act_dtype)
            recv_f = jnp.zeros(tok_shape, act_dtype)
            recv_b = jnp.zeros(tok_shape, act_dtype)
            dy_pend = jnp.zeros(tok_shape, act_dtype)
            loss_acc = jnp.zeros((), jnp.float32)
            cm_acc = jnp.zeros((n_classes, n_classes), jnp.int32)
            g_st = jax.tree.map(jnp.zeros_like, st)
            g_rest = jax.tree.map(jnp.zeros_like, rest_in)
            g_head = jax.tree.map(jnp.zeros_like, head_in)

            def acc(tree_acc, tree_g, active):
                w = active.astype(jnp.float32)
                return jax.tree.map(lambda a, g: a + g * w, tree_acc, tree_g)

            def mb_slice(arr, idx, static):
                if static:
                    return arr[idx]
                return jax.lax.dynamic_index_in_dim(
                    arr, jnp.clip(idx, 0, n_mb - 1), 0, keepdims=False)

            # ONE tick body for both schedule forms, like the contiguous
            # 1F1B: static=True skips globally-idle slots and traces lane-0
            # microbatch indices as constants; static=False (the lax.scan
            # body) turns the same gates into masks/clips.
            def tick(carry, t, static):
                (ring, recv_f, recv_b, dy_pend, loss_acc, cm_acc,
                 g_st, g_rest, g_head) = carry
                y_f = None
                if (not static) or t <= max_tf:              # fwd slot
                    u_f = t - s                               # lane clock
                    v_f = jnp.clip(jnp.mod(u_f, C) // n_stages, 0, V - 1)
                    # lane-0 injection: chunk-0 window of its group
                    if static:
                        inj = (t % C) < n_stages and \
                            (t // C) * n_stages + t % n_stages < n_mb
                        f0 = (t // C) * n_stages + t % n_stages if inj else 0
                    else:
                        f0 = (t // C) * n_stages + jnp.mod(t, n_stages)
                        inj = jnp.logical_and(jnp.mod(t, C) < n_stages,
                                              f0 < n_mb)
                    if (not static) or inj:
                        tok_in = prepare_tokens(
                            rest_in, mb_slice(x_in, f0, static), cfg)
                        lane0 = (s == 0) if static else jnp.logical_and(
                            s == 0, inj)
                        h_in = jnp.where(lane0, tok_in, recv_f)
                    else:   # lane 0 consumes the ring wrap, like every lane
                        h_in = recv_f
                    ring = jax.lax.dynamic_update_index_in_dim(
                        ring, h_in, t % cap if static else jnp.mod(t, cap),
                        0)
                    y_f = chunk_fwd(st, v_f, h_in)
                    recv_f = jax.lax.ppermute(y_f, stage_axis, perm_f)

                if (not static) or t >= delta:                # bwd slot
                    u_b = t - delta - (last - s)              # lane clock
                    vp = jnp.mod(u_b, C) // n_stages          # mirrored loop
                    r_b = jnp.mod(u_b, n_stages)
                    m_b = (u_b // C) * n_stages + r_b
                    active_b = jnp.logical_and(u_b >= 0, m_b < n_mb)
                    v_b = jnp.clip(V - 1 - vp, 0, V - 1)      # local chunk
                    # chunk C-1 (lane S-1, vp==0) takes the head cotangent;
                    # every other chunk takes the -1-ring relay
                    g_in = jnp.where(
                        jnp.logical_and(s == last, vp == 0), dy_pend, recv_b)
                    lag = 2 * (C - (v_b * n_stages + s)) - 1
                    slot = jnp.mod(t - lag, cap)
                    h_st = jax.lax.dynamic_index_in_dim(ring, slot, 0,
                                                        keepdims=False)
                    _, vjp_fn = jax.vjp(
                        lambda stp, h: chunk_fwd(stp, v_b, h), st, h_st)
                    g_st_mb, dh = vjp_fn(g_in)
                    g_st = acc(g_st, g_st_mb, active_b)
                    # embedding grads fire when lane 0's backward chunk is
                    # chunk 0 (vp == V-1); its microbatch index m0 is the
                    # lane-0 clock's
                    u0 = t - delta - last
                    if static:
                        emb_tick = (u0 >= 0 and (u0 % C) // n_stages == V - 1
                                    and (u0 // C) * n_stages +
                                    u0 % n_stages < n_mb)
                        m0 = ((u0 // C) * n_stages + u0 % n_stages
                              if emb_tick else 0)
                    else:
                        emb_tick = True
                        m0 = (u0 // C) * n_stages + jnp.mod(u0, n_stages)
                    if emb_tick:
                        x_b = mb_slice(x_in, m0, static)
                        _, vjp_prep = jax.vjp(
                            lambda r: prepare_tokens(r, x_b, cfg), rest_in)
                        (g_emb,) = vjp_prep(
                            jnp.where(s == 0, dh, jnp.zeros_like(dh)))
                        g_rest = acc(g_rest, g_emb,
                                     jnp.logical_and(active_b, v_b == 0))
                    recv_b = jax.lax.ppermute(dh, stage_axis, perm_b)

                # head slot: fires when lane S-1's forward this tick was
                # chunk C-1 (microbatch m_h leaves the pipe)
                u_h = t - last
                if static:
                    head_tick = (u_h >= 0 and
                                 (u_h % C) // n_stages == V - 1 and
                                 (u_h // C) * n_stages + u_h % n_stages
                                 < n_mb)
                    m_h = ((u_h // C) * n_stages + u_h % n_stages
                           if head_tick else 0)
                else:
                    head_tick = True
                    m_h = (u_h // C) * n_stages + jnp.mod(u_h, n_stages)
                if head_tick:
                    active_h = (s == last) if static else jnp.logical_and(
                        s == last, jnp.logical_and(
                            u_h >= 0, jnp.logical_and(
                                jnp.mod(u_h, C) // n_stages == V - 1,
                                m_h < n_mb)))
                    (loss_m, cm_m), (g_nr, g_hd, dy) = jax.value_and_grad(
                        mb_loss, argnums=(0, 1, 2), has_aux=True)(
                        rest_in, head_in, y_f, mb_slice(y_in, m_h, static),
                        mb_slice(w_in, m_h, static))
                    loss_acc += jnp.where(active_h, loss_m, 0.0)
                    cm_acc += jnp.where(active_h, cm_m,
                                        jnp.zeros_like(cm_m))
                    g_rest = acc(g_rest, g_nr, active_h)
                    g_head = acc(g_head, g_hd, active_h)
                    dy_pend = jnp.where(active_h, dy, dy_pend)
                return (ring, recv_f, recv_b, dy_pend, loss_acc, cm_acc,
                        g_st, g_rest, g_head)

            carry = (ring, recv_f, recv_b, dy_pend, loss_acc, cm_acc,
                     g_st, g_rest, g_head)
            if scan:
                carry, _ = jax.lax.scan(
                    lambda c, t: (tick(c, t, static=False), None),
                    carry, jnp.arange(n_ticks, dtype=jnp.int32))
            else:
                for t in range(n_ticks):
                    carry = tick(carry, t, static=True)
            (ring, recv_f, recv_b, dy_pend, loss_acc, cm_acc,
             g_st, g_rest, g_head) = carry

            loss = jax.lax.psum(loss_acc, stage_axis)
            cm = jax.lax.psum(cm_acc, stage_axis)  # nonzero on last stage
            g_rest = jax.tree.map(lambda t: jax.lax.psum(t, stage_axis),
                                  g_rest)
            g_head = jax.tree.map(lambda t: jax.lax.psum(t, stage_axis),
                                  g_head)
            g_st = jax.tree.map(lambda t: t[:, None], g_st)  # (V, 1, per...)
            return loss, g_st, g_rest, g_head, cm

        loss, g_ch, g_rest, g_head, cm = value_and_grads(
            chunks, rest, head_p, x_mbs, y_mbs, w_mbs, w_total)
        params = {"chunks": chunks, "rest": rest, "head": head_p}
        grads = {"chunks": g_ch, "rest": g_rest, "head": g_head}
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params["chunks"], params["rest"], params["head"], opt_state,
                loss, cm)

    return jax.jit(step, donate_argnums=(0, 1, 2, 3) if donate else ())


# ---------------------------------------------------------------------------
# 3-axis composition: DP x PP x TP on a (data, stage, model) mesh
# (docs/SCALING.md composition table — the classic 3D-parallel layout)
# ---------------------------------------------------------------------------

def _pp_tp_stage_specs(stage_axis: str, tp_axis: str):
    """PartitionSpecs for TP-packed blocks stacked into (S, per) stage
    slabs: the per-block TP spec (parallel/tp.py:tp_block_spec) with the
    leading stage axis prepended — each device holds only its own stage's
    head-group."""
    from dino_tpu.parallel.tp import tp_block_spec
    return jax.tree.map(lambda spec: P(stage_axis, None, *spec),
                        tp_block_spec(tp_axis),
                        is_leaf=lambda x: isinstance(x, P))


def _block_tp(p: Params, tokens: jnp.ndarray, cfg: ViTConfig, tp_axis: str,
              flash: str) -> jnp.ndarray:
    """One block on the full local sequence with head/hidden dims split
    over ``tp_axis``: the shared Megatron math (parallel/tp.py) with
    whole-sequence attention per local head group (the flash kernel on
    TPU) — unlike ring_attention._block_sp_tp there is no sequence axis
    here."""
    from dino_tpu.ops.attention import attention_xla, flash_attention
    from dino_tpu.parallel.tp import tp_block_apply

    use_flash = (flash == "force" or
                 (flash == "auto" and jax.default_backend() == "tpu"))
    if use_flash:
        attn = lambda q, k, v: flash_attention(  # noqa: E731
            q, k, v, cfg.scale,
            interpret=jax.default_backend() != "tpu")
    else:
        attn = lambda q, k, v: attention_xla(q, k, v, cfg.scale)[0]  # noqa: E731
    return tp_block_apply(p, tokens, cfg, tp_axis, attn)


def vit_forward_pp_tp(params: Params, x: jnp.ndarray, cfg: ViTConfig,
                      mesh: Mesh, data_axis: str = "data",
                      stage_axis: str = "stage", tp_axis: str = "model",
                      n_microbatches: int = 2, flash: str = "auto",
                      remat: bool = False) -> jnp.ndarray:
    """ViT forward on the 3-axis composition: batch shards over
    ``data_axis``, blocks pipeline over ``stage_axis``, and every stage's
    block math is tensor-parallel over ``tp_axis`` — one shard_map, three
    kinds of collective (GSPMD batch split / stage ppermute / Megatron
    psum), all riding ICI.  Params come in the STANDARD layout (the
    head-aligned TP packing and stage stacking are pure reshapes inside the
    traced fn, so shard_map autodiff transposes them and gradients come
    back standard — the same trade as ring_attention.make_sp_tp_train_step;
    use make_pp_train_step's pre-sharded layout when per-device weight
    memory is the constraint).  Returns the normed tokens (B, N+1, D);
    matches vit_forward to reduction order."""
    from dino_tpu.parallel.tp import tp_pack_block as _tp_pack_block

    n_stages = mesh.shape[stage_axis]
    t = mesh.shape[tp_axis]
    d = mesh.shape[data_axis]
    n_mb = n_microbatches
    if cfg.num_heads % t or cfg.mlp_hidden % t:
        raise ValueError(f"tensor-parallel degree {t} must divide both "
                         f"num_heads ({cfg.num_heads}) and mlp_hidden "
                         f"({cfg.mlp_hidden})")
    b = x.shape[0]
    if b % (d * n_mb):
        raise ValueError(f"batch {b} must divide by data-parallel degree x "
                         f"microbatches ({d} x {n_mb})")

    packed = [_tp_pack_block(blk, cfg) for blk in params["blocks"]]
    depth = len(packed)
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by {n_stages} stages")
    per = depth // n_stages
    stages = jax.tree.map(lambda *xs: jnp.stack(xs), *packed)
    stages = jax.tree.map(
        lambda a: a.reshape((n_stages, per) + a.shape[1:]), stages)
    rest = {k: v for k, v in params.items() if k != "blocks"}
    specs = _pp_tp_stage_specs(stage_axis, tp_axis)
    last = n_stages - 1
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    @partial(shard_map, mesh=mesh,
             in_specs=(specs, P(), P(data_axis)),
             out_specs=P(data_axis), check_vma=False)
    def run(stages_local, rest_rep, x_loc):
        s = jax.lax.axis_index(stage_axis)
        st = jax.tree.map(lambda a: a[0], stages_local)   # (per, ...)
        tokens = prepare_tokens(rest_rep, x_loc, cfg)
        b_loc = tokens.shape[0]
        mbs = tokens.reshape((n_mb, b_loc // n_mb) + tokens.shape[1:])

        def my_stage(h):
            for i in range(per):
                blk = jax.tree.map(lambda a: a[i], st)
                h = _block_tp(blk, h, cfg, tp_axis, flash)
            return h
        if remat:
            my_stage = jax.checkpoint(my_stage)

        out = jnp.zeros_like(mbs)
        recv = jnp.zeros_like(mbs[0])
        for tick in range(n_mb + n_stages - 1):   # static fill-drain
            mb_in = mbs[min(tick, n_mb - 1)]
            h_in = jnp.where(s == 0, mb_in, recv)
            y = my_stage(h_in)
            mb_idx = tick - last
            if 0 <= mb_idx < n_mb:
                out = jnp.where(s == last, out.at[mb_idx].set(y), out)
            recv = jax.lax.ppermute(y, stage_axis, perm)
        out = jax.lax.psum(
            jnp.where(s == last, out, jnp.zeros_like(out)), stage_axis)
        return layer_norm(rest_rep["norm"], out.reshape(tokens.shape),
                          cfg.ln_eps)

    return run(stages, rest, x)


def make_dp_pp_tp_train_step(cfg: ViTConfig, head_type: str, n_classes: int,
                             optimizer, mesh: Mesh, data_axis: str = "data",
                             stage_axis: str = "stage",
                             tp_axis: str = "model",
                             n_microbatches: int = 2, flash: str = "auto",
                             compute_dtype=None, remat: bool = False,
                             donate: bool = False):
    """3D-parallel train step: DP over ``data_axis``, GPipe over
    ``stage_axis``, Megatron TP over ``tp_axis``.

    step(vit_p, head_p, opt_state, images_u8, labels, mask=None) ->
    (vit_p, head_p, opt_state, loss, cm) — make_train_step's contract, so
    the caller's loop/metrics code is unchanged.  Params stay in the
    standard layout; differentiating through vit_forward_pp_tp transposes
    the stage ppermutes into the reverse pipeline, the Megatron psums into
    their gradient collectives, and GSPMD aggregates the data-parallel
    gradient — one jitted program over the 3-axis mesh (gradient equality
    vs the replicated step is tested on the (data=2, stage=2, model=2)
    virtual mesh)."""
    from dino_tpu.parallel.tp import make_composed_train_step
    return make_composed_train_step(
        lambda vit_p, x: vit_forward_pp_tp(vit_p, x, cfg, mesh, data_axis,
                                           stage_axis, tp_axis,
                                           n_microbatches, flash, remat),
        "DPxPPxTP", head_type, n_classes, optimizer,
        compute_dtype=compute_dtype, donate=donate)
