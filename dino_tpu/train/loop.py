"""Training/eval step builders + the fit orchestration.

Replaces the reference's PyTorch-Lightning Trainer (pl_torch_modules.py:365-432)
with an explicit JAX loop:

  * optax Adam/AdamW (torch-default hyperparameters)
  * frozen-backbone mode updates only the head and stops gradients at the
    backbone boundary (== requires_grad flip, :434-440)
  * uint8 batches normalize on device inside the jitted step
  * per-epoch metrics from an on-device confusion matrix
  * checkpoint-on-best val balanced accuracy (== ModelCheckpoint monitor
    'val_acc' mode 'max', :378-384), final test pass (:425)
  * optional data-parallel sharding of the batch over a mesh
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dino_tpu.models.heads import head_apply
from dino_tpu.models.vit import ViTConfig, vit_forward
from dino_tpu.models.resnet import resnet_backbone_apply
from dino_tpu.ops.preprocess import normalize_imagenet
from dino_tpu.train.metrics import confusion_matrix

Params = Any


def make_optimizer(name: str, lr: float) -> optax.GradientTransformation:
    """torch-default Adam/AdamW/SGD (reference configure_optimizers :258-259)."""
    name = name.lower()
    if name == "adam":
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    if name == "adamw":
        return optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
    if name == "sgd":
        return optax.sgd(lr)
    raise ValueError(f"unknown optimizer {name!r}")


def seg_forward(vit_params: Params, head_params: Params, cfg: ViTConfig,
                head_type: str, images_u8: Optional[jnp.ndarray] = None,
                pre_normalized: Optional[jnp.ndarray] = None,
                use_flash: bool = True,
                compute_dtype: Optional[jnp.dtype] = None,
                backbone: str = "vit",
                remat: bool = False,
                bn_collect=None,
                feat_sink=None,
                moe_dispatch: str = "dense",
                moe_capacity: float = 1.25) -> jnp.ndarray:
    """uint8 (B,res,res,3) -> (B*N_patches, n_classes) log-probs.

    Mirrors DINOSeg.forward (:239-256): backbone -> drop CLS -> fold patches
    onto the batch axis -> per-patch head.  Normalization fused here unless a
    pre-normalized tensor is supplied (the predict() path fuses its own
    resize+normalize upstream).

    ``compute_dtype=jnp.bfloat16`` runs all matmuls in bf16 on the MXU with
    f32 accumulation; LayerNorm, softmax, and the final log_softmax stay f32.
    Params remain f32 masters (casts fuse into the matmuls).
    """
    x = (pre_normalized if pre_normalized is not None
         else normalize_imagenet(images_u8))
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    if backbone == "vit":
        tokens = vit_forward(vit_params, x, cfg, use_flash=use_flash,
                             remat=remat)
        feats = tokens[:, 1:, :]
    else:  # cnn1/cnn2 ResNet-50 feature maps, (B, H/8, W/8, C) row-major
        # bn_collect switches BatchNorm to train mode and collects the
        # updated running stats (reference PL train() semantics)
        feats = resnet_backbone_apply(vit_params, x, variant=backbone,
                                      bn_collect=bn_collect)
    feats = feats.reshape(-1, feats.shape[-1])
    if feat_sink is not None:
        # train-time aux losses (e.g. the MoE router balance term) need the
        # pre-head features; sink them like bn_collect does for BN stats
        feat_sink["feats"] = feats
    return head_apply(head_type, head_params, feats,
                      moe_dispatch=moe_dispatch, moe_capacity=moe_capacity)


def nll_loss(log_probs: jnp.ndarray, labels: jnp.ndarray,
             weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """F.nll_loss equivalent (mean over patches, :265).

    ``weights`` (0/1 per patch) gives the masked mean over real patches only,
    so padded tail-batch samples contribute nothing to loss or gradient.
    """
    picked = jnp.take_along_axis(log_probs, labels[:, None].astype(jnp.int32),
                                 axis=1)[:, 0]
    if weights is None:
        return -jnp.mean(picked)
    return -jnp.sum(picked * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def make_train_step(cfg: ViTConfig, head_type: str, n_classes: int,
                    optimizer: optax.GradientTransformation,
                    freeze_backbone: bool,
                    donate: bool = True,
                    compute_dtype=None,
                    backbone: str = "vit",
                    accum_steps: int = 1,
                    zero_mesh=None, zero_axis: str = "data",
                    zero_param_spec=None,
                    fsdp_mesh=None, fsdp_axis: str = "data",
                    moe_dispatch: str = "dense",
                    moe_capacity: float = 1.25) -> Callable:
    """Returns jitted step(vit_p, head_p, opt_state, images, labels) ->
    (vit_p, head_p, opt_state, loss, cm).

    ``accum_steps=K`` runs the forward/backward over K microbatches inside
    a ``lax.scan`` and applies ONE optimizer update.  Exactness: each
    microbatch contributes the SUM-formulation loss/gradient plus its
    weight total, and the division by the global weight happens once after
    the scan — so the masked-mean semantics (ragged-tail padding excluded)
    are mathematically identical to the monolithic step, differing only in
    f32 summation order (equality-tested).  Activation memory scales
    with B/K, so big-batch or high-resolution unfrozen finetunes fit one
    chip.  MoE heads (router balance is a nonlinear full-batch statistic)
    and BatchNorm backbones (full-batch variance) cannot microbatch
    exactly and raise.  The batch must divide by K.

    ``zero_mesh``: ZeRO-1 optimizer-state sharding — the Adam moments are
    pinned sharded over ``zero_axis`` (see parallel/mesh.py:zero_constrain);
    GSPMD then reduce-scatters the DP gradient into the update and
    all-gathers the parameter delta, storing 1/N of the moments per device.
    Numerics are unchanged (equality-tested).  ``zero_param_spec``: the
    trainable tree's PartitionSpec tree ({"head": ...} or
    {"head": ..., "vit": ...}) — under DPxTP it keeps the TP axis of each
    moment where the param has it (see parallel/mesh.py:zero_constrain);
    omit under pure DP.

    ``fsdp_mesh``: FSDP / ZeRO-3 — the trainable params, their gradients,
    AND the optimizer state are all pinned to the shape-driven sharded
    layout of parallel/mesh.py:fsdp_spec over ``fsdp_axis``.  GSPMD then
    stores params+moments 1/N-per-device, all-gathers each weight
    transiently where the forward/backward uses it, and reduce-scatters
    the data-parallel gradient into the sharded update.  Unlike
    ``zero_mesh`` (whose contract re-replicates the params on exit), the
    updated params STAY sharded — feed them back in and, when a consumer
    needs a replicated copy (checkpointing, a replicated eval program),
    gather once via jax.device_put.  Numerics are unchanged
    (equality-tested, tests/test_fsdp.py).  Mutually exclusive with
    ``zero_mesh`` (FSDP subsumes ZeRO-1).
    """
    if fsdp_mesh is not None and zero_mesh is not None:
        raise ValueError("fsdp_mesh and zero_mesh are mutually exclusive: "
                         "FSDP already shards the optimizer state")
    if accum_steps > 1 and head_type == "moe" and moe_dispatch == "sparse":
        raise ValueError("accum_steps>1 with moe_dispatch='sparse' changes "
                         "the capacity semantics (slots are allocated per "
                         "microbatch, not per batch, so different patches "
                         "drop) — use the dense dispatch or accum_steps=1")
    if accum_steps > 1 and backbone != "vit":
        raise ValueError("accum_steps>1 needs full-batch BatchNorm "
                         "statistics for cnn backbones — use accum_steps=1")

    def loss_fn(trainable, static_vit, images, labels, mask):
        vit_p = static_vit if freeze_backbone else trainable["vit"]
        # With the Pallas flash backward the attention bwd is memory-linear,
        # so storing block activations is affordable (and ~20% faster) at
        # training scales; rematerialize only when the activation footprint
        # gets large (big batch x long sequence, e.g. 960px batch 16).
        n_tokens = images.shape[0] * (images.shape[1] // cfg.patch_size) ** 2
        remat = (not freeze_backbone) and n_tokens > 200_000
        bn_collect = {} if backbone != "vit" else None
        feat_sink = {} if head_type == "moe" else None
        logp = seg_forward(vit_p, trainable["head"], cfg, head_type, images,
                           compute_dtype=compute_dtype, backbone=backbone,
                           remat=remat, bn_collect=bn_collect,
                           feat_sink=feat_sink, moe_dispatch=moe_dispatch,
                           moe_capacity=moe_capacity)
        y = labels.reshape(-1)
        # per-sample mask -> per-patch weights (ragged tail batches are padded
        # to the static batch size; padding must not touch loss/grads/CM —
        # the reference keeps partial batches, pl_torch_modules.py:354)
        w = (None if mask is None
             else jnp.repeat(mask.astype(logp.dtype),
                             y.shape[0] // mask.shape[0]))
        loss = nll_loss(logp, y, w)
        if head_type == "moe":
            from dino_tpu.models.heads import moe_balance_loss
            # Switch-style router load-balance auxiliary (coefficient 0.01);
            # padded tail patches are excluded via w like the nll/CM
            loss = loss + 0.01 * moe_balance_loss(trainable["head"],
                                                  feat_sink["feats"],
                                                  weights=w)
        preds = jnp.argmax(logp, axis=-1)
        return loss, (confusion_matrix(preds, y, n_classes, weights=w),
                      bn_collect)

    def loss_sum_fn(trainable, static_vit, images, labels, w, f_router):
        """Per-microbatch SUM of masked per-patch losses (w = per-patch 0/1
        weights); grads of sums add exactly across microbatches, and the
        single divide by the global weight total happens after the scan.

        ``f_router`` (E,) is the FULL-BATCH routing-fraction vector for the
        MoE balance term, precomputed by the stop-grad stats pass below.
        The balance loss is E * <f, pbar> with the gradient flowing only
        through pbar (f is argmax-derived); pbar is the w-weighted mean of
        the gate probs over the whole batch, so with f held fixed the term
        is LINEAR in the per-microbatch gate-prob sums — each microbatch
        contributes 0.01 * E * <f, sum(gate*w)> here and the single divide
        by the global weight total after the scan reconstructs the
        monolithic step's loss AND gradient exactly."""
        vit_p = static_vit if freeze_backbone else trainable["vit"]
        n_tokens = images.shape[0] * (images.shape[1] // cfg.patch_size) ** 2
        remat = (not freeze_backbone) and n_tokens > 200_000
        feat_sink = {} if head_type == "moe" else None
        logp = seg_forward(vit_p, trainable["head"], cfg, head_type, images,
                           compute_dtype=compute_dtype, backbone=backbone,
                           remat=remat, feat_sink=feat_sink,
                           moe_dispatch=moe_dispatch,
                           moe_capacity=moe_capacity)
        y = labels.reshape(-1)
        picked = jnp.take_along_axis(logp, y[:, None].astype(jnp.int32),
                                     axis=1)[:, 0]
        loss_sum = -jnp.sum(picked * w)
        if head_type == "moe":
            from dino_tpu.models.heads import moe_balance_stats
            _, b_sum, _ = moe_balance_stats(trainable["head"],
                                            feat_sink["feats"], weights=w)
            loss_sum += 0.01 * f_router.shape[0] * jnp.dot(f_router, b_sum)
        preds = jnp.argmax(logp, axis=-1)
        return loss_sum, confusion_matrix(preds, y, n_classes, weights=w)

    def accum_impl(trainable, static_vit, images, labels, mask):
        k = accum_steps
        b = images.shape[0]
        mb = b // k
        n_patch = (images.shape[1] // cfg.patch_size) ** 2
        m = (jnp.ones((b,), jnp.float32) if mask is None
             else mask.astype(jnp.float32))
        w = jnp.repeat(m, n_patch).reshape(k, mb * n_patch)
        im_s = images.reshape((k, mb) + images.shape[1:])
        lab_s = labels.reshape((k, mb) + labels.shape[1:])
        w_total = jnp.maximum(jnp.sum(m) * n_patch, 1.0)

        f_router = jnp.zeros((0,), jnp.float32)
        if head_type == "moe":
            # stats pass: the full-batch routing fractions f (argmax-
            # derived, hence gradient-free) from a forward-only scan over
            # the same microbatches — memory stays O(b/k), FLOPs pay one
            # extra forward.  f then lets the gradient pass above treat
            # the balance term as linear per microbatch (exactness proof
            # in loss_sum_fn's docstring; equality-tested vs the
            # monolithic step in tests/test_moe.py).
            from dino_tpu.models.heads import moe_balance_stats
            sg = jax.lax.stop_gradient
            t_sg, v_sg = sg(trainable), sg(static_vit)
            vit_sg = v_sg if freeze_backbone else t_sg["vit"]

            def stats_body(a_acc, xs):
                im_k, w_k = xs
                sink = {}
                seg_forward(vit_sg, t_sg["head"], cfg, head_type, im_k,
                            compute_dtype=compute_dtype, backbone=backbone,
                            feat_sink=sink, moe_dispatch=moe_dispatch,
                            moe_capacity=moe_capacity)
                a_k, _, _ = moe_balance_stats(t_sg["head"], sink["feats"],
                                              weights=w_k)
                return a_acc + a_k, None

            n_exp = jax.tree.leaves(trainable["head"]["router"])[0].shape[-1]
            a_tot, _ = jax.lax.scan(stats_body,
                                    jnp.zeros((n_exp,), jnp.float32),
                                    (im_s, w))
            f_router = a_tot / w_total

        def body(carry, xs):
            g_acc, ls_acc, cm_acc = carry
            im_k, lab_k, w_k = xs
            (ls, cm), grads = jax.value_and_grad(loss_sum_fn, has_aux=True)(
                trainable, static_vit, im_k, lab_k, w_k, f_router)
            g_acc = jax.tree.map(lambda a, g: a + g.astype(jnp.float32),
                                 g_acc, grads)
            return (g_acc, ls_acc + ls, cm_acc + cm), None

        init = (jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                             trainable),
                jnp.float32(0.0),
                jnp.zeros((n_classes, n_classes), jnp.int32))
        (g_acc, ls_acc, cm), _ = jax.lax.scan(body, init, (im_s, lab_s, w))
        grads = jax.tree.map(lambda g: g / w_total, g_acc)
        return ls_acc / w_total, cm, grads

    def step(vit_p, head_p, opt_state, images, labels, mask=None):
        if accum_steps > 1 and images.shape[0] % accum_steps:
            raise ValueError(
                f"batch {images.shape[0]} must divide by "
                f"accum_steps={accum_steps} (microbatches are equal-sized)")
        if freeze_backbone:
            trainable = {"head": head_p}
            static_vit = jax.lax.stop_gradient(vit_p)
        else:
            trainable = {"head": head_p, "vit": vit_p}
            static_vit = None
        if fsdp_mesh is not None:
            # FSDP storage layout: params enter sharded; every use below
            # all-gathers transiently (XLA frees the gathered copy after
            # the consuming op)
            from dino_tpu.parallel.mesh import fsdp_constrain
            trainable = fsdp_constrain(trainable, fsdp_mesh, fsdp_axis)
        if accum_steps > 1:
            loss, cm, grads = accum_impl(trainable, static_vit, images,
                                         labels, mask)
            bn_collect = None
        else:
            (loss, (cm, bn_collect)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(trainable, static_vit, images, labels,
                                       mask)
        if zero_mesh is not None:
            from dino_tpu.parallel.mesh import zero_constrain
            opt_state = zero_constrain(opt_state, zero_mesh, zero_axis,
                                       zero_param_spec, optimizer)
        if fsdp_mesh is not None:
            # grads pinned sharded => the DP gradient sum lowers to a
            # reduce-scatter; moments mirror their params' shapes, so the
            # same shape-driven spec shards them (the step count and other
            # odd leaves fall back to replicated)
            from dino_tpu.parallel.mesh import fsdp_constrain
            grads = fsdp_constrain(grads, fsdp_mesh, fsdp_axis)
            opt_state = fsdp_constrain(opt_state, fsdp_mesh, fsdp_axis)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        if zero_mesh is not None:
            opt_state = zero_constrain(opt_state, zero_mesh, zero_axis,
                                       zero_param_spec, optimizer)
        if fsdp_mesh is not None:
            opt_state = fsdp_constrain(opt_state, fsdp_mesh, fsdp_axis)
        trainable = optax.apply_updates(trainable, updates)
        if fsdp_mesh is not None:
            # FSDP contract: the updated params STAY sharded (the next
            # step's entry constraint is already satisfied; consumers that
            # need a replica gather once outside the step)
            trainable = fsdp_constrain(trainable, fsdp_mesh, fsdp_axis)
        if zero_mesh is not None:
            # ZeRO-1 contract: the params STAY at their own sharding (the
            # update delta all-gathers back); without this pin GSPMD may
            # emit data-sharded params, which multi-host consumers (eval,
            # checkpointing) cannot materialize per-host
            from jax.sharding import NamedSharding, PartitionSpec
            p_spec = (zero_param_spec if zero_param_spec is not None else
                      jax.tree.map(lambda _: PartitionSpec(), trainable))
            trainable = jax.tree.map(
                lambda x, s: jax.lax.with_sharding_constraint(
                    x, NamedSharding(zero_mesh, s)), trainable, p_spec)
        new_head = trainable["head"]
        new_vit = vit_p if freeze_backbone else trainable["vit"]
        if bn_collect:
            # cnn backbones: fold the train-mode BN running-stat updates
            # back in (they update even when the backbone is frozen, like
            # the reference under PL train())
            from dino_tpu.models.resnet import update_bn_stats
            new_vit = update_bn_stats(new_vit, bn_collect)
        return new_vit, new_head, opt_state, loss, cm

    donate_args = (0, 1, 2) if donate else ()
    return jax.jit(step, donate_argnums=donate_args)


def make_feature_fn(cfg: ViTConfig, compute_dtype=None) -> Callable:
    """Jitted uint8 (B,res,res,3) -> (B, N_patches, D) backbone features —
    exactly the tensor seg_forward feeds the head (reference folds patches
    onto the batch axis at pl_torch_modules.py:253).

    Used by the frozen-backbone feature cache: with the backbone frozen and
    inputs non-augmented, these features are constant across epochs, so each
    unique image runs through the ViT once per fit() instead of once per
    epoch draw.  ViT only — BatchNorm backbones update running stats even
    when frozen (torch train() semantics), so their features are not
    epoch-constant.
    """
    def fn(vit_p, images_u8):
        x = normalize_imagenet(images_u8)
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
        tokens = vit_forward(vit_p, x, cfg)
        return tokens[:, 1:, :]
    return jax.jit(fn)


def make_cached_head_train_step(head_type: str, n_classes: int,
                                optimizer: optax.GradientTransformation,
                                donate: bool = True,
                                moe_dispatch: str = "dense",
                                moe_capacity: float = 1.25) -> Callable:
    """Head-only train step over a device-resident feature cache.

    step(head_p, opt_state, feats_all, labels_all, ids, mask) ->
    (head_p, opt_state, loss, cm).  ``feats_all`` is (M, N, D) for the whole
    dataset; the batch gathers by ``ids`` on device, so an epoch moves no
    pixels at all.  Loss/grad/CM semantics (incl. ragged-tail masking) are
    identical to make_train_step's frozen mode, and the optimizer state
    layout matches init_opt_state(freeze_backbone=True), so resume files
    are interchangeable between the cached and uncached paths.
    """

    def loss_fn(trainable, feats, labels, mask):
        flat = feats.reshape(-1, feats.shape[-1])
        logp = head_apply(head_type, trainable["head"], flat,
                          moe_dispatch=moe_dispatch,
                          moe_capacity=moe_capacity)
        y = labels.reshape(-1)
        w = (None if mask is None
             else jnp.repeat(mask.astype(logp.dtype),
                             y.shape[0] // mask.shape[0]))
        loss = nll_loss(logp, y, w)
        if head_type == "moe":
            from dino_tpu.models.heads import moe_balance_loss
            loss = loss + 0.01 * moe_balance_loss(trainable["head"], flat,
                                                  weights=w)
        preds = jnp.argmax(logp, axis=-1)
        return loss, confusion_matrix(preds, y, n_classes, weights=w)

    def step(head_p, opt_state, feats_all, labels_all, ids, mask=None):
        feats = jnp.take(feats_all, ids, axis=0)
        labels = jnp.take(labels_all, ids, axis=0)
        (loss, cm), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            {"head": head_p}, feats, labels, mask)
        updates, opt_state = optimizer.update(grads, opt_state,
                                              {"head": head_p})
        new = optax.apply_updates({"head": head_p}, updates)
        return new["head"], opt_state, loss, cm

    donate_args = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_args)


def make_cached_head_eval_step(head_type: str, n_classes: int,
                               moe_dispatch: str = "dense",
                               moe_capacity: float = 1.25) -> Callable:
    """Head-only eval over the full cached feature set in one device call."""
    def step(head_p, feats_all, labels_all):
        logp = head_apply(head_type, head_p,
                          feats_all.reshape(-1, feats_all.shape[-1]),
                          moe_dispatch=moe_dispatch,
                          moe_capacity=moe_capacity)
        preds = jnp.argmax(logp, axis=-1)
        return confusion_matrix(preds, labels_all.reshape(-1), n_classes)
    return jax.jit(step)


def make_eval_step(cfg: ViTConfig, head_type: str, n_classes: int,
                   compute_dtype=None, backbone: str = "vit",
                   moe_dispatch: str = "dense",
                   moe_capacity: float = 1.25) -> Callable:
    def step(vit_p, head_p, images, labels):
        logp = seg_forward(vit_p, head_p, cfg, head_type, images,
                           compute_dtype=compute_dtype, backbone=backbone,
                           moe_dispatch=moe_dispatch,
                           moe_capacity=moe_capacity)
        preds = jnp.argmax(logp, axis=-1)
        return confusion_matrix(preds, labels.reshape(-1), n_classes)
    return jax.jit(step)


def init_opt_state(optimizer: optax.GradientTransformation, vit_p: Params,
                   head_p: Params, freeze_backbone: bool):
    trainable = ({"head": head_p} if freeze_backbone
                 else {"head": head_p, "vit": vit_p})
    return optimizer.init(trainable)
