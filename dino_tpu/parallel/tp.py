"""Shared Megatron-style tensor-parallel block math.

One implementation of the TP transformer block (qkv/fc1 column-parallel
with no communication, proj/fc2 row-parallel with one psum each riding
ICI), parametrized on the attention computation — the SP x TP composition
injects ring attention over the token shard (parallel/ring_attention.py)
and the PP x TP stages inject whole-sequence flash/XLA attention
(parallel/pipeline.py).  Numerics-critical choices (f32 bias adds, psum
placement, preferred_element_type) live HERE once, so a fix reaches every
composed mode.

Also hosts the shared composed-train-step factory: the DPxPPxTP and SPxTP
steps differ only in which vit forward they differentiate through.

The reference is single-GPU (SURVEY §2.3: no TP anywhere); this module is
part of the TPU-native parallelism extension.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from dino_tpu.models.vit import ViTConfig, layer_norm

Params = Dict[str, Any]


def tp_pack_block(blk: Params, cfg: ViTConfig) -> Params:
    """Re-lay a block's params head-aligned for explicit tensor parallelism.

    The GSPMD TP spec (parallel/mesh.py:_vit_block_spec) splits the qkv
    kernel's flat output columns, which is fine when XLA manages the
    resharding — but explicit shard_map TP needs each device to hold WHOLE
    heads (its q/k/v triples), so the qkv/proj weights are regrouped onto a
    leading head axis and sharded there.
    """
    c, nh, hd = cfg.embed_dim, cfg.num_heads, cfg.head_dim
    return {
        "norm1": blk["norm1"], "norm2": blk["norm2"],
        # (nh, C, 3, hd): head h's full q/k/v projection
        "qkv_w": blk["attn"]["qkv"]["kernel"].reshape(c, 3, nh, hd)
                 .transpose(2, 0, 1, 3),
        "qkv_b": blk["attn"]["qkv"]["bias"].reshape(3, nh, hd)
                 .transpose(1, 0, 2),                      # (nh, 3, hd)
        "proj_w": blk["attn"]["proj"]["kernel"].reshape(nh, hd, c),
        "proj_b": blk["attn"]["proj"]["bias"],
        "fc1_w": blk["mlp"]["fc1"]["kernel"],              # (C, H) col-split
        "fc1_b": blk["mlp"]["fc1"]["bias"],
        "fc2_w": blk["mlp"]["fc2"]["kernel"],              # (H, C) row-split
        "fc2_b": blk["mlp"]["fc2"]["bias"],
    }


def tp_block_spec(tp_axis: str):
    """PartitionSpecs for one tp_pack_block'd block."""
    ln = {"scale": P(), "bias": P()}
    return {
        "norm1": ln, "norm2": ln,
        "qkv_w": P(tp_axis), "qkv_b": P(tp_axis),
        "proj_w": P(tp_axis), "proj_b": P(),
        "fc1_w": P(None, tp_axis), "fc1_b": P(tp_axis),
        "fc2_w": P(tp_axis, None), "fc2_b": P(),
    }


def tp_block_apply(p: Params, tokens: jnp.ndarray, cfg: ViTConfig,
                   tp_axis: str,
                   attention_fn: Callable[[jnp.ndarray, jnp.ndarray,
                                           jnp.ndarray], jnp.ndarray]
                   ) -> jnp.ndarray:
    """One pre-LN block with head/hidden dims split over ``tp_axis``.

    ``attention_fn(q, k, v) -> out`` runs on this device's head group
    (each (B, nh_local, n, hd)) — ring attention over a sequence axis, the
    whole-sequence flash kernel, or plain XLA attention, per caller.
    """
    h = layer_norm(p["norm1"], tokens, cfg.ln_eps)
    qkv = jnp.einsum("bnc,hctd->tbhnd", h, p["qkv_w"].astype(h.dtype),
                     preferred_element_type=jnp.float32)
    qkv = (qkv + p["qkv_b"].astype(jnp.float32)
           .transpose(1, 0, 2)[:, None, :, None, :]).astype(h.dtype)
    out = attention_fn(qkv[0], qkv[1], qkv[2])
    part = jnp.einsum("bhnd,hdc->bnc", out, p["proj_w"].astype(out.dtype),
                      preferred_element_type=jnp.float32)
    attn_out = jax.lax.psum(part, tp_axis) + p["proj_b"].astype(jnp.float32)
    tokens = tokens + attn_out.astype(tokens.dtype)
    h = layer_norm(p["norm2"], tokens, cfg.ln_eps)
    h1 = jnp.dot(h, p["fc1_w"].astype(h.dtype),
                 preferred_element_type=jnp.float32)
    h1 = (h1 + p["fc1_b"].astype(jnp.float32)).astype(h.dtype)
    h1 = jax.nn.gelu(h1, approximate=False)
    part = jnp.dot(h1, p["fc2_w"].astype(h1.dtype),
                   preferred_element_type=jnp.float32)
    mlp_out = jax.lax.psum(part, tp_axis) + p["fc2_b"].astype(jnp.float32)
    return tokens + mlp_out.astype(tokens.dtype)


def make_composed_train_step(vit_forward: Callable[[Params, jnp.ndarray],
                                                   jnp.ndarray],
                             mode: str, head_type: str, n_classes: int,
                             optimizer, compute_dtype=None,
                             donate: bool = False):
    """Shared train-step factory for the composed-parallel modes.

    ``vit_forward(vit_params, x_normalized) -> (B, N+1, D) normed tokens``
    is the only thing that differs between SPxTP and DPxPPxTP; everything
    else — masked NLL over per-patch log-probs, on-device confusion
    matrix, the optimizer update — is make_train_step's contract, built
    here once.  step(vit_p, head_p, opt_state, images_u8, labels,
    mask=None) -> (vit_p, head_p, opt_state, loss, cm).
    """
    from dino_tpu.models.heads import head_apply
    from dino_tpu.ops.preprocess import normalize_imagenet
    from dino_tpu.train.loop import nll_loss
    from dino_tpu.train.metrics import confusion_matrix

    if head_type not in ("mlp", "linear"):
        raise ValueError(f"{mode} training supports the mlp/linear heads; "
                         f"got {head_type!r}")

    def step(vit_p, head_p, opt_state, images, labels, mask=None):
        x = normalize_imagenet(images)
        if compute_dtype is not None:
            x = x.astype(compute_dtype)

        def loss_fn(params):
            tokens = vit_forward(params["vit"], x)
            feats = tokens[:, 1:, :].reshape(-1, tokens.shape[-1])
            logp = head_apply(head_type, params["head"], feats)
            y = labels.reshape(-1)
            w = (None if mask is None
                 else jnp.repeat(mask.astype(logp.dtype),
                                 y.shape[0] // mask.shape[0]))
            return nll_loss(logp, y, w), (logp, y, w)

        params = {"vit": vit_p, "head": head_p}
        (loss, (logp, y, w)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        cm = confusion_matrix(jnp.argmax(logp, axis=-1), y, n_classes,
                              weights=w)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params["vit"], params["head"], opt_state, loss, cm

    return jax.jit(step, donate_argnums=(0, 1, 2) if donate else ())
