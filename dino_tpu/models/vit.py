"""TPU-native functional DINO Vision Transformer.

Behavioral spec (not a port) from the reference implementation at
``/root/reference/dt_segmentation/src/vision_transformer.py``:
  * arbitrary input resolution via bicubic pos-embed interpolation (:202-222)
  * pre-LN blocks, exact (erf) GELU, LayerNorm eps 1e-6 (:110-140, :300-304)
  * attention probabilities are first-class outputs (:68-107)
  * ``cls_mask`` path embedding N region masks in one pass (:88-99, :127-132)
  * ``forward(all, intermediate)`` / ``forward_mask`` / ``get_last_selfattention``
    / ``get_intermediate_layers`` API surface (:237-290)

Design: parameters are plain pytrees (nested dicts + a list of per-block
dicts), the forward is a pure function of (params, inputs), and all shapes are
static per resolution so XLA compiles one fused program per (res, batch).
Patchify is a reshape + matmul (MXU) instead of a conv; pos-embed resampling is
two small matmuls against host-precomputed torch-exact bicubic weights.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dino_tpu.ops.bicubic import bicubic_resize_matrix
from dino_tpu.ops.attention import multi_head_attention, _on_tpu

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 8
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    ln_eps: float = 1e-6
    img_size: int = 224
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def scale(self) -> float:
        return self.qk_scale if self.qk_scale is not None else self.head_dim ** -0.5

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size

    @property
    def mlp_hidden(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)


def vit_tiny(patch_size: int = 16, **kw) -> "ViTConfig":
    return ViTConfig(patch_size=patch_size, embed_dim=192, depth=12, num_heads=3, **kw)


def vit_small(patch_size: int = 16, **kw) -> "ViTConfig":
    return ViTConfig(patch_size=patch_size, embed_dim=384, depth=12, num_heads=6, **kw)


def vit_base(patch_size: int = 16, **kw) -> "ViTConfig":
    return ViTConfig(patch_size=patch_size, embed_dim=768, depth=12, num_heads=12, **kw)


# ---------------------------------------------------------------------------
# Initialization (matches reference init distributions: trunc_normal(std=.02)
# for linear weights / cls / pos-embed, zeros for biases, kaiming-uniform for
# the conv patch embed which reference leaves at torch Conv2d defaults).
# ---------------------------------------------------------------------------

def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std


def _linear_init(key, fan_in: int, fan_out: int, std=0.02):
    kw, _ = jax.random.split(key)
    return {
        "kernel": trunc_normal(kw, (fan_in, fan_out), std=std),
        "bias": jnp.zeros((fan_out,), jnp.float32),
    }


def _conv_default_init(key, fan_in: int, fan_out: int):
    # torch Conv2d default: kaiming_uniform(a=sqrt(5)) => U(-1/sqrt(fan_in), ...)
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "kernel": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound),
    }


def _ln_init(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def init_block_params(key, cfg: ViTConfig) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "norm1": _ln_init(cfg.embed_dim),
        "attn": {
            "qkv": _linear_init(k1, cfg.embed_dim, 3 * cfg.embed_dim),
            "proj": _linear_init(k2, cfg.embed_dim, cfg.embed_dim),
        },
        "norm2": _ln_init(cfg.embed_dim),
        "mlp": {
            "fc1": _linear_init(k3, cfg.embed_dim, cfg.mlp_hidden),
            "fc2": _linear_init(k4, cfg.mlp_hidden, cfg.embed_dim),
        },
    }


def init_vit_params(key, cfg: ViTConfig, depth: Optional[int] = None) -> Params:
    """Random-init ViT params. ``depth`` overrides cfg.depth (block truncation)."""
    depth = cfg.depth if depth is None else depth
    keys = jax.random.split(key, depth + 4)
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    return {
        "cls_token": trunc_normal(keys[0], (1, 1, cfg.embed_dim)),
        "pos_embed": trunc_normal(keys[1], (1, cfg.num_patches + 1, cfg.embed_dim)),
        "patch_embed": _conv_default_init(keys[2], patch_dim, cfg.embed_dim),
        "blocks": [init_block_params(keys[4 + i], cfg) for i in range(depth)],
        "norm": _ln_init(cfg.embed_dim),
    }


# ---------------------------------------------------------------------------
# Forward building blocks
# ---------------------------------------------------------------------------

def layer_norm(p: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def dense(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "kernel_i8" in p:  # int8 serving params (ops/quant.py)
        from dino_tpu.ops.quant import int8_dense
        return int8_dense(p, x)
    y = jnp.dot(x, p["kernel"].astype(x.dtype), preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)).astype(x.dtype)


def patchify(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, N, C*P*P) with per-patch (c, ph, pw) element order.

    The element order matches a flattened torch Conv2d weight (D, C, P, P), so a
    converted conv kernel applies as a single matmul (reference conv patchify:
    vision_transformer.py:143-158).
    """
    b, h, w, c = x.shape
    p = patch_size
    gh, gw = h // p, w // p
    x = x.reshape(b, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, gh, gw, C, P, P
    return x.reshape(b, gh * gw, c * p * p)


@functools.lru_cache(maxsize=None)
def _pos_interp_mats(grid_in: int, rows_out: int, cols_out: int):
    """Torch-exact bicubic weight matrices for pos-embed resampling.

    Mirrors the reference's quirky axis pairing: the first ('w0') scale factor
    is applied to the row axis (vision_transformer.py:215-219), and the +0.1
    anti-round-off hack enters both the scale and (via floor) the output size.
    With square grids the pairing is symmetric anyway.
    """
    wr = bicubic_resize_matrix(grid_in, (rows_out + 0.1) / grid_in)
    wc = bicubic_resize_matrix(grid_in, (cols_out + 0.1) / grid_in)
    assert wr.shape[0] == rows_out and wc.shape[0] == cols_out
    return wr, wc


def interpolate_pos_encoding(pos_embed: jnp.ndarray, h: int, w: int,
                             patch_size: int) -> jnp.ndarray:
    """Resample (1, N+1, D) pos-embed to an image of (h, w) pixels.

    Differentiable (pos-embed may be finetuned); the weights are trace-time
    constants so each resolution compiles to two fixed matmuls.
    """
    n = pos_embed.shape[1] - 1
    gh, gw = h // patch_size, w // patch_size
    if gh * gw == n and h == w:
        return pos_embed
    grid_in = int(math.isqrt(n))
    cls_pos = pos_embed[:, :1]
    patch_pos = pos_embed[0, 1:].reshape(grid_in, grid_in, -1)
    wr, wc = _pos_interp_mats(grid_in, gh, gw)
    out = jnp.einsum("rg,ghd->rhd", jnp.asarray(wr), patch_pos.astype(jnp.float32))
    out = jnp.einsum("ch,rhd->rcd", jnp.asarray(wc), out)
    out = out.reshape(1, gh * gw, -1).astype(pos_embed.dtype)
    return jnp.concatenate([cls_pos, out], axis=1)


def prepare_tokens(params: Params, x: jnp.ndarray, cfg: ViTConfig) -> jnp.ndarray:
    """(B, H, W, 3) image -> (B, 1+N, D) tokens (patchify + CLS + pos-embed)."""
    if not jnp.issubdtype(x.dtype, jnp.floating):
        # The network runs in the input dtype (bf16/f32 serving modes); an
        # integer image here would silently drag every matmul and Pallas
        # kernel to uint8 (Mosaic then fails with an opaque f32->uint8
        # cast error).  Raw frames must come through ops.preprocess /
        # normalize_imagenet first — fail at trace time with the contract.
        raise TypeError(
            f"prepare_tokens expects float (ImageNet-normalized) pixels, "
            f"got {x.dtype}; route raw uint8 frames through "
            f"dino_tpu.ops.preprocess")
    b, h, w, _ = x.shape
    patches = dense(params["patch_embed"], patchify(x, cfg.patch_size))
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                           (b, 1, cfg.embed_dim))
    tokens = jnp.concatenate([cls, patches], axis=1)
    pos = interpolate_pos_encoding(params["pos_embed"], h, w, cfg.patch_size)
    return tokens + pos.astype(tokens.dtype)


def drop_path(x: jnp.ndarray, rate: float, rng) -> jnp.ndarray:
    """Stochastic depth: zero the residual branch per-sample with prob
    ``rate`` and rescale (reference vision_transformer.py:27-46; dormant in
    every reference config, implemented for parity)."""
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng, shape, jnp.float32))
    return (x / keep) * mask.astype(x.dtype)


def dropout(x: jnp.ndarray, rate: float, rng) -> jnp.ndarray:
    """Inverted dropout (train-mode only; reference Mlp/Attention drop)."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def block_apply(p: Params, x: jnp.ndarray, cfg: ViTConfig,
                cls_mask: Optional[jnp.ndarray] = None,
                need_probs: bool = False,
                use_flash: bool = True,
                drop_path_rate: float = 0.0,
                rng=None):
    """One pre-LN transformer block. Returns (x_out, attn_or_None).

    Train-mode regularization (drop_rate / attn_drop_rate / drop_path_rate,
    all 0 in every reference config) engages only when ``rng`` is given;
    inference stays deterministic and rng-free.
    """
    train = rng is not None and (cfg.drop_rate > 0 or cfg.attn_drop_rate > 0
                                 or drop_path_rate > 0)
    if train:
        rng, r_attn, r_proj, r_mlp1, r_mlp2, r_dp1, r_dp2 = jax.random.split(
            rng, 7)
    y, attn = multi_head_attention(
        p["attn"], layer_norm(p["norm1"], x, cfg.ln_eps),
        num_heads=cfg.num_heads, scale=cfg.scale, cls_mask=cls_mask,
        need_probs=need_probs or cls_mask is not None, use_flash=use_flash,
        attn_drop=(cfg.attn_drop_rate, r_attn) if train
        and cfg.attn_drop_rate > 0 else None)
    if train and cfg.drop_rate > 0:
        y = dropout(y, cfg.drop_rate, r_proj)  # proj_drop (reference :78,106)
    if cls_mask is not None:
        # The CLS residual is replicated once per mask (reference :127-132).
        n_masks = cls_mask.shape[0]
        x = jnp.broadcast_to(x[:, :1, :], (x.shape[0], n_masks, x.shape[-1]))
    if train and drop_path_rate > 0.0:
        y = drop_path(y, drop_path_rate, r_dp1)
    x = x + y
    if (not train and x.dtype == jnp.bfloat16 and use_flash
            and "kernel" in p["mlp"]["fc1"] and _on_tpu()):
        # fused LN+MLP+residual Pallas kernel (bf16 TPU fast path)
        from dino_tpu.ops.fused_mlp import fused_ln_mlp_residual
        return fused_ln_mlp_residual(p["norm2"], p["mlp"], x,
                                     cfg.ln_eps), attn
    h = layer_norm(p["norm2"], x, cfg.ln_eps)
    h = dense(p["mlp"]["fc1"], h)
    h = jax.nn.gelu(h, approximate=False)
    if train and cfg.drop_rate > 0:
        h = dropout(h, cfg.drop_rate, r_mlp1)
    h = dense(p["mlp"]["fc2"], h)
    if train and cfg.drop_rate > 0:
        h = dropout(h, cfg.drop_rate, r_mlp2)
    if train and drop_path_rate > 0.0:
        h = drop_path(h, drop_path_rate, r_dp2)
    return x + h, attn


# ---------------------------------------------------------------------------
# Public forward API (mirrors the reference VisionTransformer surface)
# ---------------------------------------------------------------------------

def vit_forward(params: Params, x: jnp.ndarray, cfg: ViTConfig, *,
                all_tokens: bool = True, intermediate: int = 0,
                use_flash: bool = True, remat: bool = False) -> jnp.ndarray:
    """Forward through all (possibly truncated) blocks + final LayerNorm.

    ``intermediate=i`` returns ``norm(x)`` right after block i (1-indexed),
    matching reference ``forward(intermediate=i)`` (:237-248).
    ``remat=True`` rematerializes each block on the backward pass
    (jax.checkpoint) so backbone finetuning trades FLOPs for activation
    memory — the TPU-native answer to the reference's "might run out of GPU
    RAM" finetune caveat (run_experiment.py:115).
    """
    tokens = prepare_tokens(params, x, cfg)

    def apply_block(blk, tokens):
        return block_apply(blk, tokens, cfg, use_flash=use_flash)[0]

    if remat:
        apply_block = jax.checkpoint(apply_block)
    for i, blk in enumerate(params["blocks"]):
        tokens = apply_block(blk, tokens)
        if intermediate and i == intermediate - 1:
            return layer_norm(params["norm"], tokens, cfg.ln_eps)
    tokens = layer_norm(params["norm"], tokens, cfg.ln_eps)
    return tokens if all_tokens else tokens[:, 0]


def get_last_selfattention(params: Params, x: jnp.ndarray, cfg: ViTConfig,
                           cls_mask: Optional[jnp.ndarray] = None,
                           cls_only: bool = False) -> jnp.ndarray:
    """Attention probabilities of the final block (ref :273-280).

    Default returns the full (B, nh, N, N) matrix like the reference.
    ``cls_only=True`` computes the probabilities for the CLS query only —
    (B, nh, 1, N), O(N) memory — which is the single row every in-repo
    consumer reads (reference visualize_attention.py:50 takes
    ``attentions[0, :, 0, 1:]``; dt_utils.py:66-91 likewise).  With the
    earlier blocks on the flash kernel this makes 960px (N=14,401)
    attention maps first-class on one chip: the full matrix would be
    ~5 GB f32, the CLS row ~350 KB.
    """
    tokens = prepare_tokens(params, x, cfg)
    blocks = params["blocks"]
    for blk in blocks[:-1]:
        tokens, _ = block_apply(blk, tokens, cfg)
    if cls_only:
        from dino_tpu.ops.attention import attention_probs_xla
        p = blocks[-1]
        h = layer_norm(p["norm1"], tokens, cfg.ln_eps)
        b, n, c = h.shape
        nh, hd = cfg.num_heads, cfg.head_dim
        w = p["attn"]["qkv"]["kernel"].astype(h.dtype).reshape(c, 3, nh, hd)
        bias = p["attn"]["qkv"]["bias"].astype(jnp.float32).reshape(3, nh, hd)
        # q sliced to the CLS token BEFORE the projection: (B, nh, 1, hd)
        q_cls = jnp.einsum("bc,chd->bhd", h[:, 0, :], w[:, 0],
                           preferred_element_type=jnp.float32)
        q_cls = (q_cls + bias[0]).astype(h.dtype)[:, :, None, :]
        k = jnp.einsum("bnc,chd->bhnd", h, w[:, 1],
                       preferred_element_type=jnp.float32)
        k = (k + bias[1][None, :, None, :]).astype(h.dtype)
        return attention_probs_xla(q_cls, k, cfg.scale, cls_mask)
    _, attn = block_apply(blocks[-1], tokens, cfg, cls_mask=cls_mask,
                          need_probs=True)
    return attn


def forward_mask(params: Params, x: jnp.ndarray, cls_mask: jnp.ndarray,
                 cfg: ViTConfig) -> jnp.ndarray:
    """Embed N region masks via masked CLS attention in the last block.

    x: (1, H, W, 3); cls_mask: (N, H/P, W/P) binary. Returns (N, D)
    (reference ``forward_mask`` :250-271).
    """
    tokens = prepare_tokens(params, x, cfg)
    blocks = params["blocks"]
    for blk in blocks[:-1]:
        tokens, _ = block_apply(blk, tokens, cfg)
    tokens, _ = block_apply(blocks[-1], tokens, cfg, cls_mask=cls_mask)
    tokens = layer_norm(params["norm"], tokens, cfg.ln_eps)
    return tokens[0]


def get_intermediate_layers(params: Params, x: jnp.ndarray, cfg: ViTConfig,
                            n: int = 1, use_flash: bool = True) -> List[jnp.ndarray]:
    """Normed token outputs of the last n blocks (reference :282-290)."""
    tokens = prepare_tokens(params, x, cfg)
    depth = len(params["blocks"])
    out = []
    for i, blk in enumerate(params["blocks"]):
        tokens, _ = block_apply(blk, tokens, cfg, use_flash=use_flash)
        if depth - i <= n:
            out.append(layer_norm(params["norm"], tokens, cfg.ln_eps))
    return out


def truncate_blocks(params: Params, n_blocks: int) -> Params:
    """Keep only the first n blocks (reference ``dino.blocks = blocks[:n]``)."""
    out = dict(params)
    out["blocks"] = list(params["blocks"])[:n_blocks]
    return out
