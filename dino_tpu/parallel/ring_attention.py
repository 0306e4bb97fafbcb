"""Sequence-parallel ViT forward with ring attention over an ICI mesh axis.

The reference handles its longest sequence (960px -> N=14,401 tokens) with
vanilla quadratic attention on one device (vision_transformer.py:85;
README.md:35 warns about memory).  On one chip our Pallas flash kernel already
makes that memory-linear; this module is the multi-chip extension (SURVEY §5
"long-context" row): tokens shard across a mesh axis, every block's attention
runs as a ring — each device holds its Q shard and passes K/V shards around
the ring with ``jax.lax.ppermute`` (one hop per step, riding ICI), maintaining
online-softmax state so the full (N, N) matrix never exists anywhere.

Scope: forward only (serving path); attention-probs APIs (cls_mask,
get_last_selfattention) stay on the single-chip path.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from dino_tpu.models.vit import (ViTConfig, layer_norm, dense, prepare_tokens)

Params = Dict[str, Any]

_NEG_INF = -1e30


def ring_self_attention(q, k, v, scale: float, n_real: int, axis_name: str):
    """Online-softmax attention over ring-rotated K/V shards.

    Runs INSIDE shard_map.  q/k/v: (B, nh, N_local, hd) per device; global
    key positions >= n_real are masked.  Returns (B, nh, N_local, hd).
    """
    d = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    n_local = q.shape[2]
    perm = [(i, (i + 1) % d) for i in range(d)]

    def body(carry, step):
        m, l, acc, k_cur, v_cur = carry
        src = (my - step) % d  # which shard's K/V we currently hold
        col = src * n_local + jnp.arange(n_local)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_cur,
                       preferred_element_type=jnp.float32) * scale
        s = jnp.where(col[None, None, None, :] < n_real, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v_cur.dtype), v_cur,
            preferred_element_type=jnp.float32)
        # rotate K/V one hop around the ring (overlaps with the next matmul)
        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        return (m_new, l_new, acc_new, k_next, v_next), None

    b, nh, _, hd = q.shape
    init = (jnp.full((b, nh, n_local, 1), _NEG_INF, jnp.float32),
            jnp.zeros((b, nh, n_local, 1), jnp.float32),
            jnp.zeros((b, nh, n_local, hd), jnp.float32), k, v)
    (m, l, acc, _, _), _ = jax.lax.scan(body, init, jnp.arange(d))
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_self_attention_flash(q, k, v, scale: float, n_real: int,
                              axis_name: str, interpret: bool = False):
    """Ring attention with the Pallas flash kernel per hop.

    Each hop runs the resident flash kernel on the local Q shard against the
    currently-held K/V shard (dynamic valid-key bound — the global padding
    lives in whichever shard is in hand), returning a normalized partial and
    its row log-sum-exp; partials merge online across hops exactly like the
    single-chip resident-split path.  Shard-local memory never holds an
    (N_local, N_local) score matrix, and each hop's QK^T runs at the flash
    kernel's MXU/VPU overlap instead of an XLA einsum+softmax.
    """
    from dino_tpu.ops.attention import flash_attention_with_lse_dyn

    d = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    n_local = q.shape[2]
    perm = [(i, (i + 1) % d) for i in range(d)]
    b, nh, _, hd = q.shape

    def body(carry, step):
        m, l, acc, k_cur, v_cur = carry
        src = (my - step) % d                    # whose K/V we hold
        valid = jnp.clip(n_real - src * n_local, 0, n_local)
        o_h, lse_h = flash_attention_with_lse_dyn(q, k_cur, v_cur, scale,
                                                  valid, interpret=interpret)
        lse_h = lse_h[:, :n_local, :].reshape(b, nh, n_local, 1)
        # online merge of normalized partials keyed by their lse
        m_new = jnp.maximum(m, lse_h)
        r_old = jnp.exp(m - m_new)
        r_new = jnp.exp(lse_h - m_new)
        acc = acc * r_old + o_h.astype(jnp.float32) * r_new
        l = l * r_old + r_new
        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        return (m_new, l, acc, k_next, v_next), None

    init = (jnp.full((b, nh, n_local, 1), _NEG_INF, jnp.float32),
            jnp.zeros((b, nh, n_local, 1), jnp.float32),
            jnp.zeros((b, nh, n_local, hd), jnp.float32), k, v)
    (m, l, acc, _, _), _ = jax.lax.scan(body, init, jnp.arange(d))
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def _block_seq_parallel(p: Params, tokens, cfg: ViTConfig, n_real: int,
                        axis_name: str, flash: str = "auto"):
    """One transformer block on a token shard; only attention communicates."""
    h = layer_norm(p["norm1"], tokens, cfg.ln_eps)
    b, n_local, c = h.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    qkv = dense(p["attn"]["qkv"], h).reshape(b, n_local, 3, nh, hd)
    qkv = qkv.transpose(2, 0, 3, 1, 4)
    use_flash = (flash == "force" or
                 (flash == "auto" and jax.default_backend() == "tpu"))
    if use_flash:
        out = ring_self_attention_flash(
            qkv[0], qkv[1], qkv[2], cfg.scale, n_real, axis_name,
            interpret=jax.default_backend() != "tpu")
    else:
        out = ring_self_attention(qkv[0], qkv[1], qkv[2], cfg.scale, n_real,
                                  axis_name)
    out = out.transpose(0, 2, 1, 3).reshape(b, n_local, c)
    tokens = tokens + dense(p["attn"]["proj"], out)
    h = layer_norm(p["norm2"], tokens, cfg.ln_eps)
    h = dense(p["mlp"]["fc1"], h)
    h = jax.nn.gelu(h, approximate=False)
    h = dense(p["mlp"]["fc2"], h)
    return tokens + h


def vit_forward_seq_parallel(params: Params, x, cfg: ViTConfig, mesh: Mesh,
                             seq_axis: str = "data",
                             flash: str = "auto") -> jnp.ndarray:
    """Full ViT forward with the token axis sharded over ``seq_axis``.

    x: (B, H, W, 3) normalized image (replicated).  Returns the normed tokens
    (B, N+1, D), gathered.  Numerically matches vit_forward up to reduction
    order.  ``flash``: 'auto' (Pallas kernel per hop on TPU, XLA elsewhere),
    'force' (kernel everywhere, interpret mode off-TPU), or 'off'.
    """
    d = mesh.shape[seq_axis]
    tokens = prepare_tokens(params, x, cfg)   # (B, N+1, D), replicated
    n_real = tokens.shape[1]
    pad = (-n_real) % d
    if pad:
        tokens = jnp.pad(tokens, ((0, 0), (0, pad), (0, 0)))

    param_specs = jax.tree.map(lambda _: P(), params["blocks"])
    norm_specs = jax.tree.map(lambda _: P(), params["norm"])

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, seq_axis, None), param_specs, norm_specs),
        out_specs=P(None, seq_axis, None), check_vma=False)
    def run(tok_shard, blocks, norm):
        for blk in blocks:
            tok_shard = _block_seq_parallel(blk, tok_shard, cfg, n_real,
                                            seq_axis, flash=flash)
        return layer_norm(norm, tok_shard, cfg.ln_eps)

    out = run(tokens, params["blocks"], params["norm"])
    return out[:, :n_real, :]
