"""Attention ops: Pallas flash-attention (TPU) + XLA reference path.

The reference computes vanilla O(N^2) attention that always materializes the
probability matrix (dt_segmentation/src/vision_transformer.py:68-107), because
CLS-attention maps are a first-class API.  Here the hot path (no probs needed)
runs a Pallas online-softmax flash kernel that never materializes (N, N), which
is what makes 960px inference (N=14,401) memory-linear on one chip.  The probs
paths (``get_last_selfattention``, ``cls_mask``) use the XLA implementation.

Numerics: logits and softmax accumulate in float32 regardless of input dtype.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable when running on pure-CPU test rigs
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

Params = Dict[str, Any]

_NEG_INF = -1e30


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# XLA reference attention (materializes probabilities)
# ---------------------------------------------------------------------------

def attention_probs_xla(q: jnp.ndarray, k: jnp.ndarray, scale: float,
                        cls_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Probabilities (B, nh, Nq, N). With cls_mask: (1, nh, n_masks, N).

    cls_mask semantics (reference :88-99): binary masks multiply the CLS-row
    *logits* (zeroing, not -inf), after prepending a zero for the CLS column.
    """
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if cls_mask is not None:
        n_masks = cls_mask.shape[0]
        flat = cls_mask.reshape(n_masks, -1).astype(jnp.float32)
        flat = jnp.concatenate(
            [jnp.zeros((n_masks, 1), jnp.float32), flat], axis=1)  # (n_masks, N)
        logits = logits[0:1, :, 0:1, :] * flat[None, None, :, :]
    return jax.nn.softmax(logits, axis=-1)


def attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
                  cls_mask: Optional[jnp.ndarray] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    probs = attention_probs_xla(q, k, scale, cls_mask)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out, probs


# ---------------------------------------------------------------------------
# Pallas flash attention (forward)
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  scale: float, n_real: int, block_k: int):
    """Online-softmax flash attention step for one (bh, q-block, k-block).

    Grid is (B*nh, num_q_blocks, num_k_blocks) with the k dimension innermost,
    so the softmax running state (m, l, acc) lives in VMEM scratch across the
    k sweep and only small K/V blocks are ever resident — VMEM stays O(block)
    at any sequence length (960px => N=14,401 runs in <1MB of VMEM).
    """
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                       # (BQ, hd), input dtype
    kb = k_ref[0]                                      # (BK, hd)
    vb = v_ref[0]
    # matmul in the input dtype (bf16 rides the MXU fast path), f32 accum;
    # scale applied post-matmul like the reference (q @ k.T) * scale
    s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ik * block_k
    s = jnp.where(col < n_real, s, _NEG_INF)

    m_prev = m_scr[:, :1]                              # (BQ, 1)
    l_prev = l_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jnp.dot(
        p.astype(vb.dtype), vb, preferred_element_type=jnp.float32)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:, :1], 1e-30)).astype(o_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, scale: float, interpret: bool = False):
    """Flash attention over (B, nh, N, hd) -> (B, nh, N, hd); fp32 accumulation.

    Forward runs the Pallas online-softmax kernel; the backward pass (used only
    by the finetune path at training resolutions) recomputes the XLA attention
    and differentiates it, trading memory during training for zero extra kernel
    surface in round 1.
    """
    return _flash_fwd_impl(q, k, v, scale, interpret)


def _flash_fwd_impl(q, k, v, scale, interpret):
    b, nh, n, hd = q.shape
    block_q = min(512, max(8, 1 << (n - 1).bit_length()))
    block_k = min(1024, max(8, 1 << (n - 1).bit_length()))

    qf = _pad_to(q.reshape(b * nh, n, hd), 1, block_q)
    kf = _pad_to(k.reshape(b * nh, n, hd), 1, block_k)
    vf = _pad_to(v.reshape(b * nh, n, hd), 1, block_k)

    kernel = functools.partial(_flash_kernel, scale=scale, n_real=n,
                               block_k=block_k)
    if pltpu is None:  # pragma: no cover
        raise RuntimeError("pallas TPU backend unavailable; use attention_xla")
    scratch = [pltpu.VMEM((block_q, 128), jnp.float32),   # running max
               pltpu.VMEM((block_q, 128), jnp.float32),   # running denom
               pltpu.VMEM((block_q, hd), jnp.float32)]    # output accumulator
    out = pl.pallas_call(
        kernel,
        grid=(b * nh, qf.shape[1] // block_q, kf.shape[1] // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bh, iq, ik: (bh, iq, 0)),
            pl.BlockSpec((1, block_k, hd), lambda bh, iq, ik: (bh, ik, 0)),
            pl.BlockSpec((1, block_k, hd), lambda bh, iq, ik: (bh, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda bh, iq, ik: (bh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b * nh, qf.shape[1], hd), q.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :n, :].reshape(b, nh, n, hd)


def _flash_fwd_rule(q, k, v, scale, interpret):
    return _flash_fwd_impl(q, k, v, scale, interpret), (q, k, v)


def _flash_bwd_rule(scale, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: attention_xla(q_, k_, v_, scale)[0],
                     q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


# ---------------------------------------------------------------------------
# Full multi-head attention layer (qkv proj -> attention -> out proj)
# ---------------------------------------------------------------------------

def multi_head_attention(p: Params, x: jnp.ndarray, *, num_heads: int,
                         scale: float, cls_mask: Optional[jnp.ndarray] = None,
                         need_probs: bool = False, use_flash: bool = True
                         ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Reference-equivalent MHSA returning (out, attn_probs_or_None).

    Matches Attention.forward (reference :80-107) including the cls_mask path
    where the output collapses to one token per mask.
    """
    b, n, c = x.shape
    hd = c // num_heads
    qkv = jnp.dot(x, p["qkv"]["kernel"].astype(x.dtype),
                  preferred_element_type=jnp.float32)
    qkv = (qkv + p["qkv"]["bias"].astype(jnp.float32)).astype(x.dtype)
    qkv = qkv.reshape(b, n, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # (B, nh, N, hd)

    probs = None
    if need_probs or cls_mask is not None:
        out, probs = attention_xla(q, k, v, scale, cls_mask=cls_mask)
    elif use_flash and _on_tpu():
        out = flash_attention(q, k, v, scale)
    else:
        out, _ = attention_xla(q, k, v, scale)

    nq = out.shape[2]
    out = out.transpose(0, 2, 1, 3).reshape(out.shape[0], nq, c)
    out = jnp.dot(out, p["proj"]["kernel"].astype(out.dtype),
                  preferred_element_type=jnp.float32)
    out = (out + p["proj"]["bias"].astype(jnp.float32)).astype(x.dtype)
    return out, probs
