"""int8 serving quantization (v5e doubles MXU throughput at int8).

Weights quantize per output channel once at serving-params build time;
activations quantize per token (dynamic row max) inside the jitted graph, so
the int8 matmul runs MXU int8x int8 -> int32 and dequantizes with two rank-1
scale vectors.  LayerNorm, softmax, GELU, the flash-attention kernel, and the
final log_softmax stay in bf16/f32 — only the fat projections (qkv, attn out,
MLP fc1/fc2: ~35% of predict time, PERF.md breakdown) change.

The reference has no quantized path (torch fp32 on GPU/CPU); this is a
TPU-serving extension gated behind ``DINOSeg(precision='int8')`` with an
accuracy test vs the bf16 path (tests/test_quant.py).
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

Params = Dict[str, Any]

_EPS = 1e-12


def quantize_dense_params(p: Params) -> Params:
    """f32 {kernel, bias} -> {kernel_i8, w_scale, bias} (per-output-channel)."""
    w = p["kernel"].astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0), _EPS) / 127.0
    wi = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return {"kernel_i8": wi, "w_scale": s, "bias": p["bias"]}


def int8_dense(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Dynamic per-token int8 matmul: y = (x_i8 @ W_i8) * s_row * s_col + b."""
    xf = x.astype(jnp.float32)
    s_row = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                        _EPS) / 127.0
    xi = jnp.clip(jnp.round(xf / s_row), -127, 127).astype(jnp.int8)
    y = jnp.dot(xi, p["kernel_i8"], preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * s_row * p["w_scale"] + p["bias"]
    return out.astype(x.dtype)


def quantize_vit_params(params: Params) -> Params:
    """Quantize the fat per-block projections of a ViT param pytree; leave
    patch embed, cls/pos, and LayerNorms in float (cheap or
    precision-critical)."""
    out = dict(params)
    out["blocks"] = [
        {
            "norm1": blk["norm1"],
            "attn": {"qkv": quantize_dense_params(blk["attn"]["qkv"]),
                     "proj": quantize_dense_params(blk["attn"]["proj"])},
            "norm2": blk["norm2"],
            "mlp": {"fc1": quantize_dense_params(blk["mlp"]["fc1"]),
                    "fc2": quantize_dense_params(blk["mlp"]["fc2"])},
        }
        for blk in params["blocks"]
    ]
    return out
