"""Per-patch segmentation heads (MLP / Linear), functional.

Spec: dt_segmentation/src/pl_torch_modules.py:108-138 — the head is a pure
per-patch map applied after folding all patches onto the batch axis, ending in
log_softmax.  Init matches torch.nn.Linear defaults (kaiming-uniform a=sqrt(5)
=> U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias).
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _torch_linear_init(key, fan_in: int, fan_out: int) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "kernel": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound),
    }


def init_mlp_head(key, n_classes: int, input_dim: int = 384) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "layer_1": _torch_linear_init(k1, input_dim, 200),
        "layer_2": _torch_linear_init(k2, 200, 100),
        "layer_3": _torch_linear_init(k3, 100, n_classes),
    }


def init_linear_head(key, n_classes: int, input_dim: int = 384) -> Params:
    return {"layer_1": _torch_linear_init(key, input_dim, n_classes)}


def _affine(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.dot(x, p["kernel"].astype(x.dtype), preferred_element_type=jnp.float32)
    return y + p["bias"].astype(jnp.float32)


def mlp_head_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """(M, input_dim) -> (M, n_classes) log-probabilities."""
    x = jax.nn.relu(_affine(p["layer_1"], x).astype(x.dtype))
    x = jax.nn.relu(_affine(p["layer_2"], x).astype(x.dtype))
    x = _affine(p["layer_3"], x)
    return jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)


def linear_head_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    x = _affine(p["layer_1"], x)
    return jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)


def head_apply(head_type: str, p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if head_type == "mlp":
        return mlp_head_apply(p, x)
    if head_type == "linear":
        return linear_head_apply(p, x)
    raise ValueError(f"unknown head {head_type!r}")


def init_head(key, head_type: str, n_classes: int, input_dim: int = 384) -> Params:
    if head_type == "mlp":
        return init_mlp_head(key, n_classes, input_dim)
    if head_type == "linear":
        return init_linear_head(key, n_classes, input_dim)
    raise ValueError(f"unknown head {head_type!r}")
