"""DINOHead projection head + MultiCropWrapper (self-supervised pretraining
components; reference vision_transformer.py:314-348 and utils.py:594-629).

Dormant in the segmentation pipeline but part of the public surface.  The
weight-normed last layer is parametrized as direction ``v`` + scale ``g``
(g frozen at 1 when norm_last_layer=True, matching the reference).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp

from dino_tpu.models.vit import trunc_normal

Params = Dict[str, Any]


def init_dino_head(key, in_dim: int, out_dim: int, use_bn: bool = False,
                   norm_last_layer: bool = True, nlayers: int = 3,
                   hidden_dim: int = 2048, bottleneck_dim: int = 256) -> Params:
    if use_bn:
        raise NotImplementedError("BN variant not used by any DINO ViT config")
    nlayers = max(nlayers, 1)
    keys = jax.random.split(key, nlayers + 1)

    def lin(k, fi, fo):
        return {"kernel": trunc_normal(k, (fi, fo)),
                "bias": jnp.zeros((fo,), jnp.float32)}

    layers: List[Params] = []
    if nlayers == 1:
        layers.append(lin(keys[0], in_dim, bottleneck_dim))
    else:
        layers.append(lin(keys[0], in_dim, hidden_dim))
        for i in range(nlayers - 2):
            layers.append(lin(keys[1 + i], hidden_dim, hidden_dim))
        layers.append(lin(keys[nlayers - 1], hidden_dim, bottleneck_dim))
    v = trunc_normal(keys[nlayers], (bottleneck_dim, out_dim))
    return {
        "mlp": layers,
        "last_layer": {"v": v, "g": jnp.ones((out_dim,), jnp.float32)},
        "_meta": {"norm_last_layer": norm_last_layer, "nlayers": nlayers},
    }


def dino_head_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    layers = p["mlp"]
    for i, layer in enumerate(layers):
        x = jnp.dot(x, layer["kernel"].astype(x.dtype),
                    preferred_element_type=jnp.float32) + layer["bias"]
        x = x.astype(jnp.float32)
        if i < len(layers) - 1:
            x = jax.nn.gelu(x, approximate=False)
    # L2-normalized bottleneck then weight-normed linear (no bias)
    x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
    v = p["last_layer"]["v"].astype(jnp.float32)
    g = p["last_layer"]["g"].astype(jnp.float32)
    if p["_meta"]["norm_last_layer"]:
        g = jax.lax.stop_gradient(g)  # weight_g.requires_grad = False
    w = v * (g / (jnp.linalg.norm(v, axis=0, keepdims=True) + 1e-12))
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def multi_crop_forward(backbone_fn: Callable, head_fn: Callable,
                       crops: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """MultiCropWrapper: group crops by resolution, one backbone pass per
    group, concat CLS features, single head pass (reference utils.py:594-629).

    backbone_fn(batch (B,H,W,3)) -> (B, D); head_fn((M, D)) -> (M, K).
    """
    if not isinstance(crops, (list, tuple)):
        crops = [crops]
    outputs = []
    start = 0
    while start < len(crops):
        res = crops[start].shape[1]
        end = start
        while end < len(crops) and crops[end].shape[1] == res:
            end += 1
        batch = jnp.concatenate(crops[start:end], axis=0)
        outputs.append(backbone_fn(batch))
        start = end
    return head_fn(jnp.concatenate(outputs, axis=0))
