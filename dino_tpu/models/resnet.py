"""Truncated ResNet-50 CNN backbones ('cnn1' / 'cnn2'), NHWC functional JAX.

Spec (pl_torch_modules.py:184-214): the reference benchmarks the ViT against
a DINO-pretrained ResNet-50 cut at
  * cnn1: conv1,bn1,relu,maxpool,layer1,layer2 — with the LAST bottleneck's
    relu module swapped for Identity (which silences all three relu call
    sites in that torchvision block) -> (B, 60, 60, 512) at 480px
  * cnn2: ...layer3[0],layer3[1] (relu of the last block off) followed by a
    ConvTranspose2d(1024->512, k=1, s=2, output_padding=1) + ReLU + a 3x3
    Conv(512->512) -> (B, 60, 60, 512)

Layout: NHWC activations, HWIO conv kernels (TPU-native).  BatchNorm runs
inference-mode (folded running stats) for eval/serving and batch-stat mode
with EMA running updates inside train steps (torch/PL train() semantics;
see batch_norm_train / update_bn_stats).  The transposed conv is expressed
as zero-insertion
upsampling + a 1x1 matmul — exact ConvTranspose2d(k=1,s=2,op=1) semantics,
and XLA maps it onto the MXU.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

_IMPLEMENTED = frozenset({"cnn1", "cnn2"})

# resnet50 stage layout: (blocks, mid_planes, out_planes, stride)
_STAGES = [(3, 64, 256, 1), (4, 128, 512, 2), (6, 256, 1024, 2)]


def available(name: str) -> bool:
    return name in _IMPLEMENTED


def output_dim(name: str) -> int:
    return 512  # both variants feed 512-dim patch features to the head


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
           padding: int = 0) -> jnp.ndarray:
    """NHWC conv with HWIO kernel, f32 accumulation."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def batch_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Inference-mode BN with running stats, folded to one multiply-add."""
    scale = (p["scale"] * jax.lax.rsqrt(p["var"] + eps)).astype(jnp.float32)
    bias = (p["bias"] - p["mean"] * scale).astype(jnp.float32)
    return (x.astype(jnp.float32) * scale + bias).astype(x.dtype)


def batch_norm_train(p: Params, x: jnp.ndarray, eps: float = 1e-5,
                     momentum: float = 0.1):
    """Train-mode BN: normalize with batch statistics and return the
    EMA-updated running stats (torch semantics: biased variance normalizes,
    unbiased variance feeds the running estimate, momentum 0.1).

    Returns (y, {"mean": ..., "var": ...}); the new stats carry
    stop_gradient (they are state, not a differentiable output).
    """
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean_b = jnp.mean(xf, axis=axes)
    var_b = jnp.mean(jnp.square(xf - mean_b), axis=axes)
    y = ((xf - mean_b) * jax.lax.rsqrt(var_b + eps)
         * p["scale"].astype(jnp.float32)
         + p["bias"].astype(jnp.float32)).astype(x.dtype)
    n = np.prod([x.shape[a] for a in axes])
    var_unbiased = var_b * (n / max(n - 1, 1))
    new = {"mean": (1 - momentum) * p["mean"] + momentum * mean_b,
           "var": (1 - momentum) * p["var"] + momentum * var_unbiased}
    return y, jax.tree.map(jax.lax.stop_gradient, new)


def max_pool(x: jnp.ndarray, window: int = 3, stride: int = 2,
             padding: int = 1) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else x.dtype.type(0),
        jax.lax.max, (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)])


def conv_transpose_1x1_s2(x: jnp.ndarray, w: jnp.ndarray,
                          b: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose2d(kernel=1, stride=2, output_padding=1): input pixels
    land at even output positions, everything else is bias."""
    bsz, h, wdt, _ = x.shape
    proj = jnp.dot(x, w.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    out = jnp.zeros((bsz, 2 * h, 2 * wdt, proj.shape[-1]), x.dtype)
    out = out.at[:, ::2, ::2, :].set(proj)
    return out + b.astype(jnp.float32).astype(x.dtype)


# ---------------------------------------------------------------------------
# Bottleneck blocks
# ---------------------------------------------------------------------------

def bottleneck_apply(p: Params, x: jnp.ndarray, stride: int,
                     relu_on: bool = True, bn=None) -> jnp.ndarray:
    """torchvision Bottleneck; ``relu_on=False`` replicates the reference's
    relu->Identity swap (all three activation sites off in that block).
    ``bn(params, x, path)``-style callables let the train-mode forward
    collect updated running stats."""
    if bn is None:
        bn = lambda p_, x_, path: batch_norm(p_, x_)
    act = jax.nn.relu if relu_on else (lambda y: y)
    identity = x
    out = act(bn(p["bn1"], conv2d(x, p["conv1"]), "bn1"))
    out = act(bn(p["bn2"], conv2d(out, p["conv2"], stride=stride,
                                  padding=1), "bn2"))
    out = bn(p["bn3"], conv2d(out, p["conv3"]), "bn3")
    if "downsample" in p:
        identity = bn(p["downsample"]["bn"],
                      conv2d(x, p["downsample"]["conv"], stride=stride),
                      "downsample/bn")
    return act(out + identity)


# ---------------------------------------------------------------------------
# Init + forward
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    bound = math.sqrt(2.0) / math.sqrt(fan_in)  # kaiming-normal-ish scale
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * bound


def _bn_init(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32),
            "mean": jnp.zeros((c,), jnp.float32),
            "var": jnp.ones((c,), jnp.float32)}


def init_resnet_params(key, variant: str = "cnn1") -> Params:
    keys = iter(jax.random.split(key, 128))
    params: Params = {
        "conv1": _conv_init(next(keys), 7, 7, 3, 64),
        "bn1": _bn_init(64),
        "layers": [],
    }
    n_stages = 2 if variant == "cnn1" else 3
    cin = 64
    for si, (blocks, mid, out, stride) in enumerate(_STAGES[:n_stages]):
        if variant == "cnn2" and si == 2:
            blocks = 2  # layer3[0:2] only
        stage: List[Params] = []
        for bi in range(blocks):
            s = stride if bi == 0 else 1
            block = {
                "conv1": _conv_init(next(keys), 1, 1, cin, mid),
                "bn1": _bn_init(mid),
                "conv2": _conv_init(next(keys), 3, 3, mid, mid),
                "bn2": _bn_init(mid),
                "conv3": _conv_init(next(keys), 1, 1, mid, out),
                "bn3": _bn_init(out),
            }
            if bi == 0:
                block["downsample"] = {
                    "conv": _conv_init(next(keys), 1, 1, cin, out),
                    "bn": _bn_init(out),
                }
            stage.append(block)
            cin = out
        params["layers"].append(stage)
    if variant == "cnn2":
        params["upconv"] = {
            "kernel": _conv_init(next(keys), 1, 1, 1024, 512)[0, 0],
            "bias": jnp.zeros((512,), jnp.float32),
        }
        params["conv"] = {
            "kernel": _conv_init(next(keys), 3, 3, 512, 512),
            "bias": jnp.zeros((512,), jnp.float32),
        }
    return params


def resnet_backbone_apply(params: Params, x: jnp.ndarray,
                          variant: str = "cnn1",
                          bn_collect: Dict[str, Any] = None) -> jnp.ndarray:
    """(B, H, W, 3) normalized image -> (B, H/8, W/8, 512) patch features.

    Passing a dict as ``bn_collect`` switches BatchNorm to train mode (batch
    statistics normalize, like the reference under PL's train() — even with
    requires_grad off) and fills the dict with path-keyed updated running
    stats; fold them back with ``update_bn_stats``."""
    if bn_collect is None:
        bn = lambda p_, x_, path: batch_norm(p_, x_)
    else:
        def bn(p_, x_, path):
            y, new = batch_norm_train(p_, x_)
            bn_collect[path] = new
            return y
    x = jax.nn.relu(bn(params["bn1"], conv2d(x, params["conv1"],
                                             stride=2, padding=3), "bn1"))
    x = max_pool(x)
    n_stages = len(params["layers"])
    for si, stage in enumerate(params["layers"]):
        stride = _STAGES[si][3]
        for bi, block in enumerate(stage):
            last_block = (si == n_stages - 1 and bi == len(stage) - 1)
            prefix = f"layers/{si}/{bi}/"
            x = bottleneck_apply(
                block, x, stride if bi == 0 else 1,
                relu_on=not last_block,
                bn=lambda p_, x_, path, _pre=prefix: bn(p_, x_, _pre + path))
    if variant == "cnn2":
        x = jax.nn.relu(conv_transpose_1x1_s2(
            x, params["upconv"]["kernel"], params["upconv"]["bias"]))
        x = conv2d(x, params["conv"]["kernel"], padding=1) + \
            params["conv"]["bias"].astype(x.dtype)
    return x


def update_bn_stats(params: Params, bn_collect: Dict[str, Any]) -> Params:
    """Fold path-keyed running-stat updates (from a train-mode forward) back
    into the param pytree, leaving scale/bias untouched."""
    def rebuild(node):  # fresh containers, shared (possibly traced) leaves
        if isinstance(node, dict):
            return {k: rebuild(v) for k, v in node.items()}
        if isinstance(node, list):
            return [rebuild(v) for v in node]
        return node

    out = rebuild(params)

    def node_at(path: str):
        parts = path.split("/")
        node = out
        for p in parts[:-1]:
            node = node[int(p)] if p.isdigit() else node[p]
        return node, parts[-1]

    for path, stats in bn_collect.items():
        parent, leaf = node_at(path)
        parent[leaf] = dict(parent[leaf], **stats)
    return out


# ---------------------------------------------------------------------------
# torch state_dict conversion (torchvision / DINO resnet50 key naming)
# ---------------------------------------------------------------------------

def _conv_t(w: np.ndarray) -> np.ndarray:
    # torch OIHW -> HWIO
    return np.ascontiguousarray(np.asarray(w, np.float32).transpose(2, 3, 1, 0))


def _bn_t(sd, p):
    return {"scale": np.asarray(sd[p + ".weight"], np.float32),
            "bias": np.asarray(sd[p + ".bias"], np.float32),
            "mean": np.asarray(sd[p + ".running_mean"], np.float32),
            "var": np.asarray(sd[p + ".running_var"], np.float32)}


def convert_resnet_state_dict(sd: Dict[str, np.ndarray],
                              variant: str = "cnn1",
                              prefix: str = "") -> Params:
    """Convert a torchvision-style resnet50 state_dict (e.g. dino_resnet50)
    into our truncated NHWC param pytree."""
    g = lambda k: sd[prefix + k]
    params: Params = {"conv1": _conv_t(g("conv1.weight")),
                      "bn1": _bn_t(sd, prefix + "bn1"), "layers": []}
    n_stages = 2 if variant == "cnn1" else 3
    for si in range(n_stages):
        blocks = _STAGES[si][0] if not (variant == "cnn2" and si == 2) else 2
        stage = []
        for bi in range(blocks):
            b = f"{prefix}layer{si + 1}.{bi}."
            block = {
                "conv1": _conv_t(sd[b + "conv1.weight"]),
                "bn1": _bn_t(sd, b + "bn1"),
                "conv2": _conv_t(sd[b + "conv2.weight"]),
                "bn2": _bn_t(sd, b + "bn2"),
                "conv3": _conv_t(sd[b + "conv3.weight"]),
                "bn3": _bn_t(sd, b + "bn3"),
            }
            if b + "downsample.0.weight" in sd:
                block["downsample"] = {
                    "conv": _conv_t(sd[b + "downsample.0.weight"]),
                    "bn": _bn_t(sd, b + "downsample.1"),
                }
            stage.append(block)
        params["layers"].append(stage)
    if variant == "cnn2":
        if prefix + "upconv.weight" in sd:
            # torch ConvTranspose2d weight is (in, out, kH, kW); k=1 -> (in,out)
            params["upconv"] = {
                "kernel": np.asarray(sd[prefix + "upconv.weight"],
                                     np.float32)[:, :, 0, 0],
                "bias": np.asarray(sd[prefix + "upconv.bias"], np.float32)}
            params["conv"] = {
                "kernel": _conv_t(sd[prefix + "conv.weight"]),
                "bias": np.asarray(sd[prefix + "conv.bias"], np.float32)}
    return params
