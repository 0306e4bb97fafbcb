"""torch/PyTorch-Lightning checkpoint -> JAX pytree conversion.

Handles both raw DINO backbone state_dicts (dino_deitsmall8_300ep_pretrain.pth,
loaded by reference dt_utils.py:19-29) and full PL DINOSeg checkpoints (the
``.ckpt`` files produced by the reference training loop, carrying
``hyper_parameters`` + ``state_dict`` with a ``dino.`` backbone prefix and a
``clf.`` head prefix).

Layout mapping (torch -> ours):
  * Linear weight (out, in)        -> kernel (in, out)  [transpose]
  * Conv2d patch embed (D, 3, P, P)-> kernel (3*P*P, D) [flatten + transpose]
  * LayerNorm weight/bias          -> scale/bias
Numpy-only; torch is imported lazily and used purely as a deserializer.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

Params = Dict[str, Any]


def _t(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, np.float32).T)


def _ln(sd: Dict[str, np.ndarray], p: str) -> Params:
    return {"scale": np.asarray(sd[p + ".weight"], np.float32),
            "bias": np.asarray(sd[p + ".bias"], np.float32)}


def _linear(sd: Dict[str, np.ndarray], p: str) -> Params:
    out = {"kernel": _t(sd[p + ".weight"])}
    if p + ".bias" in sd:
        out["bias"] = np.asarray(sd[p + ".bias"], np.float32)
    else:
        out["bias"] = np.zeros(out["kernel"].shape[1], np.float32)
    return out


def convert_vit_state_dict(sd: Dict[str, np.ndarray], prefix: str = "") -> Params:
    """Convert a (possibly truncated) ViT state_dict to our param pytree."""
    g = lambda k: sd[prefix + k]
    n_blocks = 0
    while f"{prefix}blocks.{n_blocks}.norm1.weight" in sd:
        n_blocks += 1
    conv_w = np.asarray(g("patch_embed.proj.weight"), np.float32)  # (D,3,P,P)
    d = conv_w.shape[0]
    params: Params = {
        "cls_token": np.asarray(g("cls_token"), np.float32),
        "pos_embed": np.asarray(g("pos_embed"), np.float32),
        "patch_embed": {
            "kernel": np.ascontiguousarray(conv_w.reshape(d, -1).T),
            "bias": np.asarray(g("patch_embed.proj.bias"), np.float32),
        },
        "blocks": [],
        "norm": _ln(sd, prefix + "norm"),
    }
    for i in range(n_blocks):
        b = f"{prefix}blocks.{i}."
        params["blocks"].append({
            "norm1": _ln(sd, b + "norm1"),
            "attn": {
                "qkv": _linear(sd, b + "attn.qkv"),
                "proj": _linear(sd, b + "attn.proj"),
            },
            "norm2": _ln(sd, b + "norm2"),
            "mlp": {
                "fc1": _linear(sd, b + "mlp.fc1"),
                "fc2": _linear(sd, b + "mlp.fc2"),
            },
        })
    return params


def convert_head_state_dict(sd: Dict[str, np.ndarray], head_type: str,
                            prefix: str = "clf.") -> Params:
    layers = ["layer_1"] if head_type == "linear" else ["layer_1", "layer_2", "layer_3"]
    return {name: _linear(sd, prefix + name) for name in layers}


def state_dict_to_numpy(sd) -> Dict[str, np.ndarray]:
    """Torch state_dict (tensors) -> plain numpy dict."""
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def load_torch_file(path: str) -> Dict[str, Any]:
    import torch  # lazy: only needed when actually converting torch artifacts
    return torch.load(path, map_location="cpu", weights_only=False)


def convert_pl_checkpoint(path: str) -> Tuple[Params, Optional[Params],
                                              Dict[str, Any]]:
    """PL DINOSeg .ckpt -> (vit_params, head_params, hparams).

    The reference embeds constructor kwargs via save_hyperparameters
    (pl_torch_modules.py:225); we surface them so load_from_checkpoint can
    rebuild an equivalent module.
    """
    ckpt = load_torch_file(path)
    sd = state_dict_to_numpy(ckpt.get("state_dict", ckpt))
    hparams = dict(ckpt.get("hyper_parameters", {}))
    # Optimizer classes etc. aren't JSON-serializable; keep names only.
    for k, v in list(hparams.items()):
        if not isinstance(v, (str, int, float, bool, list, dict, tuple, type(None))):
            hparams[k] = getattr(v, "__name__", str(v))
    head_type = hparams.get("head", "mlp" if "clf.layer_2.weight" in sd else "linear")
    vit_params = convert_vit_state_dict(sd, prefix="dino.")
    head_params = (convert_head_state_dict(sd, head_type)
                   if any(k.startswith("clf.") for k in sd) else None)
    return vit_params, head_params, hparams


def convert_dino_pretrain(path: str) -> Params:
    """Raw DINO backbone .pth (plain state_dict) -> ViT param pytree."""
    sd = state_dict_to_numpy(load_torch_file(path))
    return convert_vit_state_dict(sd)
