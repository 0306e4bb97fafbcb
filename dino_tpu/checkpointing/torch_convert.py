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


# ---------------------------------------------------------------------------
# Inverse direction: JAX pytree -> torch / PyTorch-Lightning checkpoint.
# Completes the interop loop: a model trained (or finetuned) in dino_tpu can
# be handed back to users of the reference stack — the exported .ckpt has the
# exact key layout PL's save_hyperparameters/state_dict produce for DINOSeg
# (pl_torch_modules.py:141-237), so reference DINOSeg.load_from_checkpoint
# restores it unchanged.
# ---------------------------------------------------------------------------

def _f32(a) -> np.ndarray:
    # master params are f32; any bf16 leaf (serving trees) widens losslessly
    return np.ascontiguousarray(np.asarray(a, np.float32))


def _export_linear(sd: Dict[str, np.ndarray], p: str, lin: Params) -> None:
    sd[p + ".weight"] = _f32(lin["kernel"]).T.copy()      # (in,out)->(out,in)
    sd[p + ".bias"] = _f32(lin["bias"])


def _export_ln(sd: Dict[str, np.ndarray], p: str, ln: Params) -> None:
    sd[p + ".weight"] = _f32(ln["scale"])
    sd[p + ".bias"] = _f32(ln["bias"])


def export_vit_state_dict(params: Params, prefix: str = ""
                          ) -> Dict[str, np.ndarray]:
    """Our ViT param pytree -> torch state_dict layout (numpy values).

    Exact inverse of :func:`convert_vit_state_dict` (verified round-trip in
    tests/test_torch_export.py): Linear kernels transpose back to (out, in),
    the patchify matmul kernel folds back to the Conv2d (D, 3, P, P) weight.
    """
    sd: Dict[str, np.ndarray] = {}
    sd[prefix + "cls_token"] = _f32(params["cls_token"])
    sd[prefix + "pos_embed"] = _f32(params["pos_embed"])
    k = _f32(params["patch_embed"]["kernel"])             # (3*P*P, D)
    d = k.shape[1]
    p_sz = int(round((k.shape[0] // 3) ** 0.5))
    if 3 * p_sz * p_sz != k.shape[0]:
        raise ValueError(f"patch_embed kernel rows {k.shape[0]} are not "
                         f"3*P*P for any integer P")
    sd[prefix + "patch_embed.proj.weight"] = k.T.reshape(d, 3, p_sz, p_sz).copy()
    sd[prefix + "patch_embed.proj.bias"] = _f32(params["patch_embed"]["bias"])
    for i, blk in enumerate(params["blocks"]):
        b = f"{prefix}blocks.{i}."
        _export_ln(sd, b + "norm1", blk["norm1"])
        _export_linear(sd, b + "attn.qkv", blk["attn"]["qkv"])
        _export_linear(sd, b + "attn.proj", blk["attn"]["proj"])
        _export_ln(sd, b + "norm2", blk["norm2"])
        _export_linear(sd, b + "mlp.fc1", blk["mlp"]["fc1"])
        _export_linear(sd, b + "mlp.fc2", blk["mlp"]["fc2"])
    _export_ln(sd, prefix + "norm", params["norm"])
    return sd


def export_head_state_dict(head_params: Params, head_type: str,
                           prefix: str = "clf.") -> Dict[str, np.ndarray]:
    """MLP / Linear head pytree -> reference clf.* keys (numpy values)."""
    if head_type not in ("mlp", "linear"):
        raise ValueError(f"torch export supports the reference's mlp/linear "
                         f"heads; got {head_type!r} (the moe head has no "
                         "torch-side counterpart)")
    layers = (["layer_1", "layer_2", "layer_3"] if head_type == "mlp"
              else ["layer_1"])
    sd: Dict[str, np.ndarray] = {}
    for name in layers:
        _export_linear(sd, prefix + name, head_params[name])
    return sd


def export_pl_checkpoint(path: str, vit_params: Params,
                         head_params: Optional[Params], head_type: str,
                         hparams: Optional[Dict[str, Any]] = None,
                         epoch: int = 0, global_step: int = 0) -> None:
    """Write a PyTorch-Lightning-compatible DINOSeg ``.ckpt``.

    The file carries ``state_dict`` (``dino.`` backbone + ``clf.`` head
    prefixes) and ``hyper_parameters`` restricted to the reference
    constructor's signature (pl_torch_modules.py:144-147), with the
    ``optimizer`` entry materialized back to the torch class PL saved
    (save_hyperparameters keeps the class object).  ViT backbones only —
    the cnn1/cnn2 torch modules are nn.Sequential slices whose keys depend
    on torch.hub internals we do not reproduce.
    """
    import torch

    hp_in = dict(hparams or {})
    if hp_in.get("backbone", "vit") != "vit":
        raise ValueError("torch export supports the ViT backbone only")
    opt_name = str(hp_in.get("optimizer", "adamw")).lower()
    opt_map = {"adam": torch.optim.Adam, "adamw": torch.optim.AdamW,
               "sgd": torch.optim.SGD}
    if opt_name not in opt_map:  # don't silently re-label the optimizer
        raise ValueError(f"cannot export optimizer {opt_name!r} to a torch "
                         f"class (known: {sorted(opt_map)})")
    opt_cls = opt_map[opt_name]
    # exactly the reference __init__ signature; unknown kwargs would crash
    # PL's load_from_checkpoint replay
    hp_out: Dict[str, Any] = {
        "data_path": hp_in.get("data_path"),
        "write_path": hp_in.get("write_path"),
        "class_names": hp_in.get("class_names"),
        "head": head_type,
        "n_blocks": len(vit_params["blocks"]),
        "batch_size": hp_in.get("batch_size", 1),
        "lr": hp_in.get("lr", 1e-6),
        "optimizer": opt_cls,
        "freeze_backbone": hp_in.get("freeze_backbone", True),
        "max_epochs": hp_in.get("max_epochs", 200),
        "patience": hp_in.get("patience", 10),
        "grayscale": hp_in.get("grayscale", False),
        "n_classes": hp_in.get("n_classes", 7),
        "pretrain_on_sim": hp_in.get("pretrain_on_sim", False),
        "comet_logger": None,
        "augmented": hp_in.get("augmented", True),
        "random_init": hp_in.get("random_init", False),
        "backbone": "vit",
    }
    sd = export_vit_state_dict(vit_params, prefix="dino.")
    if head_params is not None:
        sd.update(export_head_state_dict(head_params, head_type))
    ckpt = {
        "epoch": int(epoch),
        "global_step": int(global_step),
        "pytorch-lightning_version": "1.5.10",   # the reference's pin
        # np.array(...) copy: jax-exported buffers are non-writable and
        # torch.from_numpy refuses to alias them
        "state_dict": {k: torch.from_numpy(np.array(v))
                       for k, v in sd.items()},
        "hparams_name": "kwargs",
        "hyper_parameters": hp_out,
    }
    import os
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    tmp = path + ".tmp"
    torch.save(ckpt, tmp)
    os.replace(tmp, path)   # atomic: a crash never tears an existing file
