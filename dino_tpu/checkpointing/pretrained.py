"""Pretrained DINO backbone acquisition (offline-first).

The reference downloads dino_deitsmall8_300ep_pretrain.pth from
dl.fbaipublicfiles.com on every construction (dt_utils.py:19-29).  Here weight
acquisition is an explicit, cached, offline-friendly step:

  1. explicit ``pretrained_path`` (.pth torch state_dict or converted .npz)
  2. $DINO_TPU_PRETRAINED
  3. the local cache (~/.cache/dino_tpu/<name>.npz)
  4. the torch-hub cache, if the torch artifact was ever downloaded
  5. optional network download (only if DINO_TPU_ALLOW_DOWNLOAD=1)

Converted weights are cached as .npz so subsequent loads never import torch.
"""
from __future__ import annotations

import os
import warnings
from typing import Any, Dict, Optional

import numpy as np

from dino_tpu.checkpointing.io import (flatten_params, unflatten_params)
from dino_tpu.checkpointing.torch_convert import (convert_vit_state_dict,
                                                  load_torch_file,
                                                  state_dict_to_numpy)

DINO_S8_NAME = "dino_deitsmall8_300ep_pretrain"
DINO_S8_URL = ("https://dl.fbaipublicfiles.com/dino/"
               "dino_deitsmall8_300ep_pretrain/"
               "dino_deitsmall8_300ep_pretrain.pth")


def _cache_dir() -> str:
    return os.environ.get(
        "DINO_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "dino_tpu"))


def _load_any(path: str) -> Dict[str, Any]:
    if path.endswith(".npz"):
        with np.load(path) as z:
            return unflatten_params({k: z[k] for k in z.files})
    sd = state_dict_to_numpy(load_torch_file(path))
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_vit_state_dict(sd)


def _save_cache(params: Dict[str, Any], path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **flatten_params(params))


def load_pretrained_backbone(patch_size: int = 8,
                             pretrained_path: Optional[str] = None,
                             allow_missing: bool = True
                             ) -> Optional[Dict[str, Any]]:
    """Return the full-depth pretrained ViT param pytree, or None if
    unavailable (caller falls back to random init)."""
    cache_npz = os.path.join(_cache_dir(), f"{DINO_S8_NAME}.npz")
    candidates = [
        pretrained_path,
        os.environ.get("DINO_TPU_PRETRAINED"),
        cache_npz,
    ]
    hub_dir = os.path.join(os.path.expanduser("~"), ".cache", "torch", "hub",
                           "checkpoints", f"{DINO_S8_NAME}.pth")
    candidates.append(hub_dir)
    for cand in candidates:
        if cand and os.path.exists(cand):
            params = _load_any(cand)
            if not cand.endswith(".npz"):
                _save_cache(params, cache_npz)
            return params
    if os.environ.get("DINO_TPU_ALLOW_DOWNLOAD") == "1":
        try:
            import torch.hub
            sd = torch.hub.load_state_dict_from_url(DINO_S8_URL,
                                                    map_location="cpu")
            params = convert_vit_state_dict(state_dict_to_numpy(sd))
            _save_cache(params, cache_npz)
            return params
        except Exception as e:  # pragma: no cover
            warnings.warn(f"pretrained download failed: {e}")
    if not allow_missing:
        raise FileNotFoundError(
            "No pretrained DINO weights found. Provide pretrained_path, set "
            "$DINO_TPU_PRETRAINED, or place the torch artifact in the hub cache.")
    return None


def load_pretrained_weights(path: str, checkpoint_key: Optional[str] = None
                            ) -> Dict[str, Any]:
    """Load ViT backbone params from any DINO-style torch checkpoint.

    Handles the full-pretraining checkpoints too (reference
    utils.py:71-106): an optional ``checkpoint_key`` ('teacher'/'student')
    selects the sub-state-dict, ``module.``/``backbone.`` prefixes are
    stripped, and the result converts to our param pytree.
    """
    from dino_tpu.checkpointing.torch_convert import convert_vit_state_dict
    ckpt = load_torch_file(path)
    sd = ckpt
    if checkpoint_key is not None and checkpoint_key in ckpt:
        print(f"Take key {checkpoint_key} in provided checkpoint dict")
        sd = ckpt[checkpoint_key]
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = state_dict_to_numpy(sd)
    sd = {k.replace("module.", "").replace("backbone.", ""): v
          for k, v in sd.items()}
    return convert_vit_state_dict(sd)
