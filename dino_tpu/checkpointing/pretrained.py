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
# the reference's CNN baseline pulls torch.hub 'dino_resnet50'
# (dt_utils.py:31-40); this is the artifact that hub entrypoint downloads
DINO_RN50_NAME = "dino_resnet50_pretrain"
DINO_RN50_URL = ("https://dl.fbaipublicfiles.com/dino/"
                 "dino_resnet50_pretrain/dino_resnet50_pretrain.pth")


def _cache_dir() -> str:
    return os.environ.get(
        "DINO_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "dino_tpu"))


def _hub_cache(name: str) -> str:
    return os.path.join(os.path.expanduser("~"), ".cache", "torch", "hub",
                        "checkpoints", f"{name}.pth")


def _save_cache(params: Dict[str, Any], path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **flatten_params(params))


def _acquire(name: str, url: str, convert, env_var: str,
             pretrained_path: Optional[str], load_npz,
             allow_missing: bool, hint: str,
             hub_name: Optional[str] = None) -> Optional[Dict[str, Any]]:
    """The five-step acquisition ladder, shared by every pretrained artifact:
    explicit path -> env var -> npz cache -> torch-hub cache -> opt-in
    download.  ``name`` keys the converted npz cache; ``hub_name`` (default
    ``name``) is the torch artifact's filename in the hub cache."""
    cache_npz = os.path.join(_cache_dir(), f"{name}.npz")
    candidates = [pretrained_path, os.environ.get(env_var), cache_npz,
                  _hub_cache(hub_name or name)]
    for cand in candidates:
        if cand and os.path.exists(cand):
            if cand.endswith(".npz"):
                with np.load(cand) as z:
                    return load_npz({k: z[k] for k in z.files})
            params = convert(state_dict_to_numpy(load_torch_file(cand)))
            _save_cache(params, cache_npz)
            return params
    if os.environ.get("DINO_TPU_ALLOW_DOWNLOAD") == "1":
        try:
            import torch.hub
            sd = torch.hub.load_state_dict_from_url(url, map_location="cpu")
            params = convert(state_dict_to_numpy(sd))
            _save_cache(params, cache_npz)
            return params
        except Exception as e:  # pragma: no cover
            warnings.warn(f"pretrained download failed: {e}")
    if not allow_missing:
        raise FileNotFoundError(
            f"No pretrained weights for {name}. {hint}")
    return None


def load_pretrained_backbone(patch_size: int = 8,
                             pretrained_path: Optional[str] = None,
                             allow_missing: bool = True
                             ) -> Optional[Dict[str, Any]]:
    """Return the full-depth pretrained ViT param pytree, or None if
    unavailable (caller falls back to random init)."""

    def convert(sd):
        if "state_dict" in sd:
            sd = sd["state_dict"]
        return convert_vit_state_dict(sd)

    return _acquire(
        DINO_S8_NAME, DINO_S8_URL, convert, "DINO_TPU_PRETRAINED",
        pretrained_path, unflatten_params, allow_missing,
        "Provide pretrained_path, set $DINO_TPU_PRETRAINED, or place the "
        "torch artifact in the hub cache.")


def load_pretrained_resnet(variant: str = "cnn1",
                           pretrained_path: Optional[str] = None,
                           allow_missing: bool = True
                           ) -> Optional[Dict[str, Any]]:
    """Cached acquisition of the DINO ResNet-50 backbone (reference
    get_dino_cnn, dt_utils.py:31-40), converted to the cnn1/cnn2 param
    pytree.  Same five-step ladder as the ViT artifact; env override:
    $DINO_TPU_PRETRAINED_RESNET."""
    from dino_tpu.models.resnet import convert_resnet_state_dict

    return _acquire(
        f"{DINO_RN50_NAME}_{variant}", DINO_RN50_URL,
        lambda sd: convert_resnet_state_dict(sd, variant),
        "DINO_TPU_PRETRAINED_RESNET", pretrained_path, unflatten_params,
        allow_missing,
        "Provide pretrained_path, set $DINO_TPU_PRETRAINED_RESNET, or place "
        "dino_resnet50_pretrain.pth in the torch-hub cache.",
        hub_name=DINO_RN50_NAME)


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
