"""AOT serving artifacts: export the fused predict program as StableHLO.

The reference's "serving" is synchronous Python `DINOSeg.predict()` inside a
live torch process (pl_torch_modules.py:276-300).  On TPU the whole predict
path already compiles to ONE device program (resize -> normalize -> patchify
-> ViT -> head -> argmax -> kron upsample, api.py:_predict_batch_fn); this
module serializes that program — weights baked in as constants — with
`jax.export`, so a robot/server deployment needs only jax + the artifact
file: no model code, no checkpoint loading, no Python-side tracing, and a
stable input/output contract (uint8 frames in, int32 480x480 label maps
out).

Artifacts are platform-bound (exported for the platform that traces them,
TPU in production) and shape-bound per (batch, height, width, resolution),
matching the framework's static-shape compilation policy.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_MAGIC = "dino_tpu_serving_v1"


def export_predict(model, path: str, batch_size: int = 1,
                   in_shape: Tuple[int, int] = (480, 640),
                   precision: Optional[str] = None,
                   platforms=None, n_devices: Optional[int] = None,
                   parallelism: Optional[str] = None) -> str:
    """Serialize `model.predict_batch`'s device program for a fixed input
    shape; weights are baked in as program constants.

    With ``n_devices`` the program exports DP-sharded over a
    ``(data=n_devices, model=1)`` mesh: the frame batch shards over chips,
    params replicate, and the serialized StableHLO carries the sharding
    (load-time requirement: the serving host exposes exactly that many
    devices).  ``batch_size`` must divide by ``n_devices``.

    ``parallelism='sp'`` (with ``n_devices``) exports the ring-attention
    sequence-parallel program instead: the TOKEN axis shards over the
    chips, inputs/outputs replicate — the artifact for very-high-resolution
    serving on a pod slice.

    Writes `<path>` (StableHLO bytes) and `<path>.json` (the I/O contract).
    Returns the artifact path.
    """
    res = model.resolution
    out_size = res // 8
    # always 480x480 at the reference resolutions (240/480/960); for other
    # legal resolutions the kron factor floors, exactly like the reference's
    # np.kron(pred, ones(480 // out)) (pl_torch_modules.py:297-298)
    out_hw = out_size * (480 // out_size)
    if parallelism not in (None, "sp"):
        raise ValueError(f"unsupported export parallelism {parallelism!r}")
    if parallelism == "sp" and not (n_devices and n_devices > 1):
        raise ValueError("parallelism='sp' requires n_devices >= 2 (the "
                         "token axis shards over the chips)")
    sp = parallelism == "sp"
    # _serving_params enforces the SP guards (ViT backbone, no int8) so an
    # artifact can't be exported in a configuration live serving refuses
    vit_p, head_p = model._serving_params(precision, "sp" if sp else None)
    traced = model._predict_batch_traced(  # same body as live
        precision, "sp" if sp else None, n_devices if sp else None)

    def fn(imgs_u8):
        return traced(vit_p, head_p, imgs_u8)

    in_sh = (batch_size, in_shape[0], in_shape[1], 3)
    kwargs = {"platforms": platforms} if platforms else {}
    if sp:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from dino_tpu.parallel.mesh import make_mesh
        rep = NamedSharding(make_mesh(n_devices, model_axis=1), P())
        jf = jax.jit(fn, in_shardings=(rep,), out_shardings=rep)
        spec = jax.ShapeDtypeStruct(in_sh, jnp.uint8, sharding=rep)
    elif n_devices and n_devices > 1:
        if batch_size % n_devices:
            raise ValueError(f"batch_size {batch_size} must divide by "
                             f"n_devices {n_devices}")
        from dino_tpu.parallel.mesh import data_sharding
        sh = data_sharding(n_devices)
        jf = jax.jit(fn, in_shardings=(sh,), out_shardings=sh)
        spec = jax.ShapeDtypeStruct(in_sh, jnp.uint8, sharding=sh)
    else:
        jf = jax.jit(fn)
        spec = jax.ShapeDtypeStruct(in_sh, jnp.uint8)
    exported = jax.export.export(jf, **kwargs)(spec)
    blob = exported.serialize()
    with open(path, "wb") as fh:
        fh.write(blob)
    contract = {
        "magic": _MAGIC,
        "input": {"shape": list(in_sh), "dtype": "uint8"},
        "output": {"shape": [batch_size, out_hw, out_hw], "dtype": "int32"},
        "resolution": res,
        "head": model.head,
        "backbone": model.backbone,
        "precision": precision or model.precision,
        "parallelism": parallelism if sp else None,
        "platforms": list(exported.platforms),
        "nr_devices": exported.nr_devices,
    }
    with open(path + ".json", "w") as fh:
        json.dump(contract, fh, indent=1)
    return path


class ExportedPredictor:
    """Callable wrapper over a deserialized serving artifact."""

    def __init__(self, path: str):
        with open(path, "rb") as fh:
            self.exported = jax.export.deserialize(fh.read())
        self.contract = None
        if os.path.exists(path + ".json"):
            with open(path + ".json") as fh:
                self.contract = json.load(fh)
            if self.contract.get("magic") != _MAGIC:
                raise ValueError(f"{path}.json is not a dino_tpu serving "
                                 "contract")
        self._sharding = None
        if self.exported.nr_devices > 1:
            if jax.device_count() < self.exported.nr_devices:
                raise ValueError(
                    f"artifact was exported for {self.exported.nr_devices} "
                    f"devices; runtime has {jax.device_count()}")
            # SP artifacts take replicated inputs (tokens shard inside the
            # program); DP artifacts shard the batch axis.  The contract
            # sidecar records which, but sidecar-less artifacts are
            # supported (dt-serve falls back to in_avals), so when it is
            # absent read the program's own input sharding instead of
            # assuming DP.
            if self.contract is not None:
                sp_art = self.contract.get("parallelism") == "sp"
            else:
                hs = self.exported.in_shardings_hlo[0]
                sp_art = hs is not None and hs.is_replicated()
            if sp_art:
                from jax.sharding import NamedSharding, PartitionSpec as P
                from dino_tpu.parallel.mesh import make_mesh
                self._sharding = NamedSharding(
                    make_mesh(self.exported.nr_devices, model_axis=1), P())
            else:
                from dino_tpu.parallel.mesh import data_sharding
                self._sharding = data_sharding(self.exported.nr_devices)
        self._call = jax.jit(self.exported.call)

    def __call__(self, frames: np.ndarray) -> np.ndarray:
        imgs = np.asarray(frames)
        if imgs.dtype != np.uint8:
            imgs = np.clip(imgs, 0, 255).astype(np.uint8)
        if self.contract is not None:
            want = tuple(self.contract["input"]["shape"])
            if tuple(imgs.shape) != want:
                raise ValueError(
                    f"artifact expects input {want}, got {imgs.shape} "
                    "(artifacts are shape-bound; export one per shape)")
        x = (jax.device_put(imgs, self._sharding)
             if self._sharding is not None else imgs)
        return np.asarray(self._call(x))


def load_exported_predict(path: str) -> ExportedPredictor:
    return ExportedPredictor(path)
