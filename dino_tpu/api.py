"""DINOSeg: the public task API (load_from_checkpoint / set_resolution /
predict / fit), TPU-native.

Replicates the reference DINOSeg LightningModule surface
(pl_torch_modules.py:141-440) on a functional JAX core:

  * ``predict`` always returns a 480x480 int label map regardless of the
    inference resolution (:276-300); preprocessing (cv2-compatible resize,
    ImageNet normalize), the ViT forward (Pallas flash attention), the head,
    argmax, and the kron upsample all run in ONE jitted device program per
    (input-shape, resolution); a single uint8 host->device transfer in, a
    single int32 480x480 transfer out.
  * hyperparameters are embedded in checkpoints so ``load_from_checkpoint``
    rebuilds the module (:225); torch PL .ckpt files are converted on the fly.
  * ``fit`` runs the frozen-or-finetuned training loop with val-acc
    checkpointing, optional sim pretraining, and a final test pass (:365-432).
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dino_tpu.checkpointing.io import load_checkpoint, save_checkpoint
from dino_tpu.checkpointing.pretrained import load_pretrained_backbone
from dino_tpu.checkpointing.torch_convert import convert_pl_checkpoint
from dino_tpu.data.dataset import DuckieSegDataset, batched_loader, epoch_indices
from dino_tpu.models.heads import init_head
from dino_tpu.models.vit import (ViTConfig, get_last_selfattention,
                                 init_vit_params, truncate_blocks)
from dino_tpu.ops.preprocess import preprocess
from dino_tpu.ops.upsample import kron_upsample
from dino_tpu.train.loop import (init_opt_state, make_eval_step,
                                 make_optimizer, make_train_step, seg_forward)
from dino_tpu.train.metrics import segmentation_metrics

def _matmul_ctx(compute_dtype):
    """fp32 serving means *real* f32 matmuls: on TPU the default matmul
    precision rounds f32 operands to bf16 on the MXU, so two differently
    tiled programs (batch-1 vs batch-N, live vs AOT-exported) can flip
    argmax on near-tie patches even in "fp32".  Forcing 'highest' inside
    the traced serving fns makes every fp32 program bit-identical."""
    if compute_dtype is None:
        return jax.default_matmul_precision("highest")
    return contextlib.nullcontext()


def _pad_tail(arrs, b: int):
    """Pad each array's leading axis to ``b`` by repeating its last element;
    returns (padded_arrs, mask) where mask flags the real rows.  The padding
    is masked out of loss/grads/CM downstream — the reference trains on
    partial batches (pl_torch_modules.py:354), we pad-and-mask for static
    shapes."""
    n_real = arrs[0].shape[0]
    mask = np.zeros((b,), np.float32)
    mask[:n_real] = 1.0
    if n_real != b:
        arrs = [np.concatenate([a, np.repeat(a[-1:], b - n_real, axis=0)])
                for a in arrs]
    return arrs, mask


_HPARAM_KEYS = ("data_path", "write_path", "class_names", "head", "n_blocks",
                "batch_size", "lr", "optimizer", "freeze_backbone",
                "max_epochs", "patience", "grayscale", "n_classes",
                "pretrain_on_sim", "augmented", "random_init", "backbone",
                "train_resolution", "precision", "n_experts", "moe_dispatch",
                "moe_capacity")


def _pp_restack(pp_state: Dict[str, Any], vit_params: Dict[str, Any]) -> None:
    """Build fit('pp')'s stage-sharded {stacked, rest} layout from
    standard-layout params (at setup AND after a resume restore — the one
    place the chunk/stage packing is spelled out in this module)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dino_tpu.parallel.pipeline import (stack_block_chunks,
                                            stack_block_stages)
    pp_state["rest"] = {k: v for k, v in vit_params.items() if k != "blocks"}
    if pp_state["schedule"] == "interleaved_1f1b":
        pp_state["stacked"] = jax.device_put(
            stack_block_chunks(vit_params["blocks"], pp_state["n_stages"],
                               pp_state["chunks"]),
            NamedSharding(pp_state["mesh"], P(None, "stage")))
    else:
        pp_state["stacked"] = jax.device_put(
            stack_block_stages(vit_params["blocks"], pp_state["n_stages"]),
            NamedSharding(pp_state["mesh"], P("stage")))


def _pp_unstack(pp_state: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`_pp_restack`: standard-layout vit params from the
    stage-sharded stacked state (host-side copy, replicated on re-upload)."""
    from dino_tpu.parallel.pipeline import (unstack_block_chunks,
                                            unstack_block_stages)
    # multi-host: the stage slabs live 1/S per device across every process,
    # so host-side unstacking first gathers them collectively (every rank
    # calls _pp_unstack at the same epoch-end point; single-host leaves are
    # fully addressable and pass through)
    from dino_tpu.parallel.mesh import gather_if_sharded
    stacked_np = jax.tree.map(np.asarray,
                              gather_if_sharded(pp_state["stacked"]))
    if pp_state["schedule"] == "interleaved_1f1b":
        blocks = unstack_block_chunks(stacked_np, pp_state["n_stages"],
                                      pp_state["chunks"])
    else:
        blocks = unstack_block_stages(stacked_np, pp_state["n_stages"])
    blocks = [jax.tree.map(jnp.asarray, b) for b in blocks]
    return dict(pp_state["rest"], blocks=blocks)


class DINOSeg:
    """DINO backbone + per-patch segmentation head."""

    def __init__(self, data_path: Optional[str] = None,
                 write_path: Optional[str] = None,
                 class_names=None, head: str = "linear", n_blocks: int = 1,
                 batch_size: int = 1, lr: float = 1e-6,
                 optimizer: str = "adamw", freeze_backbone: bool = True,
                 max_epochs: int = 200, patience: int = 10,
                 grayscale: bool = False, n_classes: int = 7,
                 pretrain_on_sim: bool = False, logger=None,
                 augmented: bool = True, random_init: bool = False,
                 backbone: str = "vit", pretrained_path: Optional[str] = None,
                 seed: int = 0, train_resolution: int = 480,
                 precision: str = "bf16", n_experts: int = 4,
                 moe_dispatch: str = "dense", moe_capacity: float = 1.25,
                 comet_logger=None, _vit_params=None, _head_params=None):
        if logger is None and comet_logger is not None:
            logger = comet_logger  # reference kwarg name (:144-147)
        if backbone != "vit":
            from dino_tpu.models.resnet import available as _resnet_available
            if not _resnet_available(backbone):
                raise ValueError(f"unsupported backbone {backbone!r}")
        if isinstance(optimizer, type):  # torch-style class, for API parity
            optimizer = optimizer.__name__.lower()

        self.hparams: Dict[str, Any] = {
            k: v for k, v in dict(
                data_path=data_path, write_path=write_path,
                class_names=list(class_names) if class_names else None,
                head=head, n_blocks=n_blocks, batch_size=batch_size, lr=lr,
                optimizer=optimizer, freeze_backbone=freeze_backbone,
                max_epochs=max_epochs, patience=patience, grayscale=grayscale,
                n_classes=n_classes, pretrain_on_sim=pretrain_on_sim,
                augmented=augmented, random_init=random_init,
                backbone=backbone, train_resolution=train_resolution,
                precision=precision, n_experts=n_experts,
                moe_dispatch=moe_dispatch,
                moe_capacity=float(moe_capacity)).items()}
        self.__dict__.update(self.hparams)
        self.class_names = tuple(class_names) if class_names else None
        self.logger = logger
        self.cfg = ViTConfig(patch_size=8)  # ViT-S/8
        if precision not in ("bf16", "fp32", "int8"):
            raise ValueError(f"unsupported precision {precision!r}")
        if precision == "int8" and backbone != "vit":
            raise ValueError("precision='int8' is only supported for the ViT "
                             "backbone")
        if moe_dispatch not in ("dense", "sparse"):
            raise ValueError(f"unsupported moe_dispatch {moe_dispatch!r}")
        # capacity-bounded sparse dispatch (models/heads.py:
        # moe_head_apply_sparse) vs the exact dense-over-experts combine;
        # threaded to every head_apply via these static kwargs
        self._head_kwargs = dict(moe_dispatch=moe_dispatch,
                                 moe_capacity=float(moe_capacity))
        self.precision = precision
        # int8 quantizes the fat projections only; everything else runs bf16
        self.compute_dtype = (jnp.bfloat16 if precision in ("bf16", "int8")
                              else None)
        self._int8_cache = None  # (master_params_id, quantized_tree)
        self._tp_cache = None  # (vit_id, head_id, vit_sharded, head_sharded)
        self.mlp_input_dim = self.cfg.embed_dim  # cnn backbones override
        self.resolution = 480
        self.best_ck: Optional[str] = None
        self._jit_cache: Dict[Tuple, Any] = {}

        key = jax.random.PRNGKey(seed)
        kv, kh = jax.random.split(key)
        if backbone != "vit":
            # truncated ResNet-50 CNN baseline (reference cnn1/cnn2)
            from dino_tpu.models.resnet import (convert_resnet_state_dict,
                                                init_resnet_params, output_dim)
            self.mlp_input_dim = output_dim(backbone)
            if _vit_params is not None:
                self.vit_params = _vit_params
            elif pretrained_path:
                from dino_tpu.checkpointing.torch_convert import (
                    load_torch_file, state_dict_to_numpy)
                sd = state_dict_to_numpy(load_torch_file(pretrained_path))
                self.vit_params = convert_resnet_state_dict(sd, backbone)
            elif random_init:
                self.vit_params = init_resnet_params(kv, backbone)
            else:
                # same cached-acquisition ladder as the ViT artifact
                # (reference pulls dino_resnet50 via torch.hub every init,
                # dt_utils.py:31-40)
                from dino_tpu.checkpointing.pretrained import (
                    load_pretrained_resnet)
                full = load_pretrained_resnet(backbone)
                if full is None:
                    import warnings
                    warnings.warn(
                        "pretrained dino_resnet50 unavailable; using random "
                        "init (set $DINO_TPU_PRETRAINED_RESNET)")
                    self.vit_params = init_resnet_params(kv, backbone)
                else:
                    self.vit_params = full
        elif _vit_params is not None:
            self.vit_params = _vit_params
        elif random_init:
            self.vit_params = init_vit_params(kv, self.cfg, depth=n_blocks)
        else:
            full = load_pretrained_backbone(patch_size=8,
                                            pretrained_path=pretrained_path)
            if full is None:
                import warnings
                warnings.warn("pretrained DINO weights unavailable; using "
                              "random init (set $DINO_TPU_PRETRAINED)")
                self.vit_params = init_vit_params(kv, self.cfg, depth=n_blocks)
            else:
                self.vit_params = truncate_blocks(full, n_blocks)
        self.head_params = (_head_params if _head_params is not None else
                            init_head(kh, head, n_classes, self.mlp_input_dim,
                                      n_experts=n_experts))

        if data_path is not None:
            self.train_path = os.path.join(data_path, "dt_real_voc_train")
            self.val_path = os.path.join(data_path, "dt_real_voc_val")
            self.test_path = os.path.join(data_path, "dt_real_voc_test")
            self.train_path_sim = os.path.join(data_path, "dt_sim_voc_train")
            self.val_path_sim = os.path.join(data_path, "dt_sim_voc_val")
            self.test_path_sim = os.path.join(data_path, "dt_sim_voc_test")
        self.write_path = write_path

    # ------------------------------------------------------------------
    # Inference API
    # ------------------------------------------------------------------

    def set_resolution(self, resolution: int = 480) -> None:
        if resolution % 8 != 0:
            raise ValueError("Resolution should be a multiple of 8.")
        self.resolution = resolution

    def _serving_vit_params(self, precision: Optional[str] = None):
        """Backbone params for the inference paths: the f32 masters, or (in
        int8 mode) a per-output-channel-quantized tree derived from them,
        rebuilt lazily whenever the masters change (e.g. after fit)."""
        self._check_precision(precision)
        if (precision or self.precision) != "int8":
            return self.vit_params
        if (self._int8_cache is None
                or self._int8_cache[0] is not self.vit_params):
            from dino_tpu.ops.quant import quantize_vit_params
            self._int8_cache = (self.vit_params,
                                quantize_vit_params(self.vit_params))
        return self._int8_cache[1]

    def forward(self, images_u8: np.ndarray) -> jnp.ndarray:
        """uint8 (B,res,res,3) -> (B*N, n_classes) log-probs (ref :239-256)."""
        return seg_forward(self.vit_params, self.head_params, self.cfg,
                           self.head, jnp.asarray(images_u8),
                           compute_dtype=self.compute_dtype,
                           backbone=self.backbone, **self._head_kwargs)

    def _check_precision(self, precision: Optional[str]):
        if precision is None:
            return
        if precision not in ("bf16", "fp32", "int8"):
            raise ValueError(f"unsupported precision {precision!r}")
        if precision == "int8" and self.backbone != "vit":
            raise ValueError("precision='int8' is only supported for the "
                             "ViT backbone")

    def _compute_dtype_for(self, precision: Optional[str]):
        if precision is None:
            return self.compute_dtype
        self._check_precision(precision)
        return jnp.bfloat16 if precision in ("bf16", "int8") else None

    def _predict_fn(self, in_shape: Tuple[int, int],
                    precision: Optional[str] = None):
        key = ("predict", in_shape, self.resolution, precision)
        if key not in self._jit_cache:
            res = self.resolution
            cfg, head_type = self.cfg, self.head
            cdt, bb = self._compute_dtype_for(precision), self.backbone
            hk = dict(self._head_kwargs)
            out_size = res // 8
            factor = 480 // out_size

            wire_dtype = jnp.uint8 if self.n_classes <= 255 else jnp.int32

            @jax.jit
            def fn(vit_p, head_p, img_u8):
                with _matmul_ctx(cdt):
                    x = preprocess(img_u8[None], res)
                    logp = seg_forward(vit_p, head_p, cfg, head_type,
                                       images_u8=None, pre_normalized=x,
                                       compute_dtype=cdt, backbone=bb, **hk)
                low = jnp.argmax(logp, axis=-1).reshape(out_size, out_size)
                return kron_upsample(low.astype(wire_dtype), factor)

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    def predict(self, x, precision: Optional[str] = None,
                parallelism: Optional[str] = None) -> np.ndarray:
        """Single-image inference -> 480x480 int ndarray (ref :276-300).

        ``precision`` overrides the model default for this call ('fp32'
        removes bf16 batch-size-dependent argmax flips on near-tie patches).
        ``parallelism='tp'`` runs the frame tensor-parallel over every
        visible chip (Megatron-style block sharding) — the multi-chip
        batch-1 *latency* mode, where DP cannot help.
        """
        img = np.asarray(x)
        if img.dtype != np.uint8:
            img = np.clip(img, 0, 255).astype(np.uint8)
        if parallelism == "sp":  # sequence-parallel program body
            return self.predict_batch(img[None], precision, parallelism)[0]
        fn = self._predict_fn(img.shape[:2], precision)
        vit_p, head_p = self._serving_params(precision, parallelism)
        # labels ride the wire as uint8 (4x less D2H); int32 out as ever
        return np.asarray(fn(vit_p, head_p, jnp.asarray(img))).astype(
            np.int32, copy=False)

    def _serving_params(self, precision: Optional[str],
                        parallelism: Optional[str]):
        """(vit_p, head_p) placed for the requested serving parallelism.

        ``parallelism=None`` returns the plain (replicated) params;
        ``'tp'`` returns them sharded Megatron-style over a model-axis mesh
        spanning every visible device (parallel/mesh.py:_vit_block_spec),
        cached until the underlying params change.  GSPMD then partitions
        the same jitted predict program — qkv/fc1 column-parallel, proj/fc2
        row-parallel, one all-reduce per sub-layer riding ICI.
        """
        if parallelism is None:
            return self._serving_vit_params(precision), self.head_params
        if parallelism == "sp":
            # ring attention shards the TOKEN axis; params stay replicated
            # (P() inside the shard_map) — placement is a no-op here, the
            # program body changes instead (_predict_batch_fn)
            if self.backbone != "vit":
                raise ValueError("parallelism='sp' requires the ViT backbone")
            if (precision or self.precision) == "int8":
                raise ValueError("parallelism='sp' is not supported with "
                                 "int8 params")
            return self._serving_vit_params(precision), self.head_params
        if parallelism != "tp":
            raise ValueError(f"unsupported parallelism {parallelism!r}")
        if self.backbone != "vit":
            raise ValueError("parallelism='tp' requires the ViT backbone")
        if (precision or self.precision) == "int8":
            raise ValueError("parallelism='tp' is not supported with int8 "
                             "params (quantized tree has no sharding rules)")
        if self.head == "moe" and self.n_experts % jax.device_count():
            raise ValueError(
                f"parallelism='tp' with head='moe' needs n_experts divisible "
                f"by the device count ({jax.device_count()}); got "
                f"{self.n_experts}")
        vit_p = self._serving_vit_params(precision)
        if (self._tp_cache is not None and self._tp_cache[0] is vit_p
                and self._tp_cache[1] is self.head_params):
            return self._tp_cache[2], self._tp_cache[3]
        from dino_tpu.parallel.mesh import (head_param_spec, make_mesh,
                                            shard_params, vit_param_spec)
        mesh = make_mesh(model_axis=jax.device_count())
        vit_s = shard_params(vit_p, vit_param_spec(self.n_blocks), mesh)
        head_s = shard_params(self.head_params, head_param_spec(self.head),
                              mesh)
        self._tp_cache = (vit_p, self.head_params, vit_s, head_s)
        return vit_s, head_s

    def _predict_batch_traced(self, precision: Optional[str] = None,
                              parallelism: Optional[str] = None,
                              n_devices: Optional[int] = None,
                              wire_u8: bool = False):
        """The untraced batched-predict body: (vit_p, head_p, imgs_u8) ->
        (B, out, out) int32 label maps.  Shared by the live jit path and the
        AOT export (dino_tpu/serving.py) so the two programs are the same
        math by construction.

        ``wire_u8=True`` returns the label maps as uint8 instead of int32
        (valid whenever n_classes <= 255, i.e. always for this task): the
        live predict/predict_batch paths use it and cast back to int32 on
        the host, so the public contract is unchanged while the
        device->host label transfer shrinks 4x — on a bandwidth-limited
        link (the sandbox RPC tunnel here; an ethernet-attached robot
        host in deployment) the D2H bytes are a first-order serving cost
        (PERF.md "Serving: wire dtype").  The AOT export keeps int32 so
        existing artifacts' contracts are untouched.

        ``parallelism='sp'`` swaps the backbone for the ring-attention
        sequence-parallel forward: the TOKEN axis shards over every visible
        chip (K/V shards rotate over ICI, Pallas flash kernel per hop) —
        the multi-chip mode for very high resolutions, where one frame's
        14k-token sequence outgrows what a single chip should hold.
        """
        res = self.resolution
        cfg, head_type = self.cfg, self.head
        cdt, bb = self._compute_dtype_for(precision), self.backbone
        hk = dict(self._head_kwargs)
        out_size = res // 8
        factor = 480 // out_size
        wire_dtype = jnp.uint8 if wire_u8 else jnp.int32

        if parallelism == "sp":
            from dino_tpu.models.heads import head_apply
            from dino_tpu.parallel.mesh import make_mesh
            from dino_tpu.parallel.ring_attention import \
                vit_forward_seq_parallel
            mesh = make_mesh(n_devices, model_axis=1)

            def fn(vit_p, head_p, imgs_u8):
                with _matmul_ctx(cdt):
                    x = preprocess(imgs_u8, res)
                    if cdt is not None:
                        x = x.astype(cdt)
                    tokens = vit_forward_seq_parallel(vit_p, x, cfg, mesh,
                                                      seq_axis="data")
                    feats = tokens[:, 1:, :].reshape(-1, cfg.embed_dim)
                    logp = head_apply(head_type, head_p, feats, **hk)
                low = jnp.argmax(logp, axis=-1).reshape(-1, out_size,
                                                        out_size)
                return jax.vmap(
                    lambda m: kron_upsample(m, factor))(
                    low.astype(wire_dtype))

            return fn

        def fn(vit_p, head_p, imgs_u8):
            with _matmul_ctx(cdt):
                x = preprocess(imgs_u8, res)
                logp = seg_forward(vit_p, head_p, cfg, head_type,
                                   images_u8=None, pre_normalized=x,
                                   compute_dtype=cdt, backbone=bb, **hk)
            low = jnp.argmax(logp, axis=-1).reshape(-1, out_size, out_size)
            return jax.vmap(
                lambda m: kron_upsample(m, factor))(low.astype(wire_dtype))

        return fn

    def _predict_batch_fn(self, batch_shape,
                          precision: Optional[str] = None,
                          parallelism: Optional[str] = None):
        key = ("predict_batch", batch_shape, self.resolution, precision,
               parallelism if parallelism == "sp" else None)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                self._predict_batch_traced(
                    precision,
                    parallelism if parallelism == "sp" else None,
                    wire_u8=self.n_classes <= 255))
        return self._jit_cache[key]

    def predict_batch(self, images, precision: Optional[str] = None,
                      parallelism: Optional[str] = None) -> np.ndarray:
        """Batched inference: uint8 (B, H, W, 3) -> (B, 480, 480) int maps.

        The serving-throughput path: one fused device program for the whole
        batch (the single-frame reference API generalized for TPU batching).
        In bf16 mode, batch-N and batch-1 programs may flip argmax on
        near-tie patches (different matmul tilings); precision='fp32' runs
        true-f32 matmuls (matmul precision 'highest'), making every serving
        program — batch-1, batch-N, AOT-exported — bit-identical.
        ``parallelism='tp'`` shards the *model* over all chips instead of
        the batch — the latency mode for batches smaller than the device
        count (DP engages automatically for divisible batches).
        ``parallelism='sp'`` shards the token *sequence* over all chips
        (ring attention) — the mode for very high resolutions.
        """
        if isinstance(images, (list, tuple)):  # PIL images / mixed arrays
            images = np.stack([np.asarray(im) for im in images])
        imgs = np.asarray(images)
        if imgs.dtype != np.uint8:
            imgs = np.clip(imgs, 0, 255).astype(np.uint8)
        vit_p, head_p = self._serving_params(precision, parallelism)
        fn = self._predict_batch_fn(imgs.shape, precision, parallelism)
        x = (jnp.asarray(imgs) if parallelism in ("tp", "sp")
             else self._place_batch(imgs))
        # labels ride the wire as uint8 (4x less D2H); int32 out as ever
        return np.asarray(fn(vit_p, head_p, x)).astype(np.int32, copy=False)

    @staticmethod
    def _place_batch(imgs: np.ndarray):
        """One host->device transfer: DP-sharded over the data mesh when the
        batch divides the device count (params replicate and GSPMD runs each
        frame on its own chip), plain placement otherwise."""
        if (jax.device_count() > 1
                and imgs.shape[0] % jax.device_count() == 0):
            from dino_tpu.parallel.mesh import data_sharding
            return jax.device_put(imgs, data_sharding())
        return jnp.asarray(imgs)

    def predict_stream(self, frames, batch_size: int = 8,
                       precision: Optional[str] = None,
                       parallelism: Optional[str] = None):
        """Continuous inference over a frame iterator (robot-camera trace).

        Double-buffered: while the device chews on batch k, the host stacks
        batch k+1, so transfer and compute overlap.  Yields one (480, 480)
        int map per input frame, in order.  ``precision``/``parallelism``
        mean exactly what they do on :meth:`predict_batch`.  A ragged tail
        is padded to the batch size (repeat-last, the repo's pad-and-mask
        idiom) and runs through the SAME compiled program — the whole
        stream compiles exactly one batched executable per frame shape.
        """
        fn = None
        vit_p = head_p = None
        pending = None  # (device_future, n_valid)

        def place(imgs):
            return (jnp.asarray(imgs) if parallelism in ("tp", "sp")
                    else self._place_batch(imgs))

        def submit(imgs, n_valid):
            nonlocal fn, vit_p, head_p
            if fn is None:
                vit_p, head_p = self._serving_params(precision, parallelism)
                fn = self._predict_batch_fn(imgs.shape, precision,
                                            parallelism)
            return fn(vit_p, head_p, place(imgs)), n_valid

        def flush():
            nonlocal pending
            if pending is not None:
                out, n = pending
                pending = None
                for m in np.asarray(out)[:n].astype(np.int32, copy=False):
                    yield m

        batch = []
        for frame in frames:
            img = np.asarray(frame)
            if img.dtype != np.uint8:
                img = np.clip(img, 0, 255).astype(np.uint8)
            batch.append(img)
            if len(batch) == batch_size:
                fut = submit(np.stack(batch), batch_size)
                batch = []
                yield from flush()
                pending = fut
        if batch:  # ragged tail: pad to the same shape, mask on yield
            (imgs,), _ = _pad_tail([np.stack(batch)], batch_size)
            fut = submit(imgs, len(batch))
            yield from flush()
            pending = fut
        yield from flush()

    def get_intermediate_layers(self, images_u8: np.ndarray, n: int = 1):
        """Normed token outputs of the last n backbone blocks at the current
        resolution (reference dino.get_intermediate_layers, used by the
        companion agent repo)."""
        from dino_tpu.models.vit import get_intermediate_layers
        x = preprocess(jnp.asarray(images_u8), self.resolution)
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        return [np.asarray(t) for t in
                get_intermediate_layers(self.vit_params, x, self.cfg, n=n)]

    def forward_mask(self, image_u8: np.ndarray,
                     cls_mask: np.ndarray) -> np.ndarray:
        """Embed N region masks via masked CLS attention in the last block
        (reference dino.forward_mask). image: (H, W, 3) uint8; cls_mask:
        (N, res/8, res/8). Returns (N, D).

        The companion-agent hot path (reference vision_transformer.py:
        250-271 is called per frame): the mask count/shape is static per
        call site, so the whole preprocess+backbone+masked-attention graph
        jits once per (image shape, resolution, mask shape) and repeated
        frames hit the compiled program — no per-call eager dispatch."""
        from dino_tpu.models.vit import forward_mask as _forward_mask
        img = np.asarray(image_u8)
        mask = np.asarray(cls_mask)
        key = ("fmask", img.shape, self.resolution, mask.shape,
               str(mask.dtype))
        if key not in self._jit_cache:
            res, cfg = self.resolution, self.cfg

            def fn(vit_p, img_u8, m):
                x = preprocess(img_u8[None], res)
                return _forward_mask(vit_p, x, m, cfg)

            self._jit_cache[key] = jax.jit(fn)
        return np.asarray(self._jit_cache[key](
            self.vit_params, jnp.asarray(img), jnp.asarray(mask)))

    def get_last_selfattention(self, images_u8: np.ndarray,
                               cls_mask=None,
                               cls_only: bool = False) -> np.ndarray:
        """Last-block attention probabilities at the current resolution.

        ``cls_only=True`` returns only the CLS query's row — (B, nh, 1, N),
        O(N) memory — the row the attention-map consumers actually use;
        required for 960px maps (the full matrix would be ~5 GB)."""
        key = ("attn", images_u8.shape, self.resolution,
               None if cls_mask is None else np.asarray(cls_mask).shape,
               cls_only)
        if key not in self._jit_cache:
            res, cfg = self.resolution, self.cfg

            def fn(vit_p, img_u8, mask):
                x = preprocess(img_u8, res)
                return get_last_selfattention(vit_p, x, cfg, cls_mask=mask,
                                              cls_only=cls_only)

            # the mask is a static-SHAPE traced arg (the key pins its
            # shape), so the cls_mask path compiles once per mask shape
            # like every other serving path — it used to dispatch eagerly
            self._jit_cache[key] = jax.jit(fn)
        return np.asarray(self._jit_cache[key](
            self.vit_params, jnp.asarray(images_u8),
            None if cls_mask is None else jnp.asarray(cls_mask)))

    # ------------------------------------------------------------------
    # Checkpointing
    # ------------------------------------------------------------------

    def save(self, path: str, extra_hparams: Optional[Dict[str, Any]] = None,
             params: Optional[Dict[str, Any]] = None) -> None:
        """``params`` overrides the live {"vit", "head"} trees — used by the
        multi-host FSDP fit, whose live params are shards spanning other
        hosts' devices (host 0 writes the collectively gathered copy)."""
        hp = dict(self.hparams)
        if extra_hparams:
            hp.update(extra_hparams)
        save_checkpoint(path, params if params is not None
                        else {"vit": self.vit_params,
                              "head": self.head_params}, hp)

    def save_torch_checkpoint(self, path: str, epoch: int = 0,
                              global_step: int = 0) -> None:
        """Export this model as a reference-compatible PL ``.ckpt``.

        The inverse of loading a torch checkpoint: the file carries the
        exact ``dino.``/``clf.`` state_dict layout and ``hyper_parameters``
        the reference's save_hyperparameters produces
        (pl_torch_modules.py:225), so a user of the reference stack can
        ``DINOSeg.load_from_checkpoint`` a model trained here.  ViT
        backbone + mlp/linear heads only (cnn/moe have no torch-side
        counterpart in the reference checkpoint format).
        """
        from dino_tpu.checkpointing.torch_convert import export_pl_checkpoint
        export_pl_checkpoint(path, jax.tree.map(np.asarray, self.vit_params),
                             jax.tree.map(np.asarray, self.head_params),
                             self.head, hparams=self.hparams, epoch=epoch,
                             global_step=global_step)

    @classmethod
    def load_from_checkpoint(cls, path: str, **overrides) -> "DINOSeg":
        """Rebuild a DINOSeg from a native .npz checkpoint or a torch PL .ckpt."""
        if path.endswith(".ckpt") or path.endswith(".pth"):
            vit_p, head_p, hp = convert_pl_checkpoint(path)
            vit_p = jax.tree.map(jnp.asarray, vit_p)
            head_p = (jax.tree.map(jnp.asarray, head_p)
                      if head_p is not None else None)
        else:
            params, hp = load_checkpoint(path)
            vit_p = jax.tree.map(jnp.asarray, params["vit"])
            head_p = jax.tree.map(jnp.asarray, params["head"])
        kwargs = {k: hp[k] for k in _HPARAM_KEYS if k in hp}
        if isinstance(kwargs.get("optimizer"), str):
            kwargs["optimizer"] = kwargs["optimizer"].lower()
        kwargs.update(overrides)
        return cls(_vit_params=vit_p, _head_params=head_p, **kwargs)

    # ------------------------------------------------------------------
    # Training (reference fit :365-432)
    # ------------------------------------------------------------------

    def freeze_bb(self) -> None:
        self.freeze_backbone = True
        self.hparams["freeze_backbone"] = True

    def unfreeze_bb(self) -> None:
        self.freeze_backbone = False
        self.hparams["freeze_backbone"] = False

    # Dataloader surface (reference pl_torch_modules.py:347-363): generators
    # of stacked uint8/int32 batches over the VOC splits.
    def train_dataloader(self, sim: bool = False, seed: int = 0,
                         samples_per_epoch: int = 1000):
        path = self.train_path_sim if sim else self.train_path
        ds = DuckieSegDataset(path, augmented=self.augmented,
                              resolution=self.train_resolution)
        rng = np.random.default_rng(seed)
        idx = epoch_indices(rng, len(ds), samples_per_epoch)
        return batched_loader(ds, idx, self.batch_size, rng=rng)

    def val_dataloader(self, sim: bool = False):
        path = self.val_path_sim if sim else self.val_path
        ds = DuckieSegDataset(path, augmented=False,
                              resolution=self.train_resolution)
        return batched_loader(ds, np.arange(len(ds)), self.batch_size)

    def test_dataloader(self):
        ds = DuckieSegDataset(self.test_path, augmented=False,
                              resolution=self.train_resolution)
        return batched_loader(ds, np.arange(len(ds)), self.batch_size)

    def evaluate(self, data_path: str, resolution: Optional[int] = None,
                 batch_size: Optional[int] = None, prefix: str = "test",
                 per_class: bool = False):
        """Standalone metrics over one VOC-style split directory.

        The reference computes balanced accuracy / macro-F1 / macro-IoU only
        inside its Lightning fit/test loops (pl_torch_modules.py:310-341);
        this is the same computation as a one-call API (and the ``dt-eval``
        CLI) against any ``JPEGImages/`` + ``SegmentationClass/*.npy`` dir.
        Returns a metrics dict (``{prefix}_acc/_F1/_iou/_support``, plus a
        ``{prefix}_per_class`` row list when ``per_class=True``).
        """
        from dino_tpu.train.metrics import per_class_metrics_from_cm
        res = resolution or self.train_resolution
        if res % 8 != 0:  # same contract as set_resolution
            raise ValueError("Resolution should be a multiple of 8.")
        ds = DuckieSegDataset(data_path, augmented=False, resolution=res)
        if len(ds) == 0:
            raise FileNotFoundError(f"no images under {data_path}")
        eval_step = make_eval_step(self.cfg, self.head, self.n_classes,
                                   compute_dtype=self.compute_dtype,
                                   backbone=self.backbone,
                                   **self._head_kwargs)
        cm = self._run_eval(eval_step, ds, batch_size or self.batch_size)
        metrics = segmentation_metrics(cm, prefix=prefix)
        if per_class:
            metrics[f"{prefix}_per_class"] = per_class_metrics_from_cm(
                cm, self.class_names)
        return metrics

    def _run_eval(self, eval_step, dataset, batch_size: int) -> np.ndarray:
        n_classes = self.n_classes
        cm = np.zeros((n_classes, n_classes), np.int64)
        idx = np.arange(len(dataset))
        vit_p, head_p = self.vit_params, self.head_params
        # multi-host: each host evaluates an interleaved slice, CMs sum below
        if jax.process_count() > 1:
            idx = idx[jax.process_index()::jax.process_count()]
            # SP training leaves params as GLOBAL replicated arrays and
            # FSDP training leaves them genuinely SHARDED across hosts;
            # eval is a per-host program over different slices, so
            # materialize a host-local copy — gather_if_sharded reassembles
            # sharded leaves collectively (every rank calls _run_eval at
            # the same points) and passes addressable ones through.
            from dino_tpu.parallel.mesh import gather_if_sharded
            vit_p = gather_if_sharded(vit_p)
            head_p = gather_if_sharded(head_p)
        for xb, yb in batched_loader(dataset, idx, batch_size):
            cm += np.asarray(eval_step(vit_p, head_p,
                                       jnp.asarray(xb), jnp.asarray(yb)))
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            cm = np.asarray(multihost_utils.process_allgather(cm)
                            ).reshape(-1, n_classes, n_classes).sum(0)
        return cm

    def _cache_plan(self, cache_features, n_train: int, n_val: int):
        """(cache_train, cache_val) for the frozen-feature cache.

        'auto' engages whenever it is numerics-safe: ViT backbone (BN-free),
        frozen, single host.  Train features additionally require a
        non-augmented pipeline (augmented pixels change every draw).  An HBM
        budget over the combined residency ($DINO_TPU_FEATURE_CACHE_BYTES,
        default 2GB) guards against huge datasets; over budget the train
        cache drops first, then the val cache (recompute path fallback).
        """
        if cache_features is False:
            return False, False
        eligible = (self.backbone == "vit" and self.freeze_backbone
                    and jax.process_count() == 1)
        if not eligible:
            return False, False
        n_patches = (self.train_resolution // 8) ** 2
        cap = int(os.environ.get("DINO_TPU_FEATURE_CACHE_BYTES",
                                 2_000_000_000))
        itemsize = 2 if self.compute_dtype == jnp.bfloat16 else 4

        def nbytes(n_items):
            return n_items * n_patches * self.mlp_input_dim * itemsize

        # the budget bounds the COMBINED residency of both caches; when over,
        # the train cache (the larger of the two) is dropped first
        want_train = (not self.augmented) and n_train > 0
        want_val = n_val > 0
        total = ((nbytes(n_train) if want_train else 0)
                 + (nbytes(n_val) if want_val else 0))
        if total > cap and want_train:
            want_train = False
            total = nbytes(n_val) if want_val else 0
        if total > cap:
            want_val = False
        return want_train, want_val

    def _precompute_features(self, ds, feature_fn):
        """Run every unique dataset image through the frozen backbone once;
        returns device-resident ((M, N, D) feats, (M, N) labels)."""
        feats, labels = [], []
        for xb, yb in batched_loader(ds, np.arange(len(ds)),
                                     self.batch_size):
            # the backbone forward (the expensive part) DP-shards over the
            # mesh when the batch divides the device count
            feats.append(feature_fn(self.vit_params, self._place_batch(xb)))
            labels.append(np.asarray(yb))
        return (jnp.concatenate(feats, axis=0),
                jnp.asarray(np.concatenate(labels, axis=0).astype(np.int32)))

    def fit(self, ck_file_name: Optional[str] = None,
            samples_per_epoch: int = 1000, seed: int = 0,
            resume: bool = False, cache_features="auto",
            parallelism: Optional[str] = None,
            accum_steps: int = 1, zero: bool = False, fsdp: bool = False,
            early_stopping: bool = False,
            augment_backend: str = "auto",
            pp_schedule: str = "1f1b",
            pp_microbatches: Optional[int] = None,
            pp_chunks: int = 2,
            pp_stages: Optional[int] = None) -> Dict[str, float]:
        """Train; with ``resume=True`` an interrupted run continues from the
        last finished epoch (params + optimizer state + counters restored).

        ``augment_backend`` ('auto'/'native'/'cv2'/'device') picks WHERE
        augmentation pixels are computed — the random parameters are drawn
        identically on every backend.  'device' moves crop/warp/flip/
        jitter/blur into a jitted program (ops/device_augment.py), leaving
        the host only decode+resize: the mode for hosts with few cores,
        where the ~16 ms/core-sample augment chain, not the ~2 ms device
        step, caps unfrozen-finetune throughput (PERF.md "Host pipeline").
        Multi-host and SP feeds work but re-stage the augmented frames
        through the host (host_local_array_to_global_array copies them
        back), so the host backends are the better fit there.

        ``early_stopping=True`` activates the reference's commented-out
        EarlyStopping callback (pl_torch_modules.py:385-388 — monitor
        val_acc, mode max, patience = ``self.patience`` epochs without
        strict improvement).  Opt-in so the default matches the reference's
        shipped behavior (train to max_epochs); the no-improvement counter
        rides the resume state, so an interrupted run stops at the same
        epoch it would have uninterrupted.

        ``cache_features`` ('auto'/True/False): with a frozen ViT backbone,
        per-image backbone features are epoch-constant, so they are computed
        once and epochs train only the head on the device-resident cache —
        no per-epoch decode or backbone recompute.  'auto' engages it
        whenever numerically safe (frozen ViT; train cache additionally
        needs augmented=False since augmented pixels change every draw).
        Results match the recompute path (tests/test_feature_cache.py).

        ``parallelism='sp'`` trains THROUGH ring attention: the token axis
        shards over every visible chip and the custom-VJP backward rings
        dK/dV home (parallel/ring_attention.py) — the multi-chip mode for
        unfrozen finetuning at very high train_resolution (e.g. 960px),
        where one sample's activations outgrow a single chip.  Requires
        the ViT backbone and freeze_backbone=False; heads: mlp/linear and
        (round 5) dense-dispatch MoE — the Switch balance statistics psum
        over the token ring as 2E+1 floats, so gradients stay exact
        (tests/test_moe.py).  Gradients match the replicated step to fp32
        tolerance, so training curves are the same.  Default (None) keeps
        the automatic DP batch sharding.

        ``parallelism='pp'`` trains THROUGH a pipeline: the backbone
        blocks partition over every visible chip and microbatches flow
        stage-to-stage under a production 1F1B schedule
        (``pp_schedule='1f1b'`` contiguous stages, or
        ``'interleaved_1f1b'`` with ``pp_chunks=V`` virtual chunks per
        device — Megatron's placement; parallel/pipeline.py) — the
        multi-chip mode for DEEP backbones, where one chip should hold
        only 1/S of the blocks' weights and Adam moments.
        ``pp_microbatches`` sets M (default: batch_size, i.e. one sample
        per microbatch); the scan-rolled tick table keeps compile time
        O(1) in M.  Requires the ViT backbone, freeze_backbone=False, an
        mlp/linear head, depth divisible by the stage count (x V), and
        batch divisible by M.  Ragged epoch tails pad-and-mask exactly
        like the plain path (the 1F1B steps carry make_train_step's
        mask + train-CM contract), so any samples_per_epoch works and
        per-epoch train metrics (train_acc/F1/iou from the last stage's
        psum'd CM) report as in every other mode.  Gradients match the
        replicated step to reduction order (tests/test_pipeline.py), so
        training curves are the same.  ``pp_stages`` caps the stage mesh
        to the first N devices (default: all).  Multi-host works: the
        stage ring spans every process's devices, every host loads the
        full batch with the shared shuffle rng (augmented pixel streams are
        bit-identical on every backend, so hosts may mix backends), and
        the epoch-end unstack / best-ckpt / resume writes gather
        collectively so host 0 can write — 2-process-cluster-tested with
        resume (tests/test_multihost.py).

        ``accum_steps=K`` splits each batch into K microbatches inside the
        jitted step (one optimizer update on the exactly-accumulated
        gradient — sum/weight bookkeeping makes the masked-mean semantics
        identical; see make_train_step).  Activation memory scales with
        batch_size/K, so big-batch or high-resolution unfrozen finetunes
        fit one chip; microbatch-4 also tiles the D=384 matmuls better
        (PERF.md).  ViT backbone; mlp/linear heads and (round 5) the
        dense-dispatch MoE head — a forward-only stats pass pins the
        full-batch routing fractions so the Switch balance term
        accumulates exactly (tests/test_moe.py); sparse dispatch still
        raises (its capacity slots would allocate per microbatch).
        Ignored on the frozen-feature-cache path (head-only training is
        memory-trivial).

        ``zero=True``: ZeRO-1 optimizer-state sharding — when DP batch
        sharding engages, the Adam moments are stored sharded over the
        data axis (1/N per device; GSPMD reduce-scatters the gradient
        into the update and all-gathers the parameter delta).  Under
        ``parallelism='sp'`` the moments shard over the token axis
        instead (same 1/N memory; make_sp_train_step).  Numerics
        unchanged; a no-op on one device.

        ``fsdp=True``: FSDP / ZeRO-3 — params, gradients, AND moments all
        stored 1/N per device (parallel/mesh.py:fsdp_spec; weights
        all-gather transiently at use, gradients reduce-scatter into the
        sharded update).  Numerics unchanged (tests/test_fsdp.py).
        Multi-host works: the state shards span every process's devices
        and stay sharded across steps; only at save time (best-ckpt /
        resume) and at the per-epoch eval do all ranks join a collective
        gather so host 0 can write and each host can run its local eval
        slice (parallel/mesh.py:gather_if_sharded — the same pattern the
        pretrain CLI's --fsdp uses).  2-process-cluster-tested against
        the single-process run, resume included
        (tests/test_multihost.py).  Skipped with a
        warning under ``freeze_backbone`` (only the tiny head is
        trainable; the frozen ViT stays replicated either way); warns
        when the batch does not divide the device count (state shards,
        compute doesn't).  Mutually exclusive with ``zero`` (it subsumes
        it) and with ``parallelism='sp'`` (whose own ``zero`` shards over
        the token axis).
        """
        if parallelism not in (None, "sp", "pp"):
            raise ValueError(f"unsupported train parallelism {parallelism!r}")
        if parallelism == "pp":
            if pp_schedule not in ("1f1b", "interleaved_1f1b"):
                raise ValueError(f"pp_schedule must be '1f1b' or "
                                 f"'interleaved_1f1b', got {pp_schedule!r}")
            if self.backbone != "vit":
                raise ValueError("parallelism='pp' requires the ViT backbone")
            if self.freeze_backbone:
                raise ValueError("parallelism='pp' pipelines the UNFROZEN "
                                 "backbone; frozen training has no backbone "
                                 "weights to shard (use the feature cache)")
            if self.head not in ("mlp", "linear"):
                raise ValueError("parallelism='pp' supports the mlp/linear "
                                 "heads")
            if zero or fsdp:
                raise ValueError("parallelism='pp' already shards the block "
                                 "weights AND their Adam moments per stage; "
                                 "drop zero/fsdp")
            if accum_steps > 1:
                raise ValueError("parallelism='pp' accumulates via "
                                 "pp_microbatches (the schedule's native "
                                 "form); drop accum_steps")
            if pp_stages is not None and pp_stages > jax.device_count():
                raise ValueError(
                    f"pp_stages ({pp_stages}) exceeds the device count "
                    f"({jax.device_count()})")
            m = pp_microbatches or self.batch_size
            if self.batch_size % m:
                raise ValueError(f"batch_size {self.batch_size} must divide "
                                 f"by pp_microbatches {m}")
        if fsdp:
            if zero:
                raise ValueError("fsdp=True already shards the optimizer "
                                 "state; drop zero=True")
            if parallelism == "sp":
                raise ValueError("fsdp composes with the default DP path; "
                                 "under parallelism='sp' use zero=True "
                                 "(token-axis state sharding) instead")
        if accum_steps > 1:
            if parallelism == "sp":
                raise ValueError("accum_steps composes with the default DP "
                                 "path, not parallelism='sp' (the SP step "
                                 "shards tokens, not the batch)")
            if self.batch_size % accum_steps:
                raise ValueError(f"batch_size {self.batch_size} must divide "
                                 f"by accum_steps {accum_steps}")
            if (jax.device_count() > 1
                    and self.batch_size % jax.device_count() == 0
                    and (self.batch_size // accum_steps)
                    % jax.device_count()):
                raise ValueError(
                    f"with data sharding each microbatch "
                    f"({self.batch_size}//{accum_steps}) must divide by the "
                    f"device count ({jax.device_count()})")
        if parallelism == "sp":
            if self.backbone != "vit":
                raise ValueError("parallelism='sp' requires the ViT backbone")
            if self.freeze_backbone:
                raise ValueError("parallelism='sp' is the unfrozen-finetune "
                                 "mode; frozen training needs no sequence "
                                 "sharding (use the feature cache instead)")
        if ck_file_name is None:
            ck_file_name = (str(self.n_blocks) + "_" + self.head
                            + ("_frozen" if self.freeze_backbone
                               else "_finetuned")
                            + ("_grayscale" if self.grayscale else ""))
        os.makedirs(self.write_path, exist_ok=True)
        ck_path = os.path.join(self.write_path, ck_file_name + ".ckpt.npz")

        pp_kwargs = dict(pp_schedule=pp_schedule,
                         pp_microbatches=pp_microbatches,
                         pp_chunks=pp_chunks, pp_stages=pp_stages)
        if self.pretrain_on_sim:
            print("Pretraining on simulation data...")
            self._fit_phase(self.train_path_sim, self.val_path, ck_path,
                            samples_per_epoch, seed, log=False,
                            cache_features=cache_features,
                            parallelism=parallelism,
                            accum_steps=accum_steps, zero=zero, fsdp=fsdp,
                            augment_backend=augment_backend, **pp_kwargs)

        self._fit_phase(self.train_path, self.val_path, ck_path,
                        samples_per_epoch, seed, log=True, resume=resume,
                        cache_features=cache_features,
                        parallelism=parallelism,
                        accum_steps=accum_steps, zero=zero, fsdp=fsdp,
                        early_stopping=early_stopping,
                        augment_backend=augment_backend, **pp_kwargs)

        # Reload the best checkpoint and test (reference trainer.test :425)
        best = DINOSeg.load_from_checkpoint(ck_path)
        self.vit_params = best.vit_params
        self.head_params = best.head_params
        eval_step = make_eval_step(self.cfg, self.head, self.n_classes,
                                   compute_dtype=self.compute_dtype,
                                   backbone=self.backbone,
                                   **self._head_kwargs)
        test_cm = self._run_eval(eval_step,
                                 DuckieSegDataset(
                                     self.test_path, augmented=False,
                                     resolution=self.train_resolution),
                                 self.batch_size)
        metrics = segmentation_metrics(test_cm, prefix="test")
        self._log(metrics, step=-1)
        self.best_ck = ck_path
        if (jax.process_index() == 0 and self.logger is not None
                and hasattr(self.logger, "log_asset")):
            self.logger.log_asset(ck_path)
        return metrics

    def _fit_phase(self, train_path: str, val_path: str, ck_path: str,
                   samples_per_epoch: int, seed: int, log: bool,
                   resume: bool = False, cache_features="auto",
                   parallelism: Optional[str] = None,
                   accum_steps: int = 1, zero: bool = False,
                   fsdp: bool = False,
                   early_stopping: bool = False,
                   augment_backend: str = "auto",
                   pp_schedule: str = "1f1b",
                   pp_microbatches: Optional[int] = None,
                   pp_chunks: int = 2,
                   pp_stages: Optional[int] = None) -> None:
        train_ds = DuckieSegDataset(train_path, augmented=self.augmented,
                                    resolution=self.train_resolution,
                                    backend=augment_backend)
        val_ds = DuckieSegDataset(val_path, augmented=False,
                                  resolution=self.train_resolution)
        if len(train_ds) == 0:
            raise FileNotFoundError(f"no training images under {train_path}")

        optimizer = make_optimizer(self.optimizer, self.lr)
        cache_train, cache_val = self._cache_plan(cache_features,
                                                  len(train_ds), len(val_ds))
        train_feats = val_feats = None
        if cache_train or cache_val:
            from dino_tpu.train.loop import (make_cached_head_eval_step,
                                             make_cached_head_train_step,
                                             make_feature_fn)
            feature_fn = make_feature_fn(self.cfg,
                                         compute_dtype=self.compute_dtype)
            if cache_val:
                val_feats, val_labels_c = self._precompute_features(
                    val_ds, feature_fn)
                cached_eval_step = make_cached_head_eval_step(
                    self.head, self.n_classes, **self._head_kwargs)
            if cache_train:
                train_feats, train_labels_c = self._precompute_features(
                    train_ds, feature_fn)
                cached_train_step = make_cached_head_train_step(
                    self.head, self.n_classes, optimizer,
                    **self._head_kwargs)
            mb = sum(int(np.prod(f.shape)) * f.dtype.itemsize for f in
                     (train_feats, val_feats) if f is not None) / 1e6
            print(f"feature cache: train={cache_train} val={cache_val} "
                  f"({mb:.0f} MB device-resident; frozen backbone runs once "
                  f"per unique image)")
        sp_mesh = None
        zero_mesh = None
        fsdp_mesh = None
        pp_state = None
        sp_zero = (parallelism == "sp" and bool(zero)
                   and jax.device_count() > 1)
        if parallelism == "pp":
            # pipeline parallelism: blocks partition over a stage mesh of
            # every visible device; block weights AND their Adam moments
            # live 1/S per device throughout the fit.  The epoch loop
            # below steps the STACKED layout and re-materializes the
            # standard vit_params at each epoch end for eval/save/resume.
            from jax.sharding import Mesh as _Mesh
            from dino_tpu.parallel.pipeline import (
                init_pp_interleaved_train_state, init_pp_train_state,
                make_pp_1f1b_train_step,
                make_pp_interleaved_1f1b_train_step)
            n_stages = pp_stages or jax.device_count()
            pp_mesh = _Mesh(np.array(jax.devices()[:n_stages]), ("stage",))
            n_mb = pp_microbatches or self.batch_size
            pp_state = {"schedule": pp_schedule, "n_stages": n_stages,
                        "chunks": pp_chunks, "mesh": pp_mesh}
            _pp_restack(pp_state, self.vit_params)
            if jax.process_count() > 1:
                # multi-host PP: ONE stage ring spans every process's
                # devices.  The stacked slabs are already global (the
                # device_put in _pp_restack shards them over the global
                # mesh); the replicated leaves (rest/head) promote to
                # global arrays here so the opt-state init below inherits
                # global shardings (stage moments stay 1/S per device);
                # each full batch promotes through pp_state["rep"] (every
                # host loads the same rows with the same shuffle rng).
                from jax.experimental import multihost_utils as _mhu
                from jax.sharding import PartitionSpec as _PS

                def _pp_rep(x, _mesh=pp_mesh):
                    return _mhu.host_local_array_to_global_array(
                        np.asarray(x), _mesh, _PS())

                pp_state["rep"] = _pp_rep
                pp_state["rest"] = jax.tree.map(_pp_rep, pp_state["rest"])
                self.head_params = jax.tree.map(_pp_rep, self.head_params)
                # no augmentation-backend fence needed: every op is
                # bit-identical across backends (see the SP note below)
            if pp_schedule == "interleaved_1f1b":
                train_step = make_pp_interleaved_1f1b_train_step(
                    self.cfg, self.head, self.n_classes, optimizer,
                    pp_mesh, n_chunks=pp_chunks, n_microbatches=n_mb,
                    scan=True, compute_dtype=self.compute_dtype,
                    donate=True)
                opt_state = init_pp_interleaved_train_state(
                    optimizer, pp_state["stacked"], pp_state["rest"],
                    self.head_params)
            else:
                train_step = make_pp_1f1b_train_step(
                    self.cfg, self.head, self.n_classes, optimizer,
                    pp_mesh, n_microbatches=n_mb, scan=True,
                    compute_dtype=self.compute_dtype, donate=True)
                opt_state = init_pp_train_state(optimizer,
                                                pp_state["stacked"],
                                                pp_state["rest"],
                                                self.head_params)
            if jax.process_count() > 1:
                # any host-local init leaf (e.g. the optax step count)
                # promotes to a replicated global array, and the global
                # shardings are captured for re-placing a resume restore
                rep = pp_state["rep"]
                opt_state = jax.tree.map(
                    lambda a: a if (isinstance(a, jax.Array)
                                    and not a.is_fully_addressable)
                    else rep(a), opt_state)
                pp_state["opt_shardings"] = jax.tree.map(
                    lambda a: a.sharding, opt_state)
        elif parallelism == "sp":
            # token-axis sequence parallelism: the SP step shares
            # make_train_step's contract (mask + CM), so the epoch loop
            # below is unchanged; the batch stays replicated (the token
            # axis is what shards), so DP batch sharding is disabled
            from dino_tpu.parallel.mesh import make_mesh
            from dino_tpu.parallel.ring_attention import make_sp_train_step
            sp_mesh = make_mesh(model_axis=1)
            # zero composes with SP: moments shard over the token axis
            # (make_sp_train_step docstring); a no-op on one device
            train_step = make_sp_train_step(
                self.cfg, self.head, self.n_classes, optimizer, sp_mesh,
                compute_dtype=self.compute_dtype, donate=True,
                zero=sp_zero, **self._head_kwargs)
        else:
            if (zero and jax.device_count() > 1
                    and self.batch_size % jax.device_count() == 0):
                from dino_tpu.parallel.mesh import data_sharding
                zero_mesh = data_sharding().mesh
            if fsdp and jax.device_count() > 1:
                if self.freeze_backbone:
                    # frozen backbone: the trainable state is the tiny
                    # head (the big frozen ViT params stay replicated
                    # either way) — sharding it buys nothing, cached or
                    # not; unfreeze to shard real state
                    import warnings
                    warnings.warn("fsdp=True skipped: freeze_backbone "
                                  "leaves only the head trainable "
                                  "(memory-trivial); FSDP shards the "
                                  "UNFROZEN train state")
                else:
                    from dino_tpu.parallel.mesh import data_sharding
                    fsdp_mesh = data_sharding().mesh
                    if self.batch_size % jax.device_count():
                        import warnings
                        warnings.warn(
                            f"fsdp=True with batch_size {self.batch_size} "
                            f"not divisible by {jax.device_count()} "
                            "devices: DP batch sharding cannot engage, so "
                            "every device computes the full batch "
                            "redundantly (state memory still shards 1/N)")
            train_step = make_train_step(self.cfg, self.head, self.n_classes,
                                         optimizer, self.freeze_backbone,
                                         compute_dtype=self.compute_dtype,
                                         backbone=self.backbone,
                                         # the cached-head step does the
                                         # actual training there, and
                                         # accum_steps is documented
                                         # ignored on that path (a frozen
                                         # sparse-MoE + accum_steps run
                                         # must not trip make_train_step's
                                         # sparse-capacity guard)
                                         accum_steps=(1 if cache_train
                                                      else accum_steps),
                                         zero_mesh=zero_mesh,
                                         fsdp_mesh=fsdp_mesh,
                                         **self._head_kwargs)
        eval_step = make_eval_step(self.cfg, self.head, self.n_classes,
                                   compute_dtype=self.compute_dtype,
                                   backbone=self.backbone,
                                   **self._head_kwargs)
        if pp_state is None:  # pp initialized its stage-sharded state above
            opt_state = init_opt_state(optimizer, self.vit_params,
                                       self.head_params,
                                       self.freeze_backbone)

        # Data parallelism: shard the batch over all devices when it divides
        # evenly (single-chip degenerates to no-op).  Multi-host: the mesh
        # spans every process's devices; each host loads only its slab of
        # each global batch (put_global below), so IO and compute both
        # divide by the host count.
        batch_sharding = None
        if (parallelism not in ("sp", "pp") and jax.device_count() > 1
                and self.batch_size % jax.device_count() == 0):
            from dino_tpu.parallel.mesh import data_sharding
            batch_sharding = data_sharding()
        n_proc = jax.process_count()
        multi_host = batch_sharding is not None and n_proc > 1
        if n_proc > 1 and batch_sharding is None and parallelism not in (
                "sp", "pp"):
            # (SP and PP deliberately leave batch_sharding None: one global
            # ring spans every host's devices, so the token/stage work DOES
            # shard even though the batch replicates)
            import warnings
            warnings.warn(
                f"batch_size {self.batch_size} does not divide the "
                f"{jax.device_count()}-device mesh: multi-host data sharding "
                "cannot engage, every process will train on the full data "
                "redundantly (correct but unscaled)")

        def put(x):
            x = jnp.asarray(x)
            return (jax.device_put(x, batch_sharding)
                    if batch_sharding is not None else x)

        def put_global(local_rows):
            """Host-local slab (rows for this process's devices) -> global
            batch array sharded over the whole mesh."""
            from dino_tpu.parallel.mesh import host_slab_to_global
            return host_slab_to_global(local_rows, batch_sharding)

        # Resume support (upgraded reference restart_from_checkpoint).
        # Saves go through the async writer: the npz serialization overlaps
        # the next epoch's steps instead of stalling the loop (the
        # device->host snapshot in save_train_state stays synchronous —
        # donated buffers, checkpointing/async_writer.py).
        from dino_tpu.checkpointing.async_writer import AsyncCheckpointer
        from dino_tpu.checkpointing.resume import restart_from_checkpoint
        ck_writer = AsyncCheckpointer(name="fit-ckpt")
        resume_path = ck_path + ".resume.npz"
        start_epoch, best_acc, since_improve = 0, -1.0, 0
        have_resume = os.path.exists(resume_path)
        if resume and n_proc > 1:
            # host 0 alone writes resume files; verify every rank sees the
            # same state before acting on it (shared-FS contract)
            from dino_tpu.parallel.dist import agree_across_hosts
            agree_across_hosts("resume-state visibility", int(have_resume))
        if resume and have_resume:
            # since_improve absent in pre-early-stopping resume files ->
            # stays 0 (restart_from_checkpoint only fills present keys)
            run_vars = {"epoch": 0, "best_acc": -1.0, "since_improve": 0}
            restored = restart_from_checkpoint(
                resume_path, run_vars, vit=self.vit_params,
                head=self.head_params, opt_state=opt_state)
            self.vit_params = jax.tree.map(jnp.asarray, restored["vit"])
            self.head_params = jax.tree.map(jnp.asarray, restored["head"])
            opt_state = jax.tree.unflatten(
                jax.tree.structure(opt_state),
                [jnp.asarray(x) for x in jax.tree.leaves(restored["opt_state"])])
            start_epoch = int(run_vars["epoch"]) + 1
            best_acc = float(run_vars["best_acc"])
            since_improve = int(run_vars["since_improve"])
            if pp_state is not None:
                # rebuild the stage-sharded stacked layout from the
                # restored standard params (the moments were saved in the
                # PP layout and restored structurally above)
                _pp_restack(pp_state, self.vit_params)
                if n_proc > 1:
                    # restored leaves are host-local npz copies: re-place
                    # them on the global shardings captured at init (rest/
                    # head replicate over the global mesh; stage moments
                    # go back 1/S per device via device_put, which ships
                    # only each host's addressable shards)
                    rep = pp_state["rep"]
                    pp_state["rest"] = jax.tree.map(rep, pp_state["rest"])
                    self.head_params = jax.tree.map(rep, self.head_params)
                    opt_state = jax.tree.map(
                        lambda s, x: jax.device_put(np.asarray(x), s),
                        pp_state["opt_shardings"], opt_state)
            if n_proc > 1:  # torn read / stale NFS cache => fail fast
                from dino_tpu.parallel.dist import agree_across_hosts
                agree_across_hosts("resume epoch/best_acc",
                                   [start_epoch, best_acc])

        if parallelism == "sp" and n_proc > 1:
            # multi-host SP: ONE ring spans every process's devices, so
            # every input of the jitted step must be a GLOBAL array.  The
            # non-DP loader branch below loads the FULL batch on every host
            # with the same shuffle rng, so batches promote to replicated
            # global arrays; params/opt_state promote once here and stay
            # global through the step outputs.  Eval localizes them back
            # per host (_run_eval); host-0 saves read replicated values.
            from jax.experimental import multihost_utils
            from jax.sharding import PartitionSpec as _P

            # augmented multi-host SP needs no backend fence (round 5):
            # every host loads the FULL batch with the same rng, and every
            # augmentation op is bit-identical across the native-C++/cv2
            # backends (geometry + jitter rounds 3-4; warp + blur round 5
            # — data/augment.py contract), so per-host pixel streams match
            # regardless of which backend each host built.

            def sp_rep(x):
                return multihost_utils.host_local_array_to_global_array(
                    np.asarray(x), sp_mesh, _P())
            self.vit_params = jax.tree.map(sp_rep, self.vit_params)
            self.head_params = jax.tree.map(sp_rep, self.head_params)
            opt_state = jax.tree.map(sp_rep, opt_state)
            put = sp_rep

        for epoch in range(start_epoch, self.max_epochs):
            # a resumed run that had already exhausted patience must not
            # train (and possibly re-save a best ckpt for) one extra epoch
            if early_stopping and since_improve >= max(self.patience, 1):
                if jax.process_index() == 0:
                    print(f"[early stopping] resumed with since_improve="
                          f"{since_improve} >= patience {self.patience}; "
                          f"not training further")
                break
            t0 = time.time()
            # per-epoch derived rng => deterministic mid-run resume
            rng = np.random.default_rng([seed, epoch])
            idx = epoch_indices(rng, len(train_ds), samples_per_epoch)
            # losses/CMs stay device-side until the epoch ends: forcing a
            # host fetch per step would serialize dispatch and stop the
            # host data pipeline from overlapping device compute
            cms = []
            losses = []
            if train_feats is not None:
                # cached path: the epoch is pure head math over the resident
                # features — no decode, no backbone recompute, no transfers
                for start in range(0, len(idx), self.batch_size):
                    (ids,), mask = _pad_tail(
                        [idx[start:start + self.batch_size].astype(np.int32)],
                        self.batch_size)
                    (self.head_params, opt_state, loss, cm
                     ) = cached_train_step(self.head_params, opt_state,
                                           train_feats, train_labels_c,
                                           jnp.asarray(ids),
                                           jnp.asarray(mask))
                    losses.append(loss)
                    cms.append(cm)
            elif pp_state is not None:
                # pipelined epoch: the batch is replicated into the SPMD
                # program and microbatches flow stage-to-stage; block
                # weights + moments stay stage-sharded across steps.
                # Ragged tails pad-and-mask exactly like the plain path
                # (the 1F1B steps carry make_train_step's mask/CM
                # contract), so any samples_per_epoch works.
                pp_put = pp_state.get("rep", jnp.asarray)
                for xb, yb in batched_loader(train_ds, idx, self.batch_size,
                                             rng=rng):
                    (xb, yb), mask = _pad_tail([xb, yb], self.batch_size)
                    (pp_state["stacked"], pp_state["rest"],
                     self.head_params, opt_state, loss, cm) = train_step(
                        pp_state["stacked"], pp_state["rest"],
                        self.head_params, opt_state, pp_put(xb),
                        pp_put(yb), pp_put(mask))
                    losses.append(loss)
                    cms.append(cm)
                # standard layout for eval/save/resume: pull the stage
                # slabs host-side and unstack into the block list
                self.vit_params = _pp_unstack(pp_state)
            elif multi_host:
                # every process iterates the SAME global batch windows
                # (identical shuffle rng) but loads/feeds only its own slab;
                # the jitted step runs SPMD over the global mesh, so
                # gradients aggregate across hosts inside the program
                b = self.batch_size
                b_loc = b // n_proc
                p_i = jax.process_index()
                slabs, masks = [], []
                for start in range(0, len(idx), b):
                    (window,), mask = _pad_tail([idx[start:start + b]], b)
                    slabs.append(window[p_i * b_loc:(p_i + 1) * b_loc])
                    masks.append(mask[p_i * b_loc:(p_i + 1) * b_loc])
                # one loader for the whole epoch keeps the threaded
                # prefetch overlapping device steps; the rng is decorrelated
                # per host so slab rows don't share augmentation draws
                host_rng = np.random.default_rng(
                    [seed, epoch, 1 + p_i]) if train_ds.augmented else rng
                loader = (batched_loader(train_ds, np.concatenate(slabs),
                                         b_loc, rng=host_rng)
                          if slabs else iter(()))
                for (xb, yb), m_loc in zip(loader, masks):
                    (self.vit_params, self.head_params, opt_state, loss, cm
                     ) = train_step(self.vit_params, self.head_params,
                                    opt_state, put_global(xb),
                                    put_global(yb), put_global(m_loc))
                    losses.append(loss)
                    cms.append(cm)
            else:
                for xb, yb in batched_loader(train_ds, idx, self.batch_size,
                                             rng=rng):
                    (xb, yb), mask = _pad_tail([xb, yb], self.batch_size)
                    (self.vit_params, self.head_params, opt_state, loss, cm
                     ) = train_step(self.vit_params, self.head_params,
                                    opt_state, put(xb), put(yb), put(mask))
                    losses.append(loss)
                    cms.append(cm)

            train_cm = (np.sum([np.asarray(c) for c in cms], axis=0)
                        if cms else
                        np.zeros((self.n_classes, self.n_classes), np.int64))

            if val_feats is not None:
                val_cm = np.asarray(cached_eval_step(self.head_params,
                                                     val_feats, val_labels_c))
            else:
                val_cm = self._run_eval(eval_step, val_ds, self.batch_size)
            metrics = segmentation_metrics(val_cm, prefix="val")
            metrics.update(segmentation_metrics(train_cm, prefix="train"))
            metrics["train_loss"] = float(np.mean([float(l) for l in losses]))
            metrics["epoch_time_s"] = time.time() - t0
            # HBM headroom telemetry (None on backends without memory_stats)
            from dino_tpu.utils.profiling import hbm_stats
            hbm = hbm_stats()
            if hbm is not None:
                metrics["hbm_peak_gb"] = round(
                    hbm["peak_bytes_in_use"] / 2**30, 3)
                metrics["hbm_util"] = round(hbm["utilization"], 4)
            if log:
                self._log(metrics, step=epoch)
                # per-epoch confusion matrix (reference logs these to Comet,
                # pl_torch_modules.py:326-330; train CM skipped, same as ref)
                if (jax.process_index() == 0 and self.logger is not None
                        and hasattr(self.logger, "log_confusion_matrix")):
                    self.logger.log_confusion_matrix(
                        val_cm, title="val", step=epoch,
                        labels=self.class_names,
                        file_name=f"val_epoch_{epoch}.json")
            # multi-host: params/metrics are identical on every process, so
            # only host 0 writes (a shared filesystem would race otherwise);
            # the barrier keeps other hosts from reading a half-written file
            resume_state = {"vit": self.vit_params,
                            "head": self.head_params,
                            "opt_state": opt_state}
            # EarlyStopping bookkeeping (reference pl_torch_modules.py:
            # 385-388 semantics: strict improvement resets the counter);
            # derived from the psum'd CM, so identical on every host
            improved = metrics["val_acc"] > best_acc
            since_improve = 0 if improved else since_improve + 1
            if resume and n_proc > 1 and (zero_mesh is not None or sp_zero
                                          or fsdp_mesh is not None
                                          or pp_state is not None):
                # ZeRO/FSDP state spans non-addressable devices, so host 0
                # alone cannot np.asarray it — every process joins a
                # collective gather and host 0 writes the global arrays.
                # Covers the DP-ZeRO mesh, SP+ZeRO (moments shard over the
                # token axis but multi_host/zero_mesh stay unset because
                # the batch is replicated), and FSDP (params AND moments
                # sharded); gather_if_sharded reassembles whatever axis is
                # sharded, per leaf.
                from dino_tpu.parallel.mesh import gather_if_sharded
                resume_state = gather_if_sharded(resume_state)
            save_params = None
            if fsdp_mesh is not None and n_proc > 1 and improved:
                # the best-ckpt write also needs host-replicated params;
                # `improved` derives from the psum'd CM so every rank
                # takes this collective branch together
                if resume:  # params already gathered with the resume state
                    save_params = {"vit": resume_state["vit"],
                                   "head": resume_state["head"]}
                else:
                    from dino_tpu.parallel.mesh import gather_if_sharded
                    save_params = gather_if_sharded(
                        {"vit": self.vit_params, "head": self.head_params})
            if jax.process_index() == 0:
                if improved:
                    self.save(ck_path,
                              extra_hparams={"best_val_acc":
                                             metrics["val_acc"],
                                             "epoch": epoch},
                              params=save_params)
                if resume:
                    ck_writer.save_train_state(
                        resume_path,
                        resume_state,
                        run_variables={"epoch": epoch,
                                       "best_acc": max(best_acc,
                                                       metrics["val_acc"]),
                                       "since_improve": since_improve})
            best_acc = max(best_acc, metrics["val_acc"])
            if n_proc > 1:
                # the barrier publishes the resume file to other ranks, so
                # the async write must land first; single-host stays async
                if jax.process_index() == 0:
                    ck_writer.wait()
                from jax.experimental import multihost_utils
                multihost_utils.sync_global_devices(f"dt_epoch_{epoch}")
            # max(patience, 1): since_improve is 0 right after an improving
            # epoch, so patience=0 must not stop an improving run
            if early_stopping and since_improve >= max(self.patience, 1):
                if jax.process_index() == 0:
                    print(f"[early stopping] val_acc has not improved for "
                          f"{since_improve} epochs (patience="
                          f"{self.patience}); stopping at epoch {epoch}")
                break
        ck_writer.close()  # drain + join: resume file on disk, no thread
        #                    left behind across repeated fit() calls
        # the resume point is left in place: re-running with a larger
        # max_epochs continues training; with the same value it's a no-op

    def _log(self, metrics: Dict[str, float], step: int) -> None:
        if jax.process_index() != 0:  # host-0-only logging (docs/SCALING.md)
            return
        msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items()))
        print(f"[epoch {step}] {msg}")
        if self.logger is not None and hasattr(self.logger, "log_metrics"):
            self.logger.log_metrics(metrics, step=step)
