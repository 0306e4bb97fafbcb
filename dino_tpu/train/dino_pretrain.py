"""DINO self-supervised pretraining, TPU-native.

The reference repo carries the DINO pretraining *components* — DINOHead,
MultiCropWrapper, LARS, cosine schedules, per-param clipping, the PIL
GaussianBlur/Solarization augs (vision_transformer.py:314-348,
utils.py:36-68,187-198,553-629) — but not the training loop that uses them
(they are dormant imports from facebookresearch/dino).  This module activates
that layer into a working recipe so backbones can be pretrained on TPU
instead of downloaded:

  student/teacher ViT + DINOHead; the teacher is an EMA of the student
  (momentum cosine-ramped to 1), its outputs sharpened with a low
  temperature and debiased with an EMA center; the student learns to match
  the teacher's distributions across multi-crop views (2 global + N local),
  excluding same-view pairs.

Everything compiles into one jitted step; schedules (lr, weight decay,
teacher temperature, EMA momentum) are traced scalars so one program serves
the whole run.  Multi-crop augmentation runs on the host (cv2 primitives,
same determinism contract as the segmentation pipeline: all randomness from
a numpy Generator).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dino_tpu.models.dino_head import (dino_head_apply, init_dino_head,
                                       multi_crop_forward)
from dino_tpu.models.vit import ViTConfig, init_vit_params, vit_forward

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DinoConfig:
    out_dim: int = 65536
    student_temp: float = 0.1
    center_momentum: float = 0.9
    n_local_crops: int = 8
    global_size: int = 224
    local_size: int = 96
    norm_last_layer: bool = True
    hidden_dim: int = 2048
    bottleneck_dim: int = 256


def init_dino_params(key, vit_cfg: ViTConfig, dino_cfg: DinoConfig,
                     depth: Optional[int] = None) -> Tuple[Params, Params]:
    """(student, teacher) — teacher starts as a copy of the student
    (facebookresearch/dino initializes teacher.load_state_dict(student))."""
    kv, kh = jax.random.split(key)
    student = {
        "vit": init_vit_params(kv, vit_cfg, depth=depth),
        "head": init_dino_head(kh, vit_cfg.embed_dim, dino_cfg.out_dim,
                               norm_last_layer=dino_cfg.norm_last_layer,
                               hidden_dim=dino_cfg.hidden_dim,
                               bottleneck_dim=dino_cfg.bottleneck_dim),
    }
    # a REAL copy, not an aliased tree: the donated train step (donate=True)
    # must not see the same buffer behind both student and teacher
    teacher = jax.tree.map(
        lambda x: jnp.array(x, copy=True) if isinstance(x, jax.Array) else x,
        student)
    return student, teacher


def dino_loss(student_out: jnp.ndarray, teacher_out: jnp.ndarray,
              center: jnp.ndarray, student_temp: float,
              teacher_temp: jnp.ndarray, n_crops: int,
              n_global: int = 2) -> jnp.ndarray:
    """Cross-entropy between centered/sharpened teacher distributions (global
    views) and student log-probs (all views), same-view pairs excluded.

    student_out: (n_crops*B, K); teacher_out: (n_global*B, K).
    """
    b = student_out.shape[0] // n_crops
    s = jax.nn.log_softmax(
        (student_out / student_temp).astype(jnp.float32), axis=-1)
    s = s.reshape(n_crops, b, -1)
    t = jax.nn.softmax(
        ((teacher_out - center) / teacher_temp).astype(jnp.float32), axis=-1)
    t = jax.lax.stop_gradient(t.reshape(n_global, b, -1))

    total, n_terms = 0.0, 0
    for iq in range(n_global):
        for v in range(n_crops):
            if v == iq:
                continue  # skip same-view pairs (main_dino semantics)
            total = total + jnp.mean(jnp.sum(-t[iq] * s[v], axis=-1))
            n_terms += 1
    return total / n_terms


def center_ema(center: jnp.ndarray, batch_center: jnp.ndarray,
               momentum: float) -> jnp.ndarray:
    """EMA of the center toward a precomputed full-batch teacher mean —
    the single definition of the centering semantics (update_center and
    the accumulated train step both route through it)."""
    return center * momentum + batch_center * (1.0 - momentum)


def update_center(center: jnp.ndarray, teacher_out: jnp.ndarray,
                  momentum: float) -> jnp.ndarray:
    """EMA of the teacher's batch mean (the anti-collapse centering);
    multi-host runs would psum the batch mean first."""
    batch_center = jnp.mean(teacher_out.astype(jnp.float32), axis=0,
                            keepdims=True)
    return center_ema(center, batch_center, momentum)


def ema_update(teacher: Params, student: Params, momentum) -> Params:
    """teacher <- m * teacher + (1 - m) * student, leaf-wise."""
    return jax.tree.map(
        lambda t, s: (t * momentum + s.astype(jnp.float32) * (1 - momentum)
                      ).astype(t.dtype) if jnp.issubdtype(
                          jnp.asarray(t).dtype, jnp.floating) else t,
        teacher, student)


def _forward(params: Params, crops, vit_cfg: ViTConfig,
             compute_dtype=None) -> jnp.ndarray:
    def backbone(batch):
        x = batch.astype(compute_dtype) if compute_dtype is not None else batch
        return vit_forward(params["vit"], x, vit_cfg, all_tokens=False)

    return multi_crop_forward(backbone,
                              lambda f: dino_head_apply(params["head"], f),
                              crops)


def init_dino_opt_state(optimizer: optax.GradientTransformation,
                        student: Params):
    """Optimizer state over the differentiable leaves (head _meta stripped)."""
    head = dict(student["head"])
    head.pop("_meta")
    return optimizer.init({"vit": student["vit"], "head": head})


def make_dino_train_step(vit_cfg: ViTConfig, dino_cfg: DinoConfig,
                         optimizer: optax.GradientTransformation,
                         compute_dtype=None, clip: float = 3.0,
                         donate: bool = False,
                         accum_steps: int = 1,
                         fsdp_mesh=None, fsdp_axis: str = "data") -> Callable:
    """Jitted step(student, teacher, center, opt_state, global_crops,
    local_crops, teacher_temp, ema_momentum, freeze_last) ->
    (student, teacher, center, opt_state, loss).

    ``freeze_last`` (0/1) zeroes the last-layer gradient — the reference
    recipe's freeze_last_layer epoch gate.  Per-parameter gradient clipping
    matches utils.clip_gradients.  ``donate=True`` donates the
    student/teacher/center/opt_state buffers (~700 MB at ViT-S scale) so
    XLA updates them in place — HBM headroom for larger batches; leave off
    when the caller reuses input trees across calls (tests do).

    ``accum_steps=K`` runs the forwards/backwards over K microbatches
    inside a ``lax.scan`` and applies ONE optimizer/EMA/center update on
    the f32-accumulated mean gradient — activation memory scales with
    B/K while the update semantics (clip AFTER accumulation, centering on
    the full-batch teacher mean) exactly match the big-batch step, so
    DINO's large-batch recipes (the paper trains at 1024) fit one chip.
    The crop batch axis must divide by K.

    ``fsdp_mesh``: FSDP / ZeRO-3 over ``fsdp_axis`` for the pretrain
    state — the FATTEST train state in the framework (student + teacher
    + Adam moments = 5 ViT-S-sized trees, ~700 MB donated).  Student,
    teacher, gradients, and optimizer state all pin to the shape-driven
    parallel/mesh.py:fsdp_spec layout, so the whole state lives
    1/N-per-device; the per-leaf clip norm reduces over the shards
    exactly (GSPMD all-reduces the partial sums), and the EMA/center
    updates stay sharded elementwise.  Numerics match the replicated
    step (tests/test_dino_pretrain.py).
    """
    n_crops = 2 + dino_cfg.n_local_crops
    # the head's "_meta" (python bool/int flags) is STATIC configuration:
    # it stays outside the jitted step (bool tracers would break
    # dino_head_apply's norm_last_layer branch and grad's dtype rules)
    static_meta = {"norm_last_layer": dino_cfg.norm_last_layer, "nlayers": 3}

    def _split(params):
        head = dict(params["head"])
        meta = head.pop("_meta")
        return {"vit": params["vit"], "head": head}, meta

    def _join(nometa, meta):
        head = dict(nometa["head"], _meta=meta)
        return {"vit": nometa["vit"], "head": head}

    def loss_fn(s_p, t_p, center, g_crops, l_crops, teacher_temp):
        crops = ([g_crops[i] for i in range(2)]
                 + [l_crops[i] for i in range(l_crops.shape[0])])
        s_out = _forward(_join(s_p, static_meta), crops, vit_cfg,
                         compute_dtype)
        t_out = _forward(_join(t_p, static_meta), [g_crops[0], g_crops[1]],
                         vit_cfg, compute_dtype)
        t_out = jax.lax.stop_gradient(t_out)
        loss = dino_loss(s_out, t_out, center, dino_cfg.student_temp,
                         teacher_temp, n_crops)
        return loss, t_out

    @functools.partial(jax.jit,
                       donate_argnums=(0, 1, 2, 3) if donate else ())
    def step_impl(s_p, t_p, center, opt_state, g_crops, l_crops,
                  teacher_temp, ema_momentum, freeze_last):
        # uint8 crops normalize ON-DEVICE inside the fused program: the
        # host->device transfer is 4x smaller than shipping f32 and the
        # (x - mean) / std folds into the patchify matmul's producers for
        # free (float crops pass through for callers that pre-normalize,
        # e.g. the golden-parity tests).  Checked PER TENSOR: fault
        # injection (DINO_TPU_FAULT_NAN_STEP) poisons only g_crops to
        # float32 NaN, and a single shared check would then leak raw
        # uint8 l_crops into the ViT.
        from dino_tpu.ops.preprocess import normalize_imagenet
        if g_crops.dtype == jnp.uint8:
            g_crops = normalize_imagenet(g_crops)
        if l_crops.dtype == jnp.uint8:
            l_crops = normalize_imagenet(l_crops)
        if fsdp_mesh is not None:
            from dino_tpu.parallel.mesh import fsdp_constrain
            s_p = fsdp_constrain(s_p, fsdp_mesh, fsdp_axis)
            t_p = fsdp_constrain(t_p, fsdp_mesh, fsdp_axis)
        if accum_steps == 1:
            (loss, t_out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                s_p, t_p, center, g_crops, l_crops, teacher_temp)
            batch_center = jnp.mean(t_out.astype(jnp.float32), axis=0,
                                    keepdims=True)
        else:
            k, b = accum_steps, g_crops.shape[1]
            mb = b // k
            # (n_views, B, ...) -> (K, n_views, mb, ...): microbatch k is
            # rows [k*mb, (k+1)*mb) of every view (equal sizes, so the mean
            # of per-microbatch means is the exact full-batch mean)
            g_s = g_crops.reshape(2, k, mb, *g_crops.shape[2:]
                                  ).swapaxes(0, 1)
            l_s = l_crops.reshape(l_crops.shape[0], k, mb,
                                  *l_crops.shape[2:]).swapaxes(0, 1)

            def body(carry, xs):
                g_acc, loss_acc, t_acc = carry
                g_k, l_k = xs
                (loss_k, t_out_k), grads_k = jax.value_and_grad(
                    loss_fn, has_aux=True)(s_p, t_p, center, g_k, l_k,
                                           teacher_temp)
                g_acc = jax.tree.map(
                    lambda a, g: a + g.astype(jnp.float32), g_acc, grads_k)
                t_acc = t_acc + jnp.mean(t_out_k.astype(jnp.float32), axis=0)
                return (g_acc, loss_acc + loss_k, t_acc), None

            init = (jax.tree.map(
                        lambda p: jnp.zeros(p.shape, jnp.float32), s_p),
                    jnp.float32(0.0),
                    jnp.zeros((dino_cfg.out_dim,), jnp.float32))
            (g_acc, loss_acc, t_acc), _ = jax.lax.scan(body, init,
                                                       (g_s, l_s))
            grads = jax.tree.map(lambda g: g / k, g_acc)
            loss = loss_acc / k
            batch_center = (t_acc / k)[None, :]
        # per-parameter clip (reference utils.py:132-141 semantics)
        grads = jax.tree.map(
            lambda g: g * jnp.minimum(
                1.0, clip / (jnp.linalg.norm(g.astype(jnp.float32)) + 1e-6)),
            grads)
        # cancel_gradients_last_layer: freeze the prototype directions early
        grads["head"]["last_layer"] = jax.tree.map(
            lambda g: g * (1.0 - freeze_last), grads["head"]["last_layer"])
        if fsdp_mesh is not None:
            from dino_tpu.parallel.mesh import fsdp_constrain
            grads = fsdp_constrain(grads, fsdp_mesh, fsdp_axis)
            opt_state = fsdp_constrain(opt_state, fsdp_mesh, fsdp_axis)
        updates, opt_state = optimizer.update(grads, opt_state, s_p)
        s_p = optax.apply_updates(s_p, updates)
        t_p = ema_update(t_p, s_p, ema_momentum)
        # EMA of the full-batch teacher mean (update_center semantics)
        center = center_ema(center, batch_center, dino_cfg.center_momentum)
        if fsdp_mesh is not None:
            # the whole pretrain state stays sharded step-to-step
            s_p = fsdp_constrain(s_p, fsdp_mesh, fsdp_axis)
            t_p = fsdp_constrain(t_p, fsdp_mesh, fsdp_axis)
            opt_state = fsdp_constrain(opt_state, fsdp_mesh, fsdp_axis)
        return s_p, t_p, center, opt_state, loss

    def step(student, teacher, center, opt_state, g_crops, l_crops,
             teacher_temp, ema_momentum, freeze_last):
        if accum_steps > 1 and g_crops.shape[1] % accum_steps:
            raise ValueError(
                f"batch {g_crops.shape[1]} must divide by "
                f"accum_steps={accum_steps} (microbatches are equal-sized)")
        s_p, s_meta = _split(student)
        t_p, t_meta = _split(teacher)
        s_p, t_p, center, opt_state, loss = step_impl(
            s_p, t_p, center, opt_state, g_crops, l_crops, teacher_temp,
            ema_momentum, freeze_last)
        return (_join(s_p, s_meta), _join(t_p, t_meta), center, opt_state,
                loss)

    return step


# ---------------------------------------------------------------------------
# Host-side multi-crop augmentation (DataAugmentationDINO semantics; the
# PIL GaussianBlur/Solarization components live in data/pil_augs.py).
# Randomness is DRAWN in Python (draw_dino_params) and pixels are APPLIED by
# either the cv2 path (apply_dino_crop, the oracle) or the C++ thread-pool
# pipeline (native/dtloader.cpp) — same split as the supervised
# data/augment.py design, so the parameter stream is backend-independent.
# ---------------------------------------------------------------------------

def _blur_sigma(img: np.ndarray, radius: float) -> np.ndarray:
    """pil_augs.GaussianBlur equivalence: explicit sigma, ksize from it."""
    import cv2
    k = max(3, int(radius * 4) | 1)
    return cv2.GaussianBlur(img, (k, k), sigmaX=radius)


def _rrc_rect(rng: np.random.Generator, h: int, w: int, scale):
    """RandomResizedCrop rectangle (y0, x0, ch, cw) — exactly the draws the
    pixel-path _rrc makes (torchvision sampling: 10 area/aspect attempts,
    whole-image fallback)."""
    area = h * w
    for _ in range(10):
        ta = area * rng.uniform(*scale)
        aspect = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
        cw = int(round(np.sqrt(ta * aspect)))
        ch = int(round(np.sqrt(ta / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            x0 = int(rng.integers(0, w - cw + 1))
            y0 = int(rng.integers(0, h - ch + 1))
            return (y0, x0, ch, cw)
    return (0, 0, h, w)


def draw_dino_params(rng: np.random.Generator, h: int, w: int,
                     cfg: DinoConfig):
    """All randomness of one image's multi-crop, as plain parameters.

    Distributions follow DataAugmentationDINO: global RandomResizedCrop
    scale (0.4, 1), local (0.05, 0.4); flip .5; jitter .8 / grayscale .2;
    blur p=1.0 / 0.1 / 0.5 for global1/global2/locals is simplified to
    (1.0, 0.1) globals and 0.5 locals; solarization .2 on global 2.

    Splitting draw from apply keeps the determinism contract backend-
    independent: the same rng produces the same parameters whether pixels
    are then transformed by the cv2 path (apply_dino_crop) or the C++ one
    (native/dtloader.cpp dino_crop_one).  Returns a list of 2 + n_local
    param dicts (globals first).
    """
    def base(size, scale):
        p = {"size": size, "rect": _rrc_rect(rng, h, w, scale),
             "flip": rng.random() < 0.5, "jitter": None, "gray": False,
             "blur_sigma": None, "solarize": False}
        if rng.random() < 0.8:  # ColorJitter(.4,.4,.2,.1)
            factors = (rng.uniform(0.6, 1.4), rng.uniform(0.6, 1.4),
                       rng.uniform(0.8, 1.2), rng.uniform(-0.1, 0.1))
            p["jitter"] = (rng.permutation(4), factors)
        if rng.random() < 0.2:  # RandomGrayscale
            p["gray"] = True
        return p

    g1 = base(cfg.global_size, (0.4, 1.0))
    g1["blur_sigma"] = rng.uniform(0.1, 2.0)  # p = 1.0
    g2 = base(cfg.global_size, (0.4, 1.0))
    if rng.random() < 0.1:
        g2["blur_sigma"] = rng.uniform(0.1, 2.0)
    if rng.random() < 0.2:  # Solarization
        g2["solarize"] = True
    crops = [g1, g2]
    for _ in range(cfg.n_local_crops):
        lc = base(cfg.local_size, (0.05, 0.4))
        if rng.random() < 0.5:
            lc["blur_sigma"] = rng.uniform(0.1, 2.0)
        crops.append(lc)
    return crops


def apply_dino_crop(img: np.ndarray, p: dict) -> np.ndarray:
    """cv2/numpy pixel path for one drawn crop (the oracle the C++ path is
    tested against)."""
    import cv2
    y0, x0, ch, cw = p["rect"]
    out = cv2.resize(img[y0:y0 + ch, x0:x0 + cw], (p["size"], p["size"]),
                     interpolation=cv2.INTER_CUBIC)
    if p["flip"]:
        out = out[:, ::-1].copy()
    if p["jitter"] is not None:
        from dino_tpu.data.augment import _apply_jitter
        order, factors = p["jitter"]
        out = _apply_jitter(out, order, factors)
    if p["gray"]:
        g = cv2.cvtColor(out, cv2.COLOR_RGB2GRAY)
        out = np.repeat(g[..., None], 3, axis=-1)
    if p["blur_sigma"] is not None:
        out = _blur_sigma(out, p["blur_sigma"])
    if p["solarize"]:
        out = np.where(out >= 128, 255 - out.astype(np.int16), out).astype(
            np.uint8)
    return out


def pack_dino_params(crops) -> np.ndarray:
    """Param dicts -> the float32 (n_crops, 20) layout dino_crop_one reads."""
    out = np.zeros((len(crops), 20), np.float32)
    for i, p in enumerate(crops):
        out[i, 0:4] = p["rect"]
        out[i, 4] = p["flip"]
        if p["jitter"] is not None:
            order, (fb, fc, fs, fh) = p["jitter"]
            out[i, 5] = 1
            out[i, 6:10] = np.asarray(order, np.float32)
            out[i, 10:14] = (fb, fc, fs, fh)
        out[i, 14] = p["gray"]
        if p["blur_sigma"] is not None:
            r = p["blur_sigma"]
            out[i, 15] = 1
            out[i, 16] = max(3, int(r * 4) | 1)
            out[i, 17] = r
        out[i, 18] = p["solarize"]
        out[i, 19] = p["size"]
    return out


def dino_multi_crop(rng: np.random.Generator, img: np.ndarray,
                    cfg: DinoConfig):
    """One image -> (2 global crops, n_local local crops), uint8 HWC
    (cv2 pixel path; the pretrain CLI batches through
    dino_multi_crop_batch which prefers the C++ pipeline)."""
    crops = [apply_dino_crop(img, p)
             for p in draw_dino_params(rng, *img.shape[:2], cfg)]
    return crops[:2], crops[2:]


def dino_multi_crop_batch(paths, rngs, cfg: DinoConfig):
    """Batch of images -> (g_crops (2, n, G, G, 3), l_crops (L, n, l, l, 3)).

    Pixels run through the C++ thread-pool pipeline (decode each JPEG once,
    all crops off the GIL — native/dtloader.cpp dt_dino_crops_batch) when
    the toolchain built it, else the cv2 path; parameters are drawn in
    Python either way, so the crop GEOMETRY/photometric draws are
    backend-independent (pixels differ within the documented cv2-variant
    envelope: cubic resize +-1, jitter/blur tolerance — PERF.md)."""
    from PIL import Image
    sizes = []
    for f in paths:
        with Image.open(f) as im:  # header-only: no full decode
            sizes.append((im.height, im.width))
    params = [draw_dino_params(rng, h, w, cfg)
              for rng, (h, w) in zip(rngs, sizes)]
    from dino_tpu.data import native_loader
    packed = np.stack([pack_dino_params(c) for c in params])
    native = native_loader.dino_crops_batch(
        [str(p) for p in paths], packed, cfg.n_local_crops,
        cfg.global_size, cfg.local_size)
    if native is not None:
        return native
    gs, ls = [], []
    for f, crops in zip(paths, params):
        img = np.array(Image.open(f).convert("RGB"))
        outs = [apply_dino_crop(img, p) for p in crops]
        gs.append(outs[:2])
        ls.append(outs[2:])
    g = np.stack([np.stack([g[c] for g in gs]) for c in range(2)])
    l = np.stack([np.stack([l[c] for l in ls])
                  for c in range(cfg.n_local_crops)])
    return g, l


def dino_schedules(base_lr: float, epochs: int, niter_per_ep: int,
                   warmup_epochs: int = 10, final_lr: float = 1e-6,
                   momentum_base: float = 0.996,
                   teacher_temp: float = 0.04,
                   warmup_teacher_temp: float = 0.04,
                   warmup_teacher_temp_epochs: int = 0,
                   wd_base: float = 0.04, wd_final: float = 0.4):
    """The four schedules of the DINO recipe as per-iteration arrays
    (cosine_scheduler is the reference utility)."""
    from dino_tpu.utils.schedules import cosine_scheduler
    lr = cosine_scheduler(base_lr, final_lr, epochs, niter_per_ep,
                          warmup_epochs=min(warmup_epochs, epochs))
    wd = cosine_scheduler(wd_base, wd_final, epochs, niter_per_ep)
    momentum = cosine_scheduler(momentum_base, 1.0, epochs, niter_per_ep)
    warm = np.linspace(warmup_teacher_temp, teacher_temp,
                       warmup_teacher_temp_epochs * niter_per_ep)
    rest = np.full(max(0, (epochs - warmup_teacher_temp_epochs)
                       * niter_per_ep), teacher_temp)
    t_temp = np.concatenate([warm, rest])[:epochs * niter_per_ep]
    return lr, wd, momentum, t_temp
