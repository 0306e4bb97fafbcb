#!/usr/bin/env python
"""Self-supervised DINO pretraining CLI (main_dino-style recipe on TPU).

Pretrains a ViT backbone on an unlabeled image folder with the
student/teacher multi-crop recipe, then saves the backbone as a converted
npz that `DINOSeg(pretrained_path=...)` / the acquisition cache consume
directly — the in-framework alternative to downloading
dino_deitsmall8_300ep_pretrain.pth.

Usage:
    dt-pretrain-dino --data_path images/ --write_path out/ --epochs 10 \
        --batch_size 16 --arch vit_small --patch_size 8
"""
from __future__ import annotations

import argparse
import glob
import os
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    ap.add_argument("--data_path", required=True,
                    help="folder of .jpg/.png images (recursively)")
    ap.add_argument("--write_path", default="./dino_pretrain")
    ap.add_argument("--arch", default="vit_small",
                    choices=["vit_tiny", "vit_small", "vit_base"])
    ap.add_argument("--patch_size", type=int, default=8)
    ap.add_argument("--depth", type=int, default=None,
                    help="override block count (e.g. small smoke runs)")
    ap.add_argument("--out_dim", type=int, default=65536)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--warmup_epochs", type=int, default=10)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--accum_steps", type=int, default=1,
                    help="split each batch into this many microbatches "
                         "inside the step (one optimizer update on the "
                         "accumulated mean gradient) — activation memory "
                         "scales with batch_size/accum_steps, so DINO's "
                         "large-batch recipes fit one chip")
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--n_local_crops", type=int, default=8)
    ap.add_argument("--global_size", type=int, default=224)
    ap.add_argument("--local_size", type=int, default=96)
    ap.add_argument("--teacher_temp", type=float, default=0.04)
    ap.add_argument("--warmup_teacher_temp_epochs", type=int, default=0)
    ap.add_argument("--momentum_teacher", type=float, default=0.996)
    ap.add_argument("--freeze_last_layer", type=int, default=1,
                    help="epochs with the last-layer gradient cancelled")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", action="store_true",
                    help="continue an interrupted run from the epoch "
                         "checkpoint in write_path")
    ap.add_argument("--stop_after", type=int, default=None,
                    help="checkpoint and exit after this epoch index "
                         "(chunk a long run across job allocations; "
                         "schedules still span --epochs)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from dino_tpu import models
    from dino_tpu.checkpointing.io import flatten_params
    from dino_tpu.models import vit as vit_mod
    from dino_tpu.ops.preprocess import normalize_imagenet
    from dino_tpu.train.dino_pretrain import (DinoConfig, dino_multi_crop,
                                              dino_schedules,
                                              init_dino_opt_state,
                                              init_dino_params,
                                              make_dino_train_step)

    files = sorted(
        glob.glob(os.path.join(args.data_path, "**", "*.jpg"),
                  recursive=True)
        + glob.glob(os.path.join(args.data_path, "**", "*.png"),
                    recursive=True))
    if not files:
        raise FileNotFoundError(f"no images under {args.data_path}")
    os.makedirs(args.write_path, exist_ok=True)

    vit_cfg = getattr(vit_mod, args.arch)(patch_size=args.patch_size)
    dino_cfg = DinoConfig(out_dim=args.out_dim,
                          n_local_crops=args.n_local_crops,
                          global_size=args.global_size,
                          local_size=args.local_size)
    student, teacher = init_dino_params(jax.random.PRNGKey(args.seed),
                                        vit_cfg, dino_cfg, depth=args.depth)

    # reference recipe (utils.get_params_groups): biases and 1-D params —
    # LayerNorm scales/biases, the head's weight-norm g — are exempt from
    # weight decay; only matrices decay (wd cosine-ramps to 0.4)
    import functools
    from dino_tpu.train.optim import get_params_groups

    def wd_mask(params):
        return get_params_groups(params)[0]

    opt = optax.inject_hyperparams(
        functools.partial(optax.adamw, mask=wd_mask))(
            learning_rate=args.lr, weight_decay=0.04)
    opt_state = init_dino_opt_state(opt, student)
    # donate: params/moments update in place (HBM headroom for the batch);
    # the loop rebinds every donated tree to the step's outputs each call
    if args.accum_steps > 1 and args.batch_size % args.accum_steps:
        raise ValueError(f"batch_size {args.batch_size} must divide by "
                         f"accum_steps {args.accum_steps}")
    if (args.accum_steps > 1 and jax.device_count() > 1
            and args.batch_size % jax.device_count() == 0  # sharding engages
            and (args.batch_size // args.accum_steps) % jax.device_count()):
        raise ValueError(
            f"with data sharding each microbatch "
            f"({args.batch_size}//{args.accum_steps}) must divide by the "
            f"device count ({jax.device_count()})")
    step = make_dino_train_step(vit_cfg, dino_cfg, opt, donate=True,
                                accum_steps=args.accum_steps)
    center = jnp.zeros((1, dino_cfg.out_dim), jnp.float32)

    niter = max(1, len(files) // args.batch_size)
    lr_s, wd_s, mom_s, tt_s = dino_schedules(
        args.lr, args.epochs, niter, warmup_epochs=args.warmup_epochs,
        momentum_base=args.momentum_teacher,
        teacher_temp=args.teacher_temp,
        warmup_teacher_temp_epochs=args.warmup_teacher_temp_epochs)

    from PIL import Image

    # Multi-host (the reference DINO recipe trains multi-GPU DDP;
    # facebookresearch/dino main_dino.py): crops shard on the batch axis
    # over a global mesh, each host loading only its slab; the SPMD step
    # aggregates gradients and the centering batch-mean globally.  Crop
    # randomness is keyed per (seed, epoch, image-index), so the pixel
    # stream is identical for every host topology.
    n_proc = jax.process_count()
    p_i = jax.process_index()
    if n_proc > 1:
        # multi-host REQUIRES the global sharding path: without it each
        # process would silently train its own model on its slab alone
        if args.batch_size % jax.device_count():
            raise ValueError(
                f"multi-host pretraining needs batch_size divisible by the "
                f"global device count ({jax.device_count()}); got "
                f"{args.batch_size}")
    b_loc = args.batch_size // max(1, n_proc)
    dp_sharding = None
    if jax.device_count() > 1 and args.batch_size % jax.device_count() == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from dino_tpu.parallel.mesh import data_sharding
        # crops carry the batch on axis 1: (n_views, B, H, W, 3)
        dp_sharding = NamedSharding(data_sharding().mesh, P(None, "data"))
    if dp_sharding is not None and len(files) < args.batch_size:
        raise ValueError(
            f"sharded pretraining needs at least batch_size "
            f"({args.batch_size}) images for full batch windows; found "
            f"{len(files)} (reduce --batch_size or add data)")

    def place(crops):
        if dp_sharding is None:
            return jnp.asarray(crops)
        if n_proc > 1:
            from dino_tpu.parallel.mesh import host_slab_to_global
            return host_slab_to_global(crops, dp_sharding)
        return jax.device_put(jnp.asarray(crops), dp_sharding)

    def load_crops(rows, epoch):
        gs, ls = [], []
        for i in rows:
            img = np.array(Image.open(files[i]).convert("RGB"))
            g, l = dino_multi_crop(
                np.random.default_rng([args.seed, epoch, int(i)]), img,
                dino_cfg)
            gs.append(g)
            ls.append(l)
        g_crops = np.stack([np.stack([g[c] for g in gs]) for c in range(2)])
        l_crops = np.stack([np.stack([l[c] for l in ls])
                            for c in range(dino_cfg.n_local_crops)])

        def norm(crops):
            flat = crops.reshape((-1,) + crops.shape[2:])
            return np.asarray(normalize_imagenet(jnp.asarray(flat))).reshape(
                crops.shape[:2] + crops.shape[2:])

        return norm(g_crops), norm(l_crops)

    # resume: per-epoch keyed rngs (shuffle + crops) make a restart
    # bit-deterministic — epoch k replays identically whether or not the
    # process died after epoch k-1
    from dino_tpu.checkpointing.resume import (restart_from_checkpoint,
                                               save_train_state)
    resume_path = os.path.join(args.write_path, "pretrain_resume.npz")
    start_epoch = 0
    have_resume = os.path.exists(resume_path)
    if args.resume and n_proc > 1:
        # host 0 alone writes the resume file; verify every rank sees the
        # same state (shared-FS contract, docs/SCALING.md) before acting
        from dino_tpu.parallel.dist import agree_across_hosts
        agree_across_hosts("pretrain resume-state visibility",
                           int(have_resume))
    if args.resume and have_resume:
        run_vars = {"epoch": 0}
        restored = restart_from_checkpoint(
            resume_path, run_vars, student=student, teacher=teacher,
            center=center, opt_state=opt_state)
        meta = student["head"]["_meta"]  # static config, not train state
        student = jax.tree.map(jnp.asarray, restored["student"])
        teacher = jax.tree.map(jnp.asarray, restored["teacher"])
        student["head"]["_meta"] = dict(meta)
        teacher["head"]["_meta"] = dict(meta)
        center = jnp.asarray(restored["center"])
        opt_state = jax.tree.unflatten(
            jax.tree.structure(opt_state),
            [jnp.asarray(x) for x in jax.tree.leaves(restored["opt_state"])])
        start_epoch = int(run_vars["epoch"]) + 1
        if n_proc > 1:  # torn read / stale NFS cache => fail fast
            from dino_tpu.parallel.dist import agree_across_hosts
            agree_across_hosts("pretrain resume epoch", start_epoch)

    it = start_epoch * niter
    for epoch in range(start_epoch, args.epochs):
        order = np.random.default_rng([args.seed, epoch]).permutation(
            len(files))
        t0 = time.time()
        losses = []
        for start in range(0, niter * args.batch_size, args.batch_size):
            idx = order[start:start + args.batch_size]
            rows = idx[p_i * b_loc:(p_i + 1) * b_loc]  # this host's slab
            g_crops, l_crops = load_crops(rows, epoch)
            opt_state.hyperparams["learning_rate"] = jnp.float32(lr_s[it])
            opt_state.hyperparams["weight_decay"] = jnp.float32(wd_s[it])
            student, teacher, center, opt_state, loss = step(
                student, teacher, center, opt_state, place(g_crops),
                place(l_crops), jnp.float32(tt_s[it]),
                jnp.float32(mom_s[it]),
                jnp.float32(1.0 if epoch < args.freeze_last_layer else 0.0))
            losses.append(float(loss))
            it += 1
        if p_i == 0:
            print(f"[epoch {epoch}] dino_loss={np.mean(losses):.4f} "
                  f"lr={lr_s[it-1]:.2e} m={mom_s[it-1]:.4f} "
                  f"({time.time()-t0:.1f}s)")
            save_train_state(resume_path,
                             {"student": student, "teacher": teacher,
                              "center": center, "opt_state": opt_state},
                             run_variables={"epoch": epoch})
        if n_proc > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(f"dt_pretrain_ep{epoch}")
        if args.stop_after is not None and epoch >= args.stop_after:
            if p_i == 0:
                print(f"stopping after epoch {epoch} (--stop_after); resume "
                      "with --resume")
            break

    # save the TEACHER backbone (the better model, per the paper) in the
    # converted-npz layout the rest of the framework loads directly
    out = os.path.join(args.write_path, "dino_pretrained_backbone.npz")
    if p_i == 0:
        np.savez(out, **flatten_params(
            jax.tree.map(np.asarray, teacher["vit"])))
        print(f"saved backbone -> {out}")
    if n_proc > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("dt_pretrain_save")
    return out


if __name__ == "__main__":
    main()
