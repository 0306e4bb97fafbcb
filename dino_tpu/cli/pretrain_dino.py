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
    ap.add_argument("--fsdp", action="store_true",
                    help="FSDP/ZeRO-3: shard the pretrain state (student + "
                         "teacher + Adam moments, the framework's fattest "
                         "train state) 1/N per device over the data axis; "
                         "weights all-gather transiently at use, gradients "
                         "reduce-scatter (parallel/mesh.py:fsdp_spec). "
                         "No-op on one device")
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
                    help="continue an interrupted run from the checkpoint "
                         "in write_path (epoch- or step-granular)")
    ap.add_argument("--stop_after", type=int, default=None,
                    help="checkpoint and exit after this epoch index "
                         "(chunk a long run across job allocations; "
                         "schedules still span --epochs)")
    ap.add_argument("--save_every_steps", type=int, default=0,
                    help="ALSO checkpoint every N optimizer steps "
                         "(asynchronously — the npz write overlaps the next "
                         "steps), so a preempted long epoch resumes "
                         "mid-epoch instead of replaying from its start; "
                         "0 = epoch-end saves only")
    ap.add_argument("--stop_after_steps", type=int, default=None,
                    help="(testing/chunking) request a graceful stop after "
                         "this many optimizer steps of THIS invocation — "
                         "same checkpoint-and-exit path a SIGTERM takes")
    ap.add_argument("--stop_poll_secs", type=float, default=2.0,
                    help="multi-host: target WALL-TIME between the "
                         "stop-signal agreement collectives; the step "
                         "cadence is derived from the slowest host's "
                         "measured step time, so SIGTERM response stays "
                         "bounded in seconds (inside a preemption grace "
                         "period) whatever the model/resolution costs "
                         "per step")
    ap.add_argument("--nan_guard", action="store_true",
                    help="failure detection: if a step's loss is non-finite, "
                         "roll the train state back to the last checkpoint "
                         "and SKIP the offending batch (schedules keep "
                         "their global step) instead of poisoning the run; "
                         "raises after 3 consecutive rollbacks.  Rollback "
                         "granularity = --save_every_steps (or epoch-end)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from dino_tpu import models
    from dino_tpu.checkpointing.io import flatten_params
    from dino_tpu.data.prefetch import prefetched
    from dino_tpu.models import vit as vit_mod
    from dino_tpu.train.dino_pretrain import (DinoConfig,
                                              dino_multi_crop_batch,
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
    fsdp_mesh = None
    if args.fsdp and jax.device_count() > 1:
        from dino_tpu.parallel.mesh import fsdp_place, make_mesh
        fsdp_mesh = make_mesh(model_axis=1)
        if args.batch_size % jax.device_count():
            print(f"WARNING: --fsdp with batch_size {args.batch_size} not "
                  f"divisible by {jax.device_count()} devices: crops cannot "
                  "shard, every device computes the full batch redundantly "
                  "(state memory still shards 1/N)")
        # place the freshly-initialized state SHARDED before the first
        # step — otherwise the 5 ViT-sized trees sit whole on device 0
        # and a model that needs FSDP OOMs before training starts
        student = fsdp_place(student, fsdp_mesh)
        teacher = fsdp_place(teacher, fsdp_mesh)
        opt_state = fsdp_place(opt_state, fsdp_mesh)
    step = make_dino_train_step(vit_cfg, dino_cfg, opt, donate=True,
                                accum_steps=args.accum_steps,
                                fsdp_mesh=fsdp_mesh)
    center = jnp.zeros((1, dino_cfg.out_dim), jnp.float32)

    niter = max(1, len(files) // args.batch_size)
    lr_s, wd_s, mom_s, tt_s = dino_schedules(
        args.lr, args.epochs, niter, warmup_epochs=args.warmup_epochs,
        momentum_base=args.momentum_teacher,
        teacher_temp=args.teacher_temp,
        warmup_teacher_temp_epochs=args.warmup_teacher_temp_epochs)


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
        # Crops stay uint8 on the host: the train step normalizes on-device
        # (4x smaller host->device transfer, and the old per-batch
        # normalize-on-device-then-copy-back roundtrip is gone entirely).
        # Pixels run through the C++ thread-pool pipeline when available
        # (decode each JPEG once, all crops off the GIL); crop randomness
        # stays keyed by (seed, epoch, image-index) in Python either way.
        return dino_multi_crop_batch(
            [files[i] for i in rows],
            [np.random.default_rng([args.seed, epoch, int(i)])
             for i in rows], dino_cfg)

    # resume: per-epoch keyed rngs (shuffle + per-image crops) make a
    # restart bit-deterministic at STEP granularity — step s of epoch k
    # replays identically whether the process died before it or not, so a
    # mid-epoch checkpoint (--save_every_steps) resumes exactly
    from dino_tpu.checkpointing.async_writer import AsyncCheckpointer
    from dino_tpu.checkpointing.resume import restart_from_checkpoint
    writer = AsyncCheckpointer(name="pretrain-ckpt")
    resume_path = os.path.join(args.write_path, "pretrain_resume.npz")
    start_epoch = 0
    start_step = 0  # first step index to RUN within start_epoch
    have_resume = os.path.exists(resume_path)
    if args.resume and n_proc > 1:
        # host 0 alone writes the resume file; verify every rank sees the
        # same state (shared-FS contract, docs/SCALING.md) before acting
        from dino_tpu.parallel.dist import agree_across_hosts
        agree_across_hosts("pretrain resume-state visibility",
                           int(have_resume))
    def load_resume_state(cur_student, cur_teacher, cur_center,
                          cur_opt_state):
        """(student, teacher, center, opt_state, run_vars) from resume_path;
        shared by --resume startup and the NaN-guard rollback."""
        run_vars = {"epoch": 0, "step": None}
        restored = restart_from_checkpoint(
            resume_path, run_vars, student=cur_student, teacher=cur_teacher,
            center=cur_center, opt_state=cur_opt_state)
        meta = cur_student["head"]["_meta"]  # static config, not train state
        r_student = jax.tree.map(jnp.asarray, restored["student"])
        r_teacher = jax.tree.map(jnp.asarray, restored["teacher"])
        r_student["head"]["_meta"] = dict(meta)
        r_teacher["head"]["_meta"] = dict(meta)
        r_center = jnp.asarray(restored["center"])
        r_opt = jax.tree.unflatten(
            jax.tree.structure(cur_opt_state),
            [jnp.asarray(x) for x in jax.tree.leaves(restored["opt_state"])])
        if fsdp_mesh is not None:
            # restored state is host-local; re-place it sharded so resume
            # and nan-guard rollback never materialize the whole state on
            # one device
            from dino_tpu.parallel.mesh import fsdp_place
            r_student = fsdp_place(r_student, fsdp_mesh)
            r_teacher = fsdp_place(r_teacher, fsdp_mesh)
            r_opt = fsdp_place(r_opt, fsdp_mesh)
        return r_student, r_teacher, r_center, r_opt, run_vars

    if args.resume and have_resume:
        student, teacher, center, opt_state, run_vars = load_resume_state(
            student, teacher, center, opt_state)
        # "step" = last COMPLETED step within "epoch" (older epoch-end
        # checkpoints carry no step and mean the whole epoch finished)
        last_step = (niter - 1 if run_vars["step"] is None
                     else int(run_vars["step"]))
        if last_step >= niter - 1:
            start_epoch = int(run_vars["epoch"]) + 1
        else:
            start_epoch = int(run_vars["epoch"])
            start_step = last_step + 1
        if n_proc > 1:  # torn read / stale NFS cache => fail fast
            from dino_tpu.parallel.dist import agree_across_hosts
            agree_across_hosts("pretrain resume epoch/step",
                               start_epoch * niter + start_step)

    # Preemption safety: SIGTERM/SIGINT (what a TPU-VM maintenance event or
    # scheduler delivers — on every host) requests a graceful stop; the loop
    # finishes the in-flight step, checkpoints at step granularity, and
    # exits 0 so the restarted job --resume's exactly where it stopped.
    import signal
    stop_requested = {"flag": False}

    def _request_stop(signum, frame):
        stop_requested["flag"] = True

    old_handlers = {s: signal.signal(s, _request_stop)
                    for s in (signal.SIGTERM, signal.SIGINT)}

    def save_state(epoch, s):
        state = {"student": student, "teacher": teacher,
                 "center": center, "opt_state": opt_state}
        if fsdp_mesh is not None and n_proc > 1:
            # FSDP shards span other hosts' devices: host 0 cannot
            # np.asarray them alone — gather collectively BEFORE the
            # host-0 gate (save_state is only called at points every
            # rank reaches together: agreed stops, deterministic
            # save_every_steps, epoch end).  Per-leaf shard-aware: a
            # host-local tree (e.g. right after a restore, before any
            # step ran) passes through instead of being mis-concatenated,
            # and the head's python _meta scalars stay scalars
            from dino_tpu.parallel.mesh import gather_if_sharded
            state = gather_if_sharded(state)
        if p_i == 0:
            writer.save_train_state(
                resume_path, state,
                run_variables={"epoch": epoch, "step": s})

    steps_done = 0
    stopped = False
    rollbacks = 0  # consecutive NaN-guard rollbacks
    # multi-host stop-agreement cadence (in steps), derived after a short
    # warmup from the slowest host's measured step time so the SIGTERM
    # response is bounded in SECONDS (--stop_poll_secs), not steps; None
    # during warmup = agree every step
    stop_cadence = None
    _cadence_warmup = 8
    poll_t0 = None       # anchored at the first post-compile stop check
    poll_base = 0
    # fault injection (tests / chaos drills): poison the crops of the step
    # at this 0-based index so the guard's detect->rollback->skip path can
    # be exercised deterministically (SURVEY §5 "fault injection")
    fault_step = int(os.environ.get("DINO_TPU_FAULT_NAN_STEP", "-1"))
    it = start_epoch * niter + start_step
    for epoch in range(start_epoch, args.epochs):
        order = np.random.default_rng([args.seed, epoch]).permutation(
            len(files))
        t0 = time.time()
        losses = []
        first = start_step if epoch == start_epoch else 0

        def load_step(s, _epoch=epoch):
            idx = order[s * args.batch_size:(s + 1) * args.batch_size]
            rows = idx[p_i * b_loc:(p_i + 1) * b_loc]  # this host's slab
            return load_crops(rows, _epoch)

        # decode/augment step s+1 on a background thread while the device
        # runs step s (JAX dispatch releases the GIL).  Crop randomness is
        # keyed by (seed, epoch, image-index), so prefetching cannot change
        # the pixel stream — resume bit-determinism is untouched.
        for s, (g_crops, l_crops) in prefetched(range(first, niter),
                                                load_step, depth=2):
            if steps_done == fault_step:
                g_crops = g_crops + np.float32("nan")
            opt_state.hyperparams["learning_rate"] = jnp.float32(lr_s[it])
            opt_state.hyperparams["weight_decay"] = jnp.float32(wd_s[it])
            student, teacher, center, opt_state, loss = step(
                student, teacher, center, opt_state, place(g_crops),
                place(l_crops), jnp.float32(tt_s[it]),
                jnp.float32(mom_s[it]),
                jnp.float32(1.0 if epoch < args.freeze_last_layer else 0.0))
            losses.append(float(loss))
            it += 1
            steps_done += 1
            if args.nan_guard and not np.isfinite(losses[-1]):
                # Failure detection: the state is poisoned — roll back to
                # the last checkpoint and skip this batch.  float(loss) is
                # the globally-aggregated SPMD loss, so every host takes
                # the same decision; the guard runs BEFORE the periodic
                # save, so a NaN state is never checkpointed.
                losses.pop()
                rollbacks += 1
                if rollbacks > 3:
                    raise RuntimeError(
                        "nan_guard: 3 consecutive rollbacks — the "
                        "divergence is persistent (lr too high / data "
                        "corruption); aborting instead of looping")
                writer.wait()  # pending async saves must land before reading
                if n_proc > 1:
                    # all hosts reach here at the same step (float(loss) is
                    # the global SPMD loss), but host 0's os.replace must
                    # land before any OTHER rank opens the file — without
                    # the barrier a rank can restore an older checkpoint
                    # than host 0 and the ranks silently diverge
                    from jax.experimental import multihost_utils
                    multihost_utils.sync_global_devices(
                        f"dt_nan_rollback_{it}")
                if not os.path.exists(resume_path):
                    raise RuntimeError(
                        "nan_guard: non-finite loss before the first "
                        "checkpoint exists — nothing to roll back to")
                if p_i == 0:
                    print(f"nan_guard: non-finite loss at epoch {epoch} "
                          f"step {s} — rolled back to {resume_path} and "
                          f"skipped the batch ({rollbacks}/3)")
                student, teacher, center, opt_state, rb_vars = (
                    load_resume_state(student, teacher, center, opt_state))
                if n_proc > 1:  # stale NFS read after the barrier => fail
                    from dino_tpu.parallel.dist import agree_across_hosts
                    agree_across_hosts(
                        "nan_guard rollback epoch/step",
                        [int(rb_vars["epoch"]),
                         -1 if rb_vars["step"] is None
                         else int(rb_vars["step"])])
                continue
            rollbacks = 0
            # the signal lands on each host at a slightly different moment;
            # agree collectively so every rank breaks at the SAME step —
            # otherwise one host exits the loop while another dispatches
            # step s+1's collectives and the job deadlocks through the
            # preemption grace period.  Agreement is itself a cross-host
            # collective, so it runs on a cadence, not per step; between
            # cadence points multi-host ranks ignore the local flag
            # (acting on it would diverge).  The cadence targets
            # --stop_poll_secs of WALL time: the first _cadence_warmup
            # steps agree every step while each rank times them, then one
            # allgather takes the slowest host's step time and every rank
            # computes the same cadence from the same gathered max — a
            # pure function of s thereafter, identical across ranks and
            # nan_guard rollbacks.  --stop_after_steps is deterministic
            # (same steps_done on every host) and needs no agreement.
            stop_flag = stop_requested["flag"]
            if n_proc > 1:
                from dino_tpu.parallel.dist import any_across_hosts
                if stop_cadence is None and poll_t0 is None:
                    # anchor AFTER the first step so the one-off compile
                    # doesn't inflate the measured step time; steps_done
                    # is identical across ranks, so every rank anchors at
                    # the same loop point
                    poll_t0, poll_base = time.time(), steps_done
                elif (stop_cadence is None
                      and steps_done - poll_base >= _cadence_warmup):
                    from jax.experimental import multihost_utils
                    elapsed = np.asarray(multihost_utils.process_allgather(
                        np.atleast_1d(np.float32(time.time() - poll_t0))))
                    step_t = float(elapsed.max()) / (steps_done - poll_base)
                    stop_cadence = max(1, min(64, int(args.stop_poll_secs
                                                      / max(step_t, 1e-3))))
                    if p_i == 0:
                        print(f"stop-agreement cadence: every "
                              f"{stop_cadence} steps "
                              f"({step_t:.2f}s/step on the slowest host)")
                cad = stop_cadence or 1      # warmup: agree every step
                if s % cad == cad - 1 or s == niter - 1:
                    stop_flag = any_across_hosts(stop_flag)
                else:
                    stop_flag = False
            stopped = (stop_flag
                       or (args.stop_after_steps is not None
                           and steps_done >= args.stop_after_steps))
            if stopped or (args.save_every_steps
                           and s != niter - 1
                           and (s + 1) % args.save_every_steps == 0):
                save_state(epoch, s)
            if stopped:
                break
        if stopped:
            writer.close()  # the preemption save must land before we exit
            if n_proc > 1:
                from jax.experimental import multihost_utils
                multihost_utils.sync_global_devices("dt_pretrain_stop")
            if p_i == 0:
                print(f"graceful stop at epoch {epoch} step "
                      f"{it - 1 - epoch * niter} "
                      f"(signal or --stop_after_steps); resume with --resume")
            for sig, h in old_handlers.items():
                signal.signal(sig, h)
            return None
        if p_i == 0:
            print(f"[epoch {epoch}] dino_loss={np.mean(losses):.4f} "
                  f"lr={lr_s[it-1]:.2e} m={mom_s[it-1]:.4f} "
                  f"({time.time()-t0:.1f}s)")
        save_state(epoch, niter - 1)
        if n_proc > 1:
            # the barrier publishes the file to the other ranks, so the
            # write must land first; single-host runs keep it async
            writer.wait()
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(f"dt_pretrain_ep{epoch}")
        if args.stop_after is not None and epoch >= args.stop_after:
            if p_i == 0:
                print(f"stopping after epoch {epoch} (--stop_after); resume "
                      "with --resume")
            break
    for sig, h in old_handlers.items():
        signal.signal(sig, h)
    writer.close()  # drain + join: resume file on disk, no leaked thread

    # save the TEACHER backbone (the better model, per the paper) in the
    # converted-npz layout the rest of the framework loads directly
    out = os.path.join(args.write_path, "dino_pretrained_backbone.npz")
    teacher_vit = teacher["vit"]
    if fsdp_mesh is not None and n_proc > 1:
        # collective gather before the host-0 gate (FSDP shards span
        # hosts).  Shard-aware per leaf: on a resumed-and-already-finished
        # run the teacher is a host-local restore that never went through
        # a step, and blind process_allgather(tiled=True) would CONCAT the
        # identical host values (cls_token (1,1,D) -> (n_proc,1,D)) and
        # export a garbled backbone
        from dino_tpu.parallel.mesh import gather_if_sharded
        teacher_vit = gather_if_sharded(teacher_vit)
    if p_i == 0:
        np.savez(out, **flatten_params(
            jax.tree.map(np.asarray, teacher_vit)))
        print(f"saved backbone -> {out}")
    if n_proc > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("dt_pretrain_save")
    return out


if __name__ == "__main__":
    main()
