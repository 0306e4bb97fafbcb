"""Measure peak temp (activation) memory of the PP train schedules vs M.

GPipe (make_pp_train_step, remat=True) stashes one stage-input per tick and
AD replays the fill-drain in reverse, so every tick's stash is live across
the whole sweep: peak activation memory grows with M.  1F1B
(make_pp_1f1b_train_step) bounds the stash at a 2S-slot ring buffer: peak
activation memory is flat in M.  This script compiles both on the virtual
CPU mesh and prints XLA's memory_analysis() temp/argument bytes per (S, M).

Run:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/pp_memory_analysis.py
"""
import json

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dino_tpu.models.heads import init_head
from dino_tpu.models.vit import ViTConfig, init_vit_params
from dino_tpu.parallel.pipeline import (init_pp_interleaved_train_state,
                                        init_pp_train_state,
                                        make_pp_1f1b_train_step,
                                        make_pp_interleaved_1f1b_train_step,
                                        make_pp_interleaved_train_step,
                                        make_pp_train_step,
                                        stack_block_chunks,
                                        stack_block_stages)
from dino_tpu.train.loop import make_optimizer


def peak_temp_bytes(step, args):
    lowered = jax.jit(step.__wrapped__ if hasattr(step, "__wrapped__")
                      else step).lower(*args)
    mem = lowered.compile().memory_analysis()
    return int(mem.temp_size_in_bytes), int(mem.argument_size_in_bytes)


def compile_scaling():
    """HLO-size and lower+compile wall time of unrolled vs scan 1F1B as M
    grows (the O(M)-vs-O(1) trace-size claim)."""
    import time
    cfg = ViTConfig(patch_size=8, embed_dim=128, num_heads=2)
    depth, n_classes, n_stages, res = 8, 5, 4, 96
    n_pat = (res // cfg.patch_size) ** 2
    vit_p = init_vit_params(jax.random.PRNGKey(0), cfg, depth=depth)
    head_p = init_head(jax.random.PRNGKey(1), "mlp", n_classes,
                       cfg.embed_dim)
    mesh = Mesh(np.array(jax.devices()[:n_stages]), ("stage",))
    stages = jax.device_put(stack_block_stages(vit_p["blocks"], n_stages),
                            NamedSharding(mesh, P("stage")))
    rest = {k: v for k, v in vit_p.items() if k != "blocks"}
    opt = make_optimizer("adam", 1e-3)
    opt_state = init_pp_train_state(opt, stages, rest, head_p)
    chunks = jax.device_put(stack_block_chunks(vit_p["blocks"], n_stages, 2),
                            NamedSharding(mesh, P(None, "stage")))
    il_opt_state = init_pp_interleaved_train_state(opt, chunks, rest, head_p)
    for n_mb in (8, 32):
        b = 2 * n_mb
        rs = np.random.RandomState(0)
        images = rs.randint(0, 255, (b, res, res, 3)).astype(np.uint8)
        labels = rs.randint(0, n_classes, (b, n_pat)).astype(np.int32)
        args = (stages, rest, head_p, opt_state, images, labels)
        il_args = (chunks, rest, head_p, il_opt_state, images, labels)
        for name, scan, mk, a in (
            ("unrolled", False, "contig", args),
            ("scan", True, "contig", args),
            ("il_unrolled", False, "il", il_args),
            ("il_scan", True, "il", il_args),
        ):
            if mk == "contig":
                step = make_pp_1f1b_train_step(
                    cfg, "mlp", n_classes, opt, mesh, n_microbatches=n_mb,
                    use_flash=False, scan=scan)
            else:
                step = make_pp_interleaved_1f1b_train_step(
                    cfg, "mlp", n_classes, opt, mesh, n_chunks=2,
                    n_microbatches=n_mb, use_flash=False, scan=scan)
            t0 = time.perf_counter()
            lowered = jax.jit(step.__wrapped__ if hasattr(step, "__wrapped__")
                              else step).lower(*a)
            t1 = time.perf_counter()
            hlo_kb = len(lowered.as_text()) // 1024
            lowered.compile()
            t2 = time.perf_counter()
            print(json.dumps({"variant": name, "M": n_mb,
                              "hlo_KiB": hlo_kb,
                              "lower_s": round(t1 - t0, 1),
                              "compile_s": round(t2 - t1, 1)}))


def main():
    cfg = ViTConfig(patch_size=8, embed_dim=128, num_heads=2)
    depth, n_classes, n_stages, res = 8, 5, 4, 96
    n_pat = (res // cfg.patch_size) ** 2
    vit_p = init_vit_params(jax.random.PRNGKey(0), cfg, depth=depth)
    head_p = init_head(jax.random.PRNGKey(1), "mlp", n_classes,
                       cfg.embed_dim)
    mesh = Mesh(np.array(jax.devices()[:n_stages]), ("stage",))
    stages = jax.device_put(stack_block_stages(vit_p["blocks"], n_stages),
                            NamedSharding(mesh, P("stage")))
    rest = {k: v for k, v in vit_p.items() if k != "blocks"}
    opt = make_optimizer("adam", 1e-3)
    opt_state = init_pp_train_state(opt, stages, rest, head_p)

    # interleaved layout (V=2 chunks per device) shares the same weights
    chunks = jax.device_put(stack_block_chunks(vit_p["blocks"], n_stages, 2),
                            NamedSharding(mesh, P(None, "stage")))
    il_opt_state = init_pp_interleaved_train_state(opt, chunks, rest, head_p)

    rows = []
    for n_mb in (4, 8, 16):
        mb = 2
        b = mb * n_mb
        rs = np.random.RandomState(0)
        images = rs.randint(0, 255, (b, res, res, 3)).astype(np.uint8)
        labels = rs.randint(0, n_classes, (b, n_pat)).astype(np.int32)
        args = (stages, rest, head_p, opt_state, images, labels)
        for name, mk in (
            ("gpipe_remat", lambda: make_pp_train_step(
                cfg, "mlp", n_classes, opt, mesh, n_microbatches=n_mb,
                use_flash=False, remat=True)),
            ("1f1b", lambda: make_pp_1f1b_train_step(
                cfg, "mlp", n_classes, opt, mesh, n_microbatches=n_mb,
                use_flash=False)),
        ):
            temp, arg = peak_temp_bytes(mk(), args)
            rows.append({"schedule": name, "S": n_stages, "M": n_mb,
                         "temp_MiB": round(temp / 2**20, 1),
                         "args_MiB": round(arg / 2**20, 1)})
            print(json.dumps(rows[-1]))
        # same global batch through the interleaved placement: wave size
        # pinned at M=S, extra microbatches become accumulation waves —
        # peak temp should be ~flat in total M (waves are sequential and
        # XLA reuses their buffers), the schedule's memory story
        il_m = min(n_mb, n_stages)
        il_step = make_pp_interleaved_train_step(
            cfg, "mlp", n_classes, opt, mesh, n_chunks=2,
            n_microbatches=il_m, waves=n_mb // il_m, use_flash=False,
            remat=True)
        il_args = (chunks, rest, head_p, il_opt_state, images, labels)
        temp, arg = peak_temp_bytes(il_step, il_args)
        rows.append({"schedule": "interleaved_v2_remat", "S": n_stages,
                     "M": n_mb, "temp_MiB": round(temp / 2**20, 1),
                     "args_MiB": round(arg / 2**20, 1)})
        print(json.dumps(rows[-1]))
        # interleaved 1F1B: same placement, hand-scheduled backward — all
        # M microbatches in ONE schedule (no waves), 2SV-slot ring stash
        il1_step = make_pp_interleaved_1f1b_train_step(
            cfg, "mlp", n_classes, opt, mesh, n_chunks=2,
            n_microbatches=n_mb, use_flash=False)
        temp, arg = peak_temp_bytes(il1_step, il_args)
        rows.append({"schedule": "interleaved_1f1b_v2", "S": n_stages,
                     "M": n_mb, "temp_MiB": round(temp / 2**20, 1),
                     "args_MiB": round(arg / 2**20, 1)})
        print(json.dumps(rows[-1]))


def dtype_scaling():
    """Stash-dtype accounting: the 1F1B ring buffer + relays carry the
    activation dtype, so compute_dtype=bf16 should roughly halve peak temp
    bytes for both 1F1B forms at fixed (S, M)."""
    cfg = ViTConfig(patch_size=8, embed_dim=128, num_heads=2)
    depth, n_classes, n_stages, res = 8, 5, 4, 96
    n_pat = (res // cfg.patch_size) ** 2
    vit_p = init_vit_params(jax.random.PRNGKey(0), cfg, depth=depth)
    head_p = init_head(jax.random.PRNGKey(1), "mlp", n_classes,
                       cfg.embed_dim)
    mesh = Mesh(np.array(jax.devices()[:n_stages]), ("stage",))
    stages = jax.device_put(stack_block_stages(vit_p["blocks"], n_stages),
                            NamedSharding(mesh, P("stage")))
    chunks = jax.device_put(stack_block_chunks(vit_p["blocks"], n_stages, 2),
                            NamedSharding(mesh, P(None, "stage")))
    rest = {k: v for k, v in vit_p.items() if k != "blocks"}
    opt = make_optimizer("adam", 1e-3)
    opt_state = init_pp_train_state(opt, stages, rest, head_p)
    il_opt_state = init_pp_interleaved_train_state(opt, chunks, rest, head_p)
    n_mb, mb = 16, 2
    b = mb * n_mb
    rs = np.random.RandomState(0)
    images = rs.randint(0, 255, (b, res, res, 3)).astype(np.uint8)
    labels = rs.randint(0, n_classes, (b, n_pat)).astype(np.int32)
    import jax.numpy as jnp
    for dname, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        step = make_pp_1f1b_train_step(
            cfg, "mlp", n_classes, opt, mesh, n_microbatches=n_mb,
            use_flash=False, compute_dtype=dt)
        temp, _ = peak_temp_bytes(
            step, (stages, rest, head_p, opt_state, images, labels))
        print(json.dumps({"schedule": "1f1b", "dtype": dname, "S": n_stages,
                          "M": n_mb, "temp_MiB": round(temp / 2**20, 1)}))
        il_step = make_pp_interleaved_1f1b_train_step(
            cfg, "mlp", n_classes, opt, mesh, n_chunks=2,
            n_microbatches=n_mb, use_flash=False, compute_dtype=dt)
        temp, _ = peak_temp_bytes(
            il_step, (chunks, rest, head_p, il_opt_state, images, labels))
        print(json.dumps({"schedule": "interleaved_1f1b_v2", "dtype": dname,
                          "S": n_stages, "M": n_mb,
                          "temp_MiB": round(temp / 2**20, 1)}))


if __name__ == "__main__":
    import sys
    if "--compile_scaling" in sys.argv:
        compile_scaling()
    elif "--dtype" in sys.argv:
        dtype_scaling()
    else:
        main()
