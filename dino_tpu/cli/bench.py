#!/usr/bin/env python
"""Headline benchmark: frames/sec on one TPU chip, BASELINE config #2
(ViT-S/8 truncated to 3 blocks + MLP head, 480px, full predict path:
uint8 camera frame -> resize -> normalize -> ViT -> head -> argmax -> 480x480
label map).  Prints ONE JSON line; baseline is the committed torch-CPU
measurement (tools/bench_torch_baseline.py -> bench_baseline.json).
"""
import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dino_tpu.models.heads import init_head
    from dino_tpu.models.vit import ViTConfig, init_vit_params
    from dino_tpu.ops.preprocess import preprocess
    from dino_tpu.ops.upsample import kron_upsample
    from dino_tpu.train.loop import seg_forward

    res, n_blocks, n_classes = 480, 3, 7
    # batch 3 is the measured serving optimum at 480px (PERF.md round-3
    # sweep: 718 fps vs 613 at the round-2 default of 16 — small batches
    # tile the D=384 matmuls better, the same effect as train microbatching)
    batch = int(os.environ.get("BENCH_BATCH", "3"))
    dtype = (jnp.bfloat16 if os.environ.get("BENCH_PRECISION", "bf16")
             == "bf16" else None)
    cfg = ViTConfig(patch_size=8)
    vit_p = jax.device_put(init_vit_params(jax.random.PRNGKey(0), cfg,
                                           depth=n_blocks))
    head_p = jax.device_put(init_head(jax.random.PRNGKey(1), "mlp", n_classes,
                                      cfg.embed_dim))
    out_size = res // 8

    def predict_batch_impl(vit_p, head_p, imgs_u8):
        x = preprocess(imgs_u8, res)
        logp = seg_forward(vit_p, head_p, cfg, "mlp", pre_normalized=x,
                           compute_dtype=dtype)
        low = jnp.argmax(logp, axis=-1).reshape(-1, out_size, out_size)
        return jax.vmap(lambda m: kron_upsample(m, 480 // out_size))(
            low.astype(jnp.int32))

    predict_batch = jax.jit(predict_batch_impl)

    # throughput: chain N predicts inside one device program (lax.scan with a
    # data dependency) so async dispatch / RPC tunnels can't skip work
    # scale the chain length so the one-per-call tunnel roundtrip (~8 ms)
    # stays ~2% of the measured window at any batch size
    n_iters = int(os.environ.get("BENCH_ITERS", str(max(20, 320 // batch))))

    def make_chained_predict(length):
        @jax.jit
        def run(vit_p, head_p, imgs_u8):
            def body(carry, _):
                imgs = imgs_u8.at[0, 0, 0, 0].set(carry)
                out = predict_batch_impl(vit_p, head_p, imgs)
                return out[0, 0, 0].astype(jnp.uint8), ()
            carry, _ = jax.lax.scan(body, jnp.uint8(0), None, length=length)
            return carry
        return run

    predict_n = make_chained_predict(n_iters)

    rs = np.random.RandomState(0)
    frames = jax.device_put(
        rs.randint(0, 255, (batch, 480, 640, 3)).astype(np.uint8))

    # NOTE: fetch with np.asarray — on remote/tunneled backends
    # block_until_ready can return before execution completes.
    np.asarray(predict_n(vit_p, head_p, frames))  # compile+warm
    t0 = time.perf_counter()
    np.asarray(predict_n(vit_p, head_p, frames))
    dt = time.perf_counter() - t0
    fps = batch * n_iters / dt

    # p50 single-frame latency (incl. host->device + device->host)
    one = rs.randint(0, 255, (1, 480, 640, 3)).astype(np.uint8)
    np.asarray(predict_batch(vit_p, head_p, jax.device_put(one)))
    lats = []
    for _ in range(20):
        t0 = time.perf_counter()
        np.asarray(predict_batch(vit_p, head_p, jax.device_put(one)))
        lats.append(time.perf_counter() - t0)
    p50_ms = float(np.percentile(lats, 50) * 1000)

    # device-only per-frame latency: chain 50 single-frame predicts inside
    # one program (one tunnel roundtrip amortized over all of them), so the
    # driver record self-documents how much of p50 is RPC-tunnel overhead
    n_dev = 50
    predict_chain1 = make_chained_predict(n_dev)
    one_dev = jax.device_put(one)
    np.asarray(predict_chain1(vit_p, head_p, one_dev))  # compile+warm
    chain_ms = []
    for _ in range(5):  # median so one tunnel stall can't skew the record
        t0 = time.perf_counter()
        np.asarray(predict_chain1(vit_p, head_p, one_dev))
        chain_ms.append((time.perf_counter() - t0) * 1000 / n_dev)
    p50_device_ms = float(np.percentile(chain_ms, 50))

    # secondary: unfrozen finetune throughput (the round-2 Pallas flash
    # backward win: 16 -> ~166 fps); steps chain through the param update
    train_fps = None
    train_accum = int(os.environ.get("BENCH_TRAIN_ACCUM", "8"))
    if os.environ.get("BENCH_TRAIN", "1") == "1":
        from dino_tpu.train.loop import (init_opt_state, make_optimizer,
                                         make_train_step)
        opt = make_optimizer("adam", 1e-5)
        opt_state = init_opt_state(opt, vit_p, head_p, freeze_backbone=False)
        # accum_steps=8 is the recommended single-chip finetune config
        # (PERF.md: small microbatches tile the D=384 matmuls ~13% better
        # at 480px and avoid remat entirely at 960px; update semantics are
        # identical to the monolithic step, equality-tested)
        step = make_train_step(cfg, "mlp", n_classes, opt,
                               freeze_backbone=False, donate=False,
                               compute_dtype=dtype, accum_steps=train_accum)
        tbatch = int(os.environ.get("BENCH_TRAIN_BATCH", "16"))
        labels = jax.device_put(rs.randint(
            0, n_classes, (tbatch, out_size * out_size)).astype(np.int32))
        # train batches are square res x res (the loader's output shape)
        timgs = jax.device_put(
            rs.randint(0, 255, (tbatch, res, res, 3)).astype(np.uint8))
        vp, hp, st = vit_p, head_p, opt_state
        out = step(vp, hp, st, timgs, labels)
        np.asarray(out[3])  # compile+warm
        t0 = time.perf_counter()
        for _ in range(8):
            vp, hp, st, loss, _ = step(vp, hp, st, timgs, labels)
        np.asarray(loss)
        train_fps = tbatch * 8 / (time.perf_counter() - t0)

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", "..", "bench_baseline.json")
    baseline_fps = baseline_train_fps = None
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        baseline_fps = base.get("torch_cpu_fps")
        baseline_train_fps = base.get("torch_cpu_train_fps")

    result = {
        "metric": "frames_per_sec_480px_vit_s8_3block_mlp",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / baseline_fps, 2) if baseline_fps else None,
        "p50_predict_latency_ms": round(p50_ms, 2),
        "p50_device_ms": round(p50_device_ms, 2),
        "unfrozen_train_fps": round(train_fps, 1) if train_fps else None,
        "train_vs_baseline": (round(train_fps / baseline_train_fps, 2)
                              if train_fps and baseline_train_fps else None),
        "train_accum_steps": train_accum if train_fps else None,
        "batch": batch,
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
