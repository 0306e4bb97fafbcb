#!/usr/bin/env python
"""Streaming robot-camera trace benchmark (BASELINE config #5): continuous
batched 480px inference with interleaved per-head CLS attention-map
extraction, plus the 960px high-res scaling path (config #3).

Prints one JSON line per scenario (supplementary to bench.py's headline).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import jax
    import jax.numpy as jnp

    from dino_tpu.models.heads import init_head
    from dino_tpu.models.vit import (ViTConfig, get_last_selfattention,
                                     init_vit_params)
    from dino_tpu.ops.preprocess import preprocess
    from dino_tpu.train.loop import seg_forward

    cfg = ViTConfig(patch_size=8)
    vit_p = jax.device_put(init_vit_params(jax.random.PRNGKey(0), cfg, depth=3))
    head_p = jax.device_put(init_head(jax.random.PRNGKey(1), "mlp", 7, 384))
    rs = np.random.RandomState(0)
    results = []

    # --- scenario 1: streaming 480px batched predict + attention every batch
    # (batch 3 is the measured 480px serving optimum — PERF.md round-3 sweep;
    # smaller batches also refresh the attention maps more often)
    batch, res, n_iters = 3, 480, 32
    frames = jax.device_put(
        rs.randint(0, 255, (batch, 480, 640, 3)).astype(np.uint8))

    def stream_step_impl(vit_p, head_p, imgs):
        x = preprocess(imgs, res).astype(jnp.bfloat16)
        logp = seg_forward(vit_p, head_p, cfg, "mlp", pre_normalized=x)
        labels = jnp.argmax(logp, -1).reshape(batch, res // 8, res // 8)
        # per-head CLS attention of frame 0 (visualize_attention path)
        attn = get_last_selfattention(vit_p, x[:1], cfg)
        cls_maps = attn[0, :, 0, 1:].reshape(-1, res // 8, res // 8)
        return labels, cls_maps

    @jax.jit
    def stream_n(vit_p, head_p, imgs):
        def body(c, _):
            labels, maps = stream_step_impl(vit_p, head_p,
                                            imgs.at[0, 0, 0, 0].set(c))
            return labels[0, 0, 0].astype(jnp.uint8), ()
        c, _ = jax.lax.scan(body, jnp.uint8(0), None, length=n_iters)
        return c

    np.asarray(stream_n(vit_p, head_p, frames))
    t0 = time.perf_counter()
    np.asarray(stream_n(vit_p, head_p, frames))
    dt = time.perf_counter() - t0
    results.append({
        "metric": "stream_480px_predict_plus_attention_fps",
        "value": round(batch * n_iters / dt, 2), "unit": "frames/s/chip",
        "batch": batch, "note": "labels for all frames + 6-head CLS maps"})

    # --- scenario 2: 960px high-res batched inference (memory scaling path)
    res2, batch2, n2 = 960, 4, 6
    frames2 = jax.device_put(
        rs.randint(0, 255, (batch2, 960, 1280, 3)).astype(np.uint8))

    @jax.jit
    def hires_n(vit_p, head_p, imgs):
        def body(c, _):
            x = preprocess(imgs.at[0, 0, 0, 0].set(c), res2).astype(jnp.bfloat16)
            logp = seg_forward(vit_p, head_p, cfg, "mlp", pre_normalized=x)
            labels = jnp.argmax(logp, -1)
            return labels[0].astype(jnp.uint8), ()
        c, _ = jax.lax.scan(body, jnp.uint8(0), None, length=n2)
        return c

    np.asarray(hires_n(vit_p, head_p, frames2))
    t0 = time.perf_counter()
    np.asarray(hires_n(vit_p, head_p, frames2))
    dt = time.perf_counter() - t0
    results.append({
        "metric": "hires_960px_predict_fps",
        "value": round(batch2 * n2 / dt, 2), "unit": "frames/s/chip",
        "batch": batch2, "note": "N=14,401 tokens, flash attention"})

    # --- scenario 3 (config #4): head-finetuning training throughput
    from dino_tpu.train.loop import (init_opt_state, make_optimizer,
                                     make_train_step)
    optimizer = make_optimizer("adam", 1e-3)
    for frozen, label in [(True, "frozen_head_training"),
                          (False, "unfrozen_finetuning")]:
        bt = 16
        step = make_train_step(cfg, "mlp", 7, optimizer, frozen, donate=False,
                               compute_dtype=jnp.bfloat16)
        opt_state = init_opt_state(optimizer, vit_p, head_p, frozen)
        imgs = jax.device_put(
            rs.randint(0, 255, (bt, 480, 480, 3)).astype(np.uint8))
        labels = jax.device_put(
            rs.randint(0, 7, (bt, 3600)).astype(np.int32))
        v, h, o, loss, _ = step(vit_p, head_p, opt_state, imgs, labels)
        np.asarray(loss)  # compile + settle
        n3 = 5
        t0 = time.perf_counter()
        for _ in range(n3):
            v, h, o, loss, _ = step(v, h, o, imgs, labels)
        np.asarray(loss)
        dt = time.perf_counter() - t0
        results.append({
            "metric": f"train_{label}_480px_fps",
            "value": round(bt * n3 / dt, 2), "unit": "frames/s/chip",
            "batch": bt})

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
