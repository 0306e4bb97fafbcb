#!/usr/bin/env python
"""Model-zoo scaling bench: predict throughput for ViT-Ti/S/B (patch 8).

The reference ships three backbone factories (vision_transformer.py:293-311);
the headline bench covers the production ViT-S/8 3-block config.  This tool
measures the FULL-DEPTH (12-block) zoo at 480px so the MXU-utilization story
is visible across widths: round 2 established that D=384 matmuls tile at
~27-31% of peak on this chip; D=768 should tile better, D=192 worse.  Uses
bench.py's chained-scan pattern (data dependency between iterations) so XLA
cannot hoist or DCE the work.

    python tools/bench_zoo.py [--batch 3] [--res 480] [--n_blocks 12]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def vit_flops(cfg, n_tokens: int, depth: int) -> float:
    """Forward matmul FLOPs (MXU work) for one image."""
    d, n = cfg.embed_dim, n_tokens
    per_block = (2 * n * d * 3 * d      # qkv
                 + 2 * n * n * d        # q@k^T (over all heads)
                 + 2 * n * n * d        # probs@v
                 + 2 * n * d * d        # proj
                 + 2 * 2 * n * d * cfg.mlp_hidden)  # fc1+fc2
    patchify = 2 * n * (3 * cfg.patch_size ** 2) * d
    return depth * per_block + patchify


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=3)
    ap.add_argument("--res", type=int, default=480)
    ap.add_argument("--n_blocks", type=int, default=12)
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dino_tpu.models.heads import init_head
    from dino_tpu.models.vit import (init_vit_params, vit_base, vit_small,
                                     vit_tiny)
    from dino_tpu.ops.preprocess import preprocess
    from dino_tpu.train.loop import seg_forward

    res, batch, depth = args.res, args.batch, args.n_blocks
    out_size = res // 8
    n_tokens = out_size * out_size + 1
    rs = np.random.RandomState(0)
    frames = jax.device_put(
        rs.randint(0, 255, (batch, 480, 640, 3)).astype(np.uint8))
    peak_tf = 197.0  # v5e bf16 MXU peak, TF/s

    rows = []
    for name, factory in (("vit_tiny", vit_tiny), ("vit_small", vit_small),
                          ("vit_base", vit_base)):
        cfg = factory(patch_size=8)
        vit_p = jax.device_put(
            init_vit_params(jax.random.PRNGKey(0), cfg, depth=depth))
        head_p = jax.device_put(init_head(jax.random.PRNGKey(1), "mlp", 7,
                                          cfg.embed_dim))

        def predict_impl(vit_p, head_p, imgs):
            x = preprocess(imgs, res)
            logp = seg_forward(vit_p, head_p, cfg, "mlp", pre_normalized=x,
                               compute_dtype=jnp.bfloat16)
            return jnp.argmax(logp, axis=-1).reshape(-1, out_size, out_size)

        @jax.jit
        def run(vit_p, head_p, imgs):
            def body(carry, _):
                im = imgs.at[0, 0, 0, 0].set(carry)
                out = predict_impl(vit_p, head_p, im)
                return out[0, 0, 0].astype(jnp.uint8), ()
            carry, _ = jax.lax.scan(body, jnp.uint8(0), None,
                                    length=args.iters)
            return carry

        np.asarray(run(vit_p, head_p, frames))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(run(vit_p, head_p, frames))
        dt = time.perf_counter() - t0
        fps = batch * args.iters / dt
        tf = vit_flops(cfg, n_tokens, depth) * fps / 1e12
        rows.append({"model": name, "D": cfg.embed_dim, "depth": depth,
                     "fps": round(fps, 1), "TFs": round(tf, 1),
                     "mxu_pct": round(100 * tf / peak_tf, 1)})
        print(json.dumps(rows[-1]))

    print(json.dumps({"res": res, "batch": batch, "rows": rows}))


if __name__ == "__main__":
    main()
