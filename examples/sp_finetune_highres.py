#!/usr/bin/env python
"""High-resolution finetuning across chips with sequence parallelism.

At 960px one image is 14,401 tokens; the flash kernels already make that
memory-linear on ONE chip, and this example is the multi-chip version: the
token axis shards over the mesh, every block's attention runs as a ring
(K/V shards rotate over ICI), and training runs THROUGH the ring — the
custom VJP rotates dK/dV accumulators back around on the backward pass
(dino_tpu/parallel/ring_attention.py).  Gradients match the single-device
step to fp32 tolerance (tests/test_ring_attention.py), so this is the same
finetune, just with 1/n_devices of the activation footprint per chip.

Run on a TPU slice (one process per host, jax.distributed auto-init), or
simulate on CPU with:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/sp_finetune_highres.py --resolution 480 --steps 2

Loads a VOC-style dataset dir (JPEGImages/ + SegmentationClass/*.npy) like
DINOSeg.fit; this example keeps the loop minimal — for checkpointing, val
metrics, and resume, lift the pieces from dino_tpu/api.py:_fit_phase.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", default=None,
                    help="VOC dir (defaults to synthetic random batches)")
    ap.add_argument("--resolution", type=int, default=960)
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--n_blocks", type=int, default=3)
    ap.add_argument("--n_classes", type=int, default=7)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--lr", type=float, default=1e-5)
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # some rigs pre-import jax pinned to another platform; config.update
        # still wins as long as no backend has been initialized
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dino_tpu.models.heads import init_head
    from dino_tpu.models.vit import ViTConfig, init_vit_params
    from dino_tpu.parallel.mesh import make_mesh
    from dino_tpu.parallel.ring_attention import make_sp_train_step
    from dino_tpu.train.loop import init_opt_state, make_optimizer

    cfg = ViTConfig(patch_size=8)
    res, grid = args.resolution, args.resolution // 8
    vit_p = init_vit_params(jax.random.PRNGKey(0), cfg, depth=args.n_blocks)
    head_p = init_head(jax.random.PRNGKey(1), "mlp", args.n_classes,
                       cfg.embed_dim)

    mesh = make_mesh(model_axis=1)  # all chips on the ring
    print(f"ring over {mesh.shape['data']} devices; N = {grid * grid + 1} "
          f"tokens -> {-(-(grid * grid + 1) // mesh.shape['data'])} "
          f"tokens/chip")
    opt = make_optimizer("adam", args.lr)
    opt_state = init_opt_state(opt, vit_p, head_p, freeze_backbone=False)
    step = make_sp_train_step(cfg, "mlp", args.n_classes, opt, mesh)

    if args.data_path:
        from dino_tpu.data.dataset import DuckieSegDataset, batched_loader
        ds = DuckieSegDataset(args.data_path, augmented=False, resolution=res)
        idx = np.arange(len(ds))
        batches = batched_loader(ds, idx[:args.steps * args.batch_size],
                                 args.batch_size,
                                 rng=np.random.default_rng(0))
    else:
        rs = np.random.RandomState(0)

        def synth():
            for _ in range(args.steps):
                yield (rs.randint(0, 255, (args.batch_size, res, res, 3)
                                  ).astype(np.uint8),
                       rs.randint(0, args.n_classes,
                                  (args.batch_size, grid * grid)
                                  ).astype(np.int32))
        batches = synth()

    for i, (imgs, labels) in enumerate(batches):
        t0 = time.time()
        vit_p, head_p, opt_state, loss, _cm = step(vit_p, head_p, opt_state,
                                                   jnp.asarray(imgs),
                                                   jnp.asarray(labels))
        print(f"step {i}: loss={float(loss):.4f} "
              f"({time.time() - t0:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
