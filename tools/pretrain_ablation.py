#!/usr/bin/env python
"""DINO pretrain step roofline: stage ablation + MXU floor (VERDICT r2 #4).

Measures, on the real chip with bench.py's scan-chain-with-data-dependency
methodology (XLA hoists un-chained scans):

  teacher_fwd   2 global views through ViT-S/8 depth-12 + DINOHead
  student_fwd   2 global + 8 local views + head
  fwd_loss      both forwards + the DINO loss
  grads         value_and_grad (adds the backward)
  full          the production step (grads + clip + Adam + EMA + center)

and prints per-stage img/s plus the analytic bf16 MXU floor for the crop
mix, so the gap between measured and floor is attributable stage by stage.

Usage:  python tools/pretrain_ablation.py [--batch 16] [--iters 6]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def flops_vit_forward(n_tokens: int, d: int = 384, depth: int = 12,
                      mlp_ratio: int = 4) -> float:
    """MXU FLOPs for one image's ViT forward (matmuls only)."""
    per_block = 24 * n_tokens * d * d + 4 * n_tokens * n_tokens * d
    patchify = 2 * n_tokens * (8 * 8 * 3) * d
    return depth * per_block + patchify


def flops_dino_head(n_samples: int, d: int = 384, hidden: int = 2048,
                    bottleneck: int = 256, out: int = 65536) -> float:
    per = 2 * (d * hidden + hidden * hidden + hidden * bottleneck
               + bottleneck * out)
    return n_samples * per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--peak_tflops", type=float, default=197.0,
                    help="bf16 MXU peak of the chip (v5e: 197)")
    ap.add_argument("--accum", type=int, default=1,
                    help="gradient-accumulation microbatches for the full "
                         "step (measures the scan's overhead vs accum=1)")
    ap.add_argument("--full_only", action="store_true",
                    help="skip the stage ablation; time only the "
                         "production step (for accum/batch sweeps)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dino_tpu.models.vit import ViTConfig
    from dino_tpu.train.dino_pretrain import (DinoConfig, dino_loss,
                                              init_dino_opt_state,
                                              init_dino_params,
                                              make_dino_train_step, _forward)

    vit_cfg = ViTConfig(patch_size=8)
    dino_cfg = DinoConfig()
    b = args.batch
    student, teacher = init_dino_params(jax.random.PRNGKey(0), vit_cfg,
                                        dino_cfg)
    center = jnp.zeros((1, dino_cfg.out_dim), jnp.float32)
    import optax
    opt = optax.adamw(1e-4)
    opt_state = init_dino_opt_state(opt, student)

    rs = np.random.RandomState(0)
    g_crops = jnp.asarray(rs.randn(2, b, 224, 224, 3).astype(np.float32))
    l_crops = jnp.asarray(rs.randn(8, b, 96, 96, 3).astype(np.float32))
    dtype = jnp.bfloat16
    n_crops = 2 + dino_cfg.n_local_crops
    static_meta = {"norm_last_layer": True, "nlayers": 3}

    def join(p):
        head = dict(p["head"])
        head["_meta"] = static_meta
        return {"vit": p["vit"], "head": head}

    def split(p):
        head = dict(p["head"])
        head.pop("_meta", None)
        return {"vit": p["vit"], "head": head}

    s_p, t_p = split(student), split(teacher)

    def teacher_fwd(params, g):
        return _forward(join(params), [g[0], g[1]], vit_cfg, dtype)

    def student_fwd(params, g, l):
        crops = [g[0], g[1]] + [l[i] for i in range(8)]
        return _forward(join(params), crops, vit_cfg, dtype)

    def fwd_loss(sp, tp, c, g, l, tt):
        s_out = student_fwd(sp, g, l)
        t_out = jax.lax.stop_gradient(teacher_fwd(tp, g))
        return dino_loss(s_out, t_out, c, dino_cfg.student_temp, tt, n_crops)

    tt = jnp.float32(0.04)

    # chained variants: each iteration's input depends on the previous
    # iteration's scalar output, so XLA cannot hoist or parallelize them
    def chain(fn, n):
        @jax.jit
        def run(*inputs):
            def body(carry, _):
                out = fn(carry, *inputs)
                return out, ()
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return out
        return run

    stages = {}
    if not args.full_only:
        stages["teacher_fwd"] = chain(
            lambda c, g: jnp.sum(teacher_fwd(
                t_p, g.at[0, 0, 0, 0, 0].add(c * 1e-12))).astype(jnp.float32),
            args.iters)
        stages["student_fwd"] = chain(
            lambda c, g, l: jnp.sum(student_fwd(
                s_p, g.at[0, 0, 0, 0, 0].add(c * 1e-12), l)
                ).astype(jnp.float32),
            args.iters)
        stages["fwd_loss"] = chain(
            lambda c, g, l: fwd_loss(
                s_p, t_p, center, g.at[0, 0, 0, 0, 0].add(c * 1e-12), l, tt),
            args.iters)

        def _grads_stage(c, g, l):
            loss, grads = jax.value_and_grad(fwd_loss)(
                s_p, t_p, center, g.at[0, 0, 0, 0, 0].add(c * 1e-12), l, tt)
            # consume every grad leaf so XLA cannot DCE the backward pass
            gsum = sum(jnp.sum(x).astype(jnp.float32)
                       for x in jax.tree.leaves(grads))
            return loss + gsum * 1e-30

        stages["grads"] = chain(_grads_stage, args.iters)

    step = make_dino_train_step(vit_cfg, dino_cfg, opt, compute_dtype=dtype,
                                accum_steps=args.accum)

    results = {}
    for name, fn in stages.items():
        inputs = ((g_crops,) if name == "teacher_fwd" else (g_crops, l_crops))
        np.asarray(fn(*inputs))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(fn(*inputs))
        dt = (time.perf_counter() - t0) / args.iters
        results[name] = dt
        print(f"{name:>12}: {dt * 1000:8.2f} ms/step  "
              f"({b / dt:7.1f} img/s)", flush=True)

    # full production step chains naturally through the params
    st, te, ce, os_ = student, teacher, center, opt_state
    out = step(st, te, ce, os_, g_crops, l_crops, tt, jnp.float32(0.996),
               jnp.float32(0.0))
    np.asarray(out[4])  # compile + warm
    t0 = time.perf_counter()
    st, te, ce, os_ = student, teacher, center, opt_state
    for _ in range(args.iters):
        st, te, ce, os_, loss = step(st, te, ce, os_, g_crops, l_crops, tt,
                                     jnp.float32(0.996), jnp.float32(0.0))
    np.asarray(loss)
    dt = (time.perf_counter() - t0) / args.iters
    results["full"] = dt
    print(f"{'full':>12}: {dt * 1000:8.2f} ms/step  ({b / dt:7.1f} img/s)",
          flush=True)

    # analytic bf16 MXU floor for this crop mix
    n_g = (224 // 8) ** 2 + 1
    n_l = (96 // 8) ** 2 + 1
    f_teacher = 2 * b * flops_vit_forward(n_g) + flops_dino_head(2 * b)
    f_student = (2 * b * flops_vit_forward(n_g)
                 + 8 * b * flops_vit_forward(n_l)
                 + flops_dino_head(10 * b))
    f_bwd = 2 * f_student
    total = f_teacher + f_student + f_bwd
    peak = args.peak_tflops * 1e12
    print(f"\nFLOPs/step: teacher {f_teacher/1e9:.1f}G  student "
          f"{f_student/1e9:.1f}G  bwd ~{f_bwd/1e9:.1f}G  total "
          f"{total/1e9:.1f}G")
    floor = total / peak
    print(f"MXU floor @100%: {floor*1000:.2f} ms/step ({b/floor:.0f} img/s); "
          f"measured full = {results['full']*1000:.2f} ms "
          f"({100 * floor / results['full']:.0f}% of peak)")
    print(json.dumps({k: round(v * 1000, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
