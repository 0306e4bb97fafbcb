#!/usr/bin/env python
"""On-chip dense-vs-sparse MoE dispatch timings (round-4 verdict item).

The Switch-style MoE head has two dispatch forms (models/heads.py):
``dense`` runs every expert over every token and masks by the gate
(E x M expert rows of work), ``sparse`` gathers each expert's routed
tokens into a capacity-bounded buffer, runs each expert once over its
buffer, and scatters back (~M + E*cap rows).  Asymptotically sparse wins
once E is large; this script measures WHERE on a real chip, at the
framework's production token shape (480px -> 3600 patches/image).

Timing discipline: bench.py's scan-chain-with-data-dependency pattern
(async dispatch / RPC tunnels cannot skip chained work), and the train
legs consume every gradient leaf so XLA cannot DCE the backward.

Run (on the TPU): python tools/bench_moe.py
"""
import json
import time

import numpy as np


def _timed(fn, args, iters=3):
    """Median-of-iters wall time of one jitted call (compile excluded)."""
    np.asarray(fn(*args))  # compile + warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    from dino_tpu.models.heads import (head_apply, init_head,
                                       moe_balance_loss)

    batch, n_pat, d, n_classes = 8, 3600, 384, 7  # 480px token shape
    m_tokens = batch * n_pat
    chain = 20
    rs = np.random.RandomState(0)
    x = jax.device_put(rs.randn(m_tokens, d).astype(np.float32))
    y = jax.device_put(rs.randint(0, n_classes, (m_tokens,)).astype(
        np.int32))

    def make_fwd(dispatch, capacity):
        def one(p, x):
            return head_apply("moe", p, x, moe_dispatch=dispatch,
                              moe_capacity=capacity)

        @jax.jit
        def run(p, x):
            def body(carry, _):
                logp = one(p, x.at[0, 0].add(carry * 1e-30))
                return jnp.sum(logp[0]) * 1e-30, ()
            carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=chain)
            return carry
        return run

    def make_train(dispatch, capacity):
        def loss_fn(p, x):
            logp = head_apply("moe", p, x, moe_dispatch=dispatch,
                              moe_capacity=capacity)
            picked = jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
            return -jnp.mean(picked) + 0.01 * moe_balance_loss(p, x)

        @jax.jit
        def run(p, x):
            def body(carry, _):
                loss, g = jax.value_and_grad(loss_fn)(
                    p, x.at[0, 0].add(carry * 1e-30))
                # consume EVERY grad leaf or XLA DCEs the backward
                gsum = sum(jnp.sum(l) for l in jax.tree.leaves(g)
                           if jnp.issubdtype(l.dtype, jnp.floating))
                return loss * 1e-30 + gsum * 1e-30, ()
            carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=chain)
            return carry
        return run

    for n_experts in (4, 16, 64):
        p = jax.device_put(init_head(jax.random.PRNGKey(1), "moe", n_classes,
                                     d, n_experts=n_experts))
        cap = 1.25
        for leg, mk in (("fwd", make_fwd), ("train", make_train)):
            t_dense = _timed(mk("dense", cap), (p, x)) / chain
            t_sparse = _timed(mk("sparse", cap), (p, x)) / chain
            print(json.dumps({
                "leg": leg, "experts": n_experts, "tokens": m_tokens,
                "capacity": cap,
                "dense_ms": round(t_dense * 1e3, 3),
                "sparse_ms": round(t_sparse * 1e3, 3),
                "sparse_speedup": round(t_dense / t_sparse, 2)}))


if __name__ == "__main__":
    main()
