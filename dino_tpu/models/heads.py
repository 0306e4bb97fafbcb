"""Per-patch segmentation heads (MLP / Linear), functional.

Spec: dt_segmentation/src/pl_torch_modules.py:108-138 — the head is a pure
per-patch map applied after folding all patches onto the batch axis, ending in
log_softmax.  Init matches torch.nn.Linear defaults (kaiming-uniform a=sqrt(5)
=> U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _torch_linear_init(key, fan_in: int, fan_out: int) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "kernel": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound),
    }


def init_mlp_head(key, n_classes: int, input_dim: int = 384) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "layer_1": _torch_linear_init(k1, input_dim, 200),
        "layer_2": _torch_linear_init(k2, 200, 100),
        "layer_3": _torch_linear_init(k3, 100, n_classes),
    }


def init_linear_head(key, n_classes: int, input_dim: int = 384) -> Params:
    return {"layer_1": _torch_linear_init(key, input_dim, n_classes)}


def _affine(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.dot(x, p["kernel"].astype(x.dtype), preferred_element_type=jnp.float32)
    return y + p["bias"].astype(jnp.float32)


def mlp_head_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """(M, input_dim) -> (M, n_classes) log-probabilities."""
    x = jax.nn.relu(_affine(p["layer_1"], x).astype(x.dtype))
    x = jax.nn.relu(_affine(p["layer_2"], x).astype(x.dtype))
    x = _affine(p["layer_3"], x)
    return jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)


def linear_head_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    x = _affine(p["layer_1"], x)
    return jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)


# ---------------------------------------------------------------------------
# Mixture-of-experts head (expert parallelism) — a parity-plus capability.
# The reference's heads are single MLPs (pl_torch_modules.py:108-138); this
# keeps their per-patch map + log_softmax contract but routes each patch to
# one of E expert MLPs (Switch-style top-1 routing, gate-prob scaling, and
# the load-balance auxiliary).  The expert axis shards over the mesh 'model'
# axis (parallel/mesh.py:head_param_spec), so each device holds and computes
# only its own experts and GSPMD inserts the combine all-reduce: EP over ICI.
# ---------------------------------------------------------------------------

def init_moe_head(key, n_classes: int, input_dim: int = 384,
                  n_experts: int = 4) -> Params:
    kr, k1, k2, k3 = jax.random.split(key, 4)

    def stacked(kk, fan_in, fan_out):
        ps = [_torch_linear_init(k, fan_in, fan_out)
              for k in jax.random.split(kk, n_experts)]
        return {"kernel": jnp.stack([p["kernel"] for p in ps]),
                "bias": jnp.stack([p["bias"] for p in ps])}

    return {
        # router init: small normal so early routing is near-uniform
        "router": {"kernel": jax.random.normal(
            kr, (input_dim, n_experts), jnp.float32) * 0.02,
            "bias": jnp.zeros((n_experts,), jnp.float32)},
        "layer_1": stacked(k1, input_dim, 200),
        "layer_2": stacked(k2, 200, 100),
        "layer_3": stacked(k3, 100, n_classes),
    }


def moe_gate(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """(M, D) -> (M, E) router probabilities (f32)."""
    r = p["router"]
    logits = jnp.dot(x.astype(jnp.float32), r["kernel"]) + r["bias"]
    return jax.nn.softmax(logits, axis=-1)


def moe_balance_loss(p: Params, x: jnp.ndarray,
                     weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Switch-transformer load-balance auxiliary: E * sum_e f_e * P_e, where
    f_e is the fraction of patches routed to expert e and P_e the mean gate
    probability.  Minimized (=1) at uniform routing.

    ``weights`` (M,) excludes padded patches (ragged-tail batches) from the
    routing statistics, matching the nll/CM masking semantics.
    """
    gate = moe_gate(p, x)
    n_experts = gate.shape[-1]
    one_hot = jax.nn.one_hot(jnp.argmax(gate, axis=-1), n_experts,
                             dtype=jnp.float32)
    if weights is None:
        f = jnp.mean(one_hot, axis=0)
        pbar = jnp.mean(gate, axis=0)
    else:
        w = weights.astype(jnp.float32)[:, None]
        denom = jnp.maximum(jnp.sum(w), 1.0)
        f = jnp.sum(one_hot * w, axis=0) / denom
        pbar = jnp.sum(gate * w, axis=0) / denom
    # f is argmax-derived (piecewise constant): the gradient flows via pbar
    return n_experts * jnp.sum(f * pbar)


def moe_balance_stats(p: Params, x: jnp.ndarray,
                      weights: Optional[jnp.ndarray] = None):
    """The sufficient statistics behind :func:`moe_balance_loss`:
    (sum of routed one-hots * w, sum of gate probs * w, sum of w) — 2E+1
    floats per shard/microbatch.  They aggregate EXACTLY: add across
    gradient-accumulation microbatches, psum across token shards — which is
    what lets the balance term compose with accum/SP/PP instead of needing
    'the gathered features' (the loss is E * <a/W, b/W> of the aggregated
    sums; its gradient flows only through b, the gate-prob sums).
    """
    gate = moe_gate(p, x)
    n_experts = gate.shape[-1]
    one_hot = jax.nn.one_hot(jnp.argmax(gate, axis=-1), n_experts,
                             dtype=jnp.float32)
    if weights is None:
        return (jnp.sum(one_hot, axis=0), jnp.sum(gate, axis=0),
                jnp.float32(x.shape[0]))
    w = weights.astype(jnp.float32)[:, None]
    return (jnp.sum(one_hot * w, axis=0), jnp.sum(gate * w, axis=0),
            jnp.sum(w))


def moe_head_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """(M, input_dim) -> (M, n_classes) log-probs via top-1 expert routing.

    Dense-over-experts formulation: every expert computes every patch and a
    one-hot dispatch picks the routed result.  Per device that is E_local
    tiny matmuls (the head is ~100k params), and under the EP sharding each
    device only computes its local experts — the one-hot contraction over
    the expert axis becomes the combine all-reduce.  Gradients reach the
    router through the top-1 gate-prob scaling (Switch semantics).
    """
    gate = moe_gate(p, x)                                     # (M, E) f32
    best = jnp.argmax(gate, axis=-1)
    top_w = jnp.take_along_axis(gate, best[:, None], axis=1)  # (M, 1)
    dispatch = jax.nn.one_hot(best, gate.shape[-1], dtype=jnp.float32)

    def expert_affine(layer, h):                              # (E, M, i)->(E, M, o)
        y = jnp.einsum("emi,eio->emo", h,
                       layer["kernel"].astype(h.dtype),
                       preferred_element_type=jnp.float32)
        return y + layer["bias"][:, None, :].astype(jnp.float32)

    h = jnp.broadcast_to(x, (gate.shape[-1],) + x.shape)      # (E, M, D)
    h = jax.nn.relu(expert_affine(p["layer_1"], h).astype(x.dtype))
    h = jax.nn.relu(expert_affine(p["layer_2"], h).astype(x.dtype))
    y = expert_affine(p["layer_3"], h)                        # (E, M, C) f32
    out = jnp.einsum("me,emc->mc", dispatch, y)               # combine
    out = out * top_w                                         # gate-prob scale
    return jax.nn.log_softmax(out, axis=-1)


def moe_head_apply_sparse(p: Params, x: jnp.ndarray,
                          capacity_factor: float = 1.25) -> jnp.ndarray:
    """(M, input_dim) -> (M, n_classes) log-probs via capacity-bounded top-1
    dispatch — the large-scale EP formulation.

    Where the dense form computes every expert on every patch (E*M rows of
    MLP work), this one gathers each expert's routed patches into a static
    (E, C, D) buffer with C = ceil(capacity_factor * M / E) and computes only
    ~capacity_factor * M rows, then scatter-adds results back.  Under the EP
    sharding (expert axis on mesh 'model') each device gathers/computes only
    its local experts' (C, D) slabs and the scatter's partial sums combine
    with the all-reduce GSPMD inserts — the Switch-transformer dataflow.

    Capacity semantics (Switch): tokens claim expert slots in batch order;
    a patch that overflows its expert's capacity is DROPPED — its logits are
    zero, i.e. it predicts the uniform distribution.  With
    ``capacity_factor >= E`` nothing can drop and the output equals
    ``moe_head_apply`` exactly (equality-tested).  The router balance loss
    (``moe_balance_loss``) is what keeps expert loads near-uniform so the
    default 1.25 drops ~nothing once trained.
    """
    gate = moe_gate(p, x)                                     # (M, E) f32
    m, n_experts = gate.shape
    capacity = max(1, int(math.ceil(capacity_factor * m / n_experts)))
    best = jnp.argmax(gate, axis=-1)                          # (M,)
    top_w = jnp.take_along_axis(gate, best[:, None], axis=1)  # (M, 1)

    # slot: this patch's arrival position within its expert's queue
    one_hot = jax.nn.one_hot(best, n_experts, dtype=jnp.int32)
    slot = jnp.cumsum(one_hot, axis=0) - 1                    # (M, E)
    slot = jnp.take_along_axis(slot, best[:, None], axis=1)[:, 0]
    # (E, C) table of patch ids; sentinel M = empty/overflowed slot
    idx = jnp.full((n_experts, capacity), m, jnp.int32)
    idx = idx.at[best, slot].set(jnp.arange(m, dtype=jnp.int32), mode="drop")

    x_pad = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)])
    h = x_pad[idx]                                            # (E, C, D)

    def expert_affine(layer, h):
        y = jnp.einsum("eci,eio->eco", h,
                       layer["kernel"].astype(h.dtype),
                       preferred_element_type=jnp.float32)
        return y + layer["bias"][:, None, :].astype(jnp.float32)

    h = jax.nn.relu(expert_affine(p["layer_1"], h).astype(x.dtype))
    h = jax.nn.relu(expert_affine(p["layer_2"], h).astype(x.dtype))
    y = expert_affine(p["layer_3"], h)                        # (E, C, Cl) f32

    out = jnp.zeros((m + 1, y.shape[-1]), jnp.float32).at[idx].add(y)
    out = out[:m] * top_w            # dropped patches stay 0 -> uniform
    return jax.nn.log_softmax(out, axis=-1)


def head_apply(head_type: str, p: Params, x: jnp.ndarray,
               moe_dispatch: str = "dense",
               moe_capacity: float = 1.25) -> jnp.ndarray:
    if head_type == "mlp":
        return mlp_head_apply(p, x)
    if head_type == "linear":
        return linear_head_apply(p, x)
    if head_type == "moe":
        if moe_dispatch == "sparse":
            return moe_head_apply_sparse(p, x, capacity_factor=moe_capacity)
        if moe_dispatch != "dense":
            raise ValueError(f"unknown moe_dispatch {moe_dispatch!r}")
        return moe_head_apply(p, x)
    raise ValueError(f"unknown head {head_type!r}")


def init_head(key, head_type: str, n_classes: int, input_dim: int = 384,
              n_experts: int = 4) -> Params:
    if head_type == "mlp":
        return init_mlp_head(key, n_classes, input_dim)
    if head_type == "linear":
        return init_linear_head(key, n_classes, input_dim)
    if head_type == "moe":
        return init_moe_head(key, n_classes, input_dim, n_experts)
    raise ValueError(f"unknown head {head_type!r}")
