"""Sequence-parallel ViT with ring attention over an ICI mesh axis.

The reference handles its longest sequence (960px -> N=14,401 tokens) with
vanilla quadratic attention on one device (vision_transformer.py:85;
README.md:35 warns about memory).  On one chip our Pallas flash kernel already
makes that memory-linear; this module is the multi-chip extension (SURVEY §5
"long-context" row): tokens shard across a mesh axis, every block's attention
runs as a ring — each device holds its Q shard and passes K/V shards around
the ring with ``jax.lax.ppermute`` (one hop per step, riding ICI), maintaining
online-softmax state so the full (N, N) matrix never exists anywhere.

Training runs THROUGH the ring: ``ring_attention`` carries a custom VJP whose
backward is a second ring pass — given the globally-merged row log-sum-exp and
D = rowsum(dO ∘ O), each hop's contribution to dQ/dK/dV is independent (the
same partition argument as the single-chip resident-split backward,
ops/attention.py:_flash_bwd_rule), so dK/dV accumulators simply travel around
the ring with their K/V shards and arrive home after d hops.  Each hop reuses
the Pallas flash kernels (forward AND backward, dynamic valid-key bound) on
TPU, XLA einsum math elsewhere.  ``make_sp_train_step`` builds a full
unfrozen finetune step on top (loss + grads computed shard-local inside one
``shard_map``, aggregated with one psum).
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from dino_tpu.models.vit import (ViTConfig, layer_norm, dense, prepare_tokens)

Params = Dict[str, Any]

_NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Forward rings (return the merged log-sum-exp for the backward)
# ---------------------------------------------------------------------------

def _ring_fwd_xla(q, k, v, scale: float, n_real: int, axis_name: str):
    """Online-softmax attention over ring-rotated K/V shards (XLA math).

    q/k/v: (B, nh, N_local, hd) per device; global key positions >= n_real
    are masked.  Returns (out (B,nh,N_local,hd), lse (B,nh,N_local,1) f32).
    """
    d = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    n_local = q.shape[2]
    perm = [(i, (i + 1) % d) for i in range(d)]

    def body(carry, step):
        m, l, acc, k_cur, v_cur = carry
        src = (my - step) % d  # which shard's K/V we currently hold
        col = src * n_local + jnp.arange(n_local)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_cur,
                       preferred_element_type=jnp.float32) * scale
        s = jnp.where(col[None, None, None, :] < n_real, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v_cur.dtype), v_cur,
            preferred_element_type=jnp.float32)
        # rotate K/V one hop around the ring (overlaps with the next matmul)
        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        return (m_new, l_new, acc_new, k_next, v_next), None

    b, nh, _, hd = q.shape
    init = (jnp.full((b, nh, n_local, 1), _NEG_INF, jnp.float32),
            jnp.zeros((b, nh, n_local, 1), jnp.float32),
            jnp.zeros((b, nh, n_local, hd), jnp.float32), k, v)
    (m, l, acc, _, _), _ = jax.lax.scan(body, init, jnp.arange(d))
    l = jnp.maximum(l, 1e-30)
    return (acc / l).astype(q.dtype), m + jnp.log(l)


def _ring_fwd_flash(q, k, v, scale: float, n_real: int, axis_name: str,
                    interpret: bool = False):
    """Ring attention with the Pallas flash kernel per hop.

    Each hop runs the resident flash kernel on the local Q shard against the
    currently-held K/V shard (dynamic valid-key bound — the global padding
    lives in whichever shard is in hand), returning a normalized partial and
    its row log-sum-exp; partials merge online across hops exactly like the
    single-chip resident-split path.  Shard-local memory never holds an
    (N_local, N_local) score matrix, and each hop's QK^T runs at the flash
    kernel's MXU/VPU overlap instead of an XLA einsum+softmax.
    """
    from dino_tpu.ops.attention import flash_attention_with_lse_dyn

    d = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    n_local = q.shape[2]
    perm = [(i, (i + 1) % d) for i in range(d)]
    b, nh, _, hd = q.shape

    def body(carry, step):
        m, l, acc, k_cur, v_cur = carry
        src = (my - step) % d                    # whose K/V we hold
        valid = jnp.clip(n_real - src * n_local, 0, n_local)
        o_h, lse_h = flash_attention_with_lse_dyn(q, k_cur, v_cur, scale,
                                                  valid, interpret=interpret)
        lse_h = lse_h[:, :n_local, :].reshape(b, nh, n_local, 1)
        # online merge of normalized partials keyed by their lse
        m_new = jnp.maximum(m, lse_h)
        r_old = jnp.exp(m - m_new)
        r_new = jnp.exp(lse_h - m_new)
        acc = acc * r_old + o_h.astype(jnp.float32) * r_new
        l = l * r_old + r_new
        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        return (m_new, l, acc, k_next, v_next), None

    init = (jnp.full((b, nh, n_local, 1), _NEG_INF, jnp.float32),
            jnp.zeros((b, nh, n_local, 1), jnp.float32),
            jnp.zeros((b, nh, n_local, hd), jnp.float32), k, v)
    (m, l, acc, _, _), _ = jax.lax.scan(body, init, jnp.arange(d))
    l = jnp.maximum(l, 1e-30)
    return (acc / l).astype(q.dtype), m + jnp.log(l)


# ---------------------------------------------------------------------------
# Differentiable ring attention (custom VJP: backward is a second ring)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def ring_attention(q, k, v, scale: float, n_real: int, axis_name: str,
                   impl: str = "xla", interpret: bool = False):
    """Ring attention over shard-local (B, nh, N_local, hd) q/k/v.

    ``impl``: 'flash' (Pallas kernels per hop; ``interpret`` for off-TPU
    testing) or 'xla'.  Must be called inside ``shard_map`` with the token
    shards laid out contiguously along ``axis_name``.  Differentiable.
    """
    out, _ = (_ring_fwd_flash(q, k, v, scale, n_real, axis_name, interpret)
              if impl == "flash"
              else _ring_fwd_xla(q, k, v, scale, n_real, axis_name))
    return out


def _ring_attention_fwd(q, k, v, scale, n_real, axis_name, impl, interpret):
    out, lse = (_ring_fwd_flash(q, k, v, scale, n_real, axis_name, interpret)
                if impl == "flash"
                else _ring_fwd_xla(q, k, v, scale, n_real, axis_name))
    return out, (q, k, v, out, lse)


def _ring_attention_bwd(scale, n_real, axis_name, impl, interpret, res, g):
    """Reverse ring: dK/dV accumulators travel with their K/V shards.

    With the global lse and D = rowsum(dO ∘ O) in hand, P's columns
    partition exactly across shards (P = exp(S·scale − lse) needs no
    per-hop renormalization), so each hop computes an independent
    contribution: dQ += dS·K (sums locally), dK/dV accumulate into buffers
    that rotate alongside K/V and are home after d hops.
    """
    q, k, v, out, lse = res
    d = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    n_local = q.shape[2]
    perm = [(i, (i + 1) % d) for i in range(d)]
    gf = g.astype(jnp.float32)
    dsum = jnp.sum(gf * out.astype(jnp.float32), axis=-1, keepdims=True)

    def body(carry, step):
        dq, k_cur, v_cur, dk_cur, dv_cur = carry
        src = (my - step) % d
        if impl == "flash":
            from dino_tpu.ops.attention import flash_attention_bwd_dyn
            valid = jnp.clip(n_real - src * n_local, 0, n_local)
            dq_h, dk_h, dv_h = flash_attention_bwd_dyn(
                q, g, lse, dsum, k_cur, v_cur, scale, valid,
                interpret=interpret)
        else:
            col = src * n_local + jnp.arange(n_local)
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k_cur,
                           preferred_element_type=jnp.float32) * scale
            p = jnp.exp(s - lse)
            p = jnp.where(col[None, None, None, :] < n_real, p, 0.0)
            dv_h = jnp.einsum("bhqk,bhqd->bhkd", p, gf,
                              preferred_element_type=jnp.float32)
            dp = jnp.einsum("bhqd,bhkd->bhqk", gf, v_cur.astype(jnp.float32),
                            preferred_element_type=jnp.float32)
            ds = p * (dp - dsum) * scale
            dq_h = jnp.einsum("bhqk,bhkd->bhqd", ds, k_cur.astype(jnp.float32),
                              preferred_element_type=jnp.float32)
            dk_h = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32),
                              preferred_element_type=jnp.float32)
        dq = dq + dq_h
        dk_cur = dk_cur + dk_h
        dv_cur = dv_cur + dv_h
        # rotate the shard AND its gradient accumulators one hop; after d
        # hops every dK/dV buffer is back on its owner with all terms
        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        dk_next = jax.lax.ppermute(dk_cur, axis_name, perm)
        dv_next = jax.lax.ppermute(dv_cur, axis_name, perm)
        return (dq, k_next, v_next, dk_next, dv_next), None

    zero = jnp.zeros(q.shape, jnp.float32)
    init = (zero, k, v, jnp.zeros(k.shape, jnp.float32),
            jnp.zeros(v.shape, jnp.float32))
    (dq, _, _, dk, dv), _ = jax.lax.scan(body, init, jnp.arange(d))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


ring_attention.defvjp(_ring_attention_fwd, _ring_attention_bwd)


def ring_self_attention(q, k, v, scale: float, n_real: int, axis_name: str):
    """XLA-math ring attention (kept as the documented non-kernel surface)."""
    return ring_attention(q, k, v, scale, n_real, axis_name, "xla")


def ring_self_attention_flash(q, k, v, scale: float, n_real: int,
                              axis_name: str, interpret: bool = False):
    """Pallas-kernel-per-hop ring attention."""
    return ring_attention(q, k, v, scale, n_real, axis_name, "flash",
                          interpret)


# ---------------------------------------------------------------------------
# Sequence-parallel ViT blocks / forward
# ---------------------------------------------------------------------------

def _block_seq_parallel(p: Params, tokens, cfg: ViTConfig, n_real: int,
                        axis_name: str, flash: str = "auto"):
    """One transformer block on a token shard; only attention communicates."""
    h = layer_norm(p["norm1"], tokens, cfg.ln_eps)
    b, n_local, c = h.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    qkv = dense(p["attn"]["qkv"], h).reshape(b, n_local, 3, nh, hd)
    qkv = qkv.transpose(2, 0, 3, 1, 4)
    use_flash = (flash == "force" or
                 (flash == "auto" and jax.default_backend() == "tpu"))
    out = ring_attention(qkv[0], qkv[1], qkv[2], cfg.scale, n_real, axis_name,
                         "flash" if use_flash else "xla",
                         jax.default_backend() != "tpu")
    out = out.transpose(0, 2, 1, 3).reshape(b, n_local, c)
    tokens = tokens + dense(p["attn"]["proj"], out)
    h = layer_norm(p["norm2"], tokens, cfg.ln_eps)
    h = dense(p["mlp"]["fc1"], h)
    h = jax.nn.gelu(h, approximate=False)
    h = dense(p["mlp"]["fc2"], h)
    return tokens + h


def vit_forward_seq_parallel(params: Params, x, cfg: ViTConfig, mesh: Mesh,
                             seq_axis: str = "data",
                             flash: str = "auto") -> jnp.ndarray:
    """Full ViT forward with the token axis sharded over ``seq_axis``.

    x: (B, H, W, 3) normalized image (replicated).  Returns the normed tokens
    (B, N+1, D), gathered.  Numerically matches vit_forward up to reduction
    order.  ``flash``: 'auto' (Pallas kernel per hop on TPU, XLA elsewhere),
    'force' (kernel everywhere, interpret mode off-TPU), or 'off'.
    """
    d = mesh.shape[seq_axis]
    tokens = prepare_tokens(params, x, cfg)   # (B, N+1, D), replicated
    n_real = tokens.shape[1]
    pad = (-n_real) % d
    if pad:
        tokens = jnp.pad(tokens, ((0, 0), (0, pad), (0, 0)))

    param_specs = jax.tree.map(lambda _: P(), params["blocks"])
    norm_specs = jax.tree.map(lambda _: P(), params["norm"])

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, seq_axis, None), param_specs, norm_specs),
        out_specs=P(None, seq_axis, None), check_vma=False)
    def run(tok_shard, blocks, norm):
        for blk in blocks:
            tok_shard = _block_seq_parallel(blk, tok_shard, cfg, n_real,
                                            seq_axis, flash=flash)
        return layer_norm(norm, tok_shard, cfg.ln_eps)

    out = run(tokens, params["blocks"], params["norm"])
    return out[:, :n_real, :]


# ---------------------------------------------------------------------------
# SP x TP composition: ring attention over seq_axis, Megatron-sharded block
# params over tp_axis (docs/SCALING.md composition table)
# ---------------------------------------------------------------------------

# Megatron block packing/specs/math shared with the PPxTP stages — ONE
# implementation of the numerics-critical TP dataflow (parallel/tp.py)
from dino_tpu.parallel.tp import (tp_pack_block as _tp_pack_block,  # noqa: E402,F401 (re-export: pipeline.py and tests import from here)
                                  tp_block_spec as _tp_block_spec,
                                  tp_block_apply)


def _block_sp_tp(p: Params, tokens, cfg: ViTConfig, n_real: int,
                 seq_axis: str, tp_axis: str, flash: str):
    """One block on a token shard with head/hidden dims split over tp_axis:
    the shared Megatron math (tp.py) with attention ringing over
    ``seq_axis`` per local head group — the 2-D (sequence x tensor)
    attention decomposition."""
    use_flash = (flash == "force" or
                 (flash == "auto" and jax.default_backend() == "tpu"))
    return tp_block_apply(
        p, tokens, cfg, tp_axis,
        lambda q, k, v: ring_attention(q, k, v, cfg.scale, n_real, seq_axis,
                                       "flash" if use_flash else "xla",
                                       jax.default_backend() != "tpu"))


def vit_forward_sp_tp(params: Params, x, cfg: ViTConfig, mesh: Mesh,
                      seq_axis: str = "data", tp_axis: str = "model",
                      flash: str = "auto") -> jnp.ndarray:
    """ViT forward with tokens sharded over ``seq_axis`` AND block weights
    Megatron-sharded over ``tp_axis`` — the SP x TP composition on a 2-D
    mesh.  Returns the normed tokens (B, N+1, D), gathered; matches
    vit_forward to reduction order."""
    d = mesh.shape[seq_axis]
    t = mesh.shape[tp_axis]
    if cfg.num_heads % t or cfg.mlp_hidden % t:
        raise ValueError(f"tensor-parallel degree {t} must divide both "
                         f"num_heads ({cfg.num_heads}) and mlp_hidden "
                         f"({cfg.mlp_hidden})")
    tokens = prepare_tokens(params, x, cfg)
    n_real = tokens.shape[1]
    pad = (-n_real) % d
    if pad:
        tokens = jnp.pad(tokens, ((0, 0), (0, pad), (0, 0)))

    packed = [_tp_pack_block(blk, cfg) for blk in params["blocks"]]
    block_specs = [_tp_block_spec(tp_axis) for _ in packed]
    norm_specs = jax.tree.map(lambda _: P(), params["norm"])

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, seq_axis, None), block_specs, norm_specs),
        out_specs=P(None, seq_axis, None), check_vma=False)
    def run(tok_shard, blocks, norm):
        for blk in blocks:
            tok_shard = _block_sp_tp(blk, tok_shard, cfg, n_real,
                                     seq_axis, tp_axis, flash)
        return layer_norm(norm, tok_shard, cfg.ln_eps)

    out = run(tokens, packed, params["norm"])
    return out[:, :n_real, :]


def make_sp_tp_train_step(cfg: ViTConfig, head_type: str, n_classes: int,
                          optimizer, mesh: Mesh, seq_axis: str = "data",
                          tp_axis: str = "model", flash: str = "auto",
                          compute_dtype=None, donate: bool = False):
    """2-D (sequence x tensor) parallel train step on the composition mesh.

    step(vit_p, head_p, opt_state, images_u8, labels, mask=None) ->
    (vit_p, head_p, opt_state, loss, cm) — make_train_step's contract.
    Params stay in the STANDARD layout: the head-aligned TP packing happens
    inside the traced step (_tp_pack_block is pure reshapes/transposes),
    and shard_map's autodiff transposes both the packing and the
    collectives (ring ppermute custom-VJP over ``seq_axis``, Megatron psums
    over ``tp_axis``), so gradients come back in standard layout and the
    optimizer state matches make_train_step's (grad equality vs the
    replicated step is tested leaf-by-leaf on the (data=4, model=2) mesh).
    """
    from dino_tpu.parallel.tp import make_composed_train_step
    return make_composed_train_step(
        lambda vit_p, x: vit_forward_sp_tp(vit_p, x, cfg, mesh, seq_axis,
                                           tp_axis, flash),
        "SPxTP", head_type, n_classes, optimizer,
        compute_dtype=compute_dtype, donate=donate)


# ---------------------------------------------------------------------------
# Sequence-parallel training (finetune THROUGH the ring)
# ---------------------------------------------------------------------------

def make_sp_train_step(cfg: ViTConfig, head_type: str, n_classes: int,
                       optimizer, mesh: Mesh, seq_axis: str = "data",
                       flash: str = "auto", compute_dtype=None,
                       donate: bool = False, zero: bool = False,
                       moe_dispatch: str = "dense",
                       moe_capacity: float = 1.25):
    """Unfrozen finetune step with the token axis sharded over ``seq_axis``.

    step(vit_p, head_p, opt_state, images_u8, labels, mask=None) ->
    (vit_p, head_p, opt_state, loss, cm) — the same contract as
    train.loop.make_train_step (masked ragged tails, on-device confusion
    matrix), so DINOSeg.fit can swap it in (``parallelism='sp'``).
    The whole loss decomposes per token (the head is a per-patch map,
    reference pl_torch_modules.py:253), so each device computes its token
    shard's NLL contribution, local grads, and partial confusion matrix
    inside ONE shard_map — ring attention's custom VJP carries cotangents
    across shards — and a single psum over ``seq_axis`` aggregates them.
    Embedding/positional work is computed replicated on every device (~1%
    of FLOPs, same trade as the pipeline module); each device's grads
    cover only its own token terms, so the psum yields exactly the
    replicated step's gradient.  This is what makes multi-chip 960px
    finetuning possible: no device ever holds the full token sequence's
    activations.

    ``zero=True``: ZeRO-1 over the SAME axis the tokens shard on — the
    Adam moments are pinned 1/N-per-device (parallel/mesh.py:
    zero_constrain; params stay replicated, so the pure-DP constraint
    form applies), GSPMD reduce-scatters the psum'd gradient into the
    update and all-gathers the delta.  SP is the high-resolution
    unfrozen-finetune mode, exactly where the 2x-param-size moment
    buffer hurts; numerics unchanged (equality-tested).
    """
    from dino_tpu.models.heads import head_apply
    from dino_tpu.ops.preprocess import normalize_imagenet
    from dino_tpu.train.metrics import confusion_matrix

    if head_type not in ("mlp", "linear", "moe"):
        raise ValueError(f"unknown head for SP training: {head_type!r}")
    if head_type == "moe" and moe_dispatch == "sparse":
        raise ValueError("SP training with moe_dispatch='sparse' changes "
                         "the capacity semantics (slots allocate per token "
                         "shard, not per batch, so different patches drop) "
                         "— use the dense dispatch")
    d = mesh.shape[seq_axis]

    def step(vit_p, head_p, opt_state, images, labels, mask=None):
        x = normalize_imagenet(images)
        if compute_dtype is not None:  # bf16 MXU path, f32 LN/softmax
            x = x.astype(compute_dtype)
        b, hgt, wdt, _ = x.shape
        n_patches = (hgt // cfg.patch_size) * (wdt // cfg.patch_size)
        n_real = n_patches + 1
        n_pad = -(-n_real // d) * d
        n_local = n_pad // d
        # token-aligned labels: position 0 = CLS (dead), then the patches;
        # global pad tokens are dead too — both masked out of the loss
        y_tok = jnp.pad(labels.reshape(b, n_patches).astype(jnp.int32),
                        ((0, 0), (1, n_pad - n_real)))
        pos = jnp.arange(n_pad)
        w_tok = jnp.broadcast_to((pos >= 1) & (pos < n_real), (b, n_pad)
                                 ).astype(jnp.float32)
        if mask is not None:  # padded tail samples drop out entirely
            w_tok = w_tok * mask.astype(jnp.float32)[:, None]
            denom = jnp.maximum(jnp.sum(mask) * n_patches, 1.0)
        else:
            denom = jnp.float32(b * n_patches)

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(), P(None, None, None, None),
                      P(None, seq_axis), P(None, seq_axis), P()),
            out_specs=(P(), P(), P()), check_vma=False)
        def value_and_psum_grads(params, x_rep, y_sh, w_sh, denom):
            my = jax.lax.axis_index(seq_axis)

            def local_loss(ps):
                vit_p, head_p = ps["vit"], ps["head"]
                tokens = prepare_tokens(vit_p, x_rep, cfg)
                tokens = jnp.pad(tokens, ((0, 0), (0, n_pad - n_real),
                                          (0, 0)))
                tok = jax.lax.dynamic_slice_in_dim(tokens, my * n_local,
                                                   n_local, 1)
                for blk in vit_p["blocks"]:
                    tok = _block_seq_parallel(blk, tok, cfg, n_real,
                                              seq_axis, flash=flash)
                tok = layer_norm(vit_p["norm"], tok, cfg.ln_eps)
                feats = tok.reshape(-1, tok.shape[-1])
                logp = head_apply(head_type, head_p, feats,
                                  moe_dispatch=moe_dispatch,
                                  moe_capacity=moe_capacity)
                picked = jnp.take_along_axis(
                    logp, y_sh.reshape(-1)[:, None], axis=1)[:, 0]
                loss = -jnp.sum(picked * w_sh.reshape(-1)) / denom
                if head_type == "moe":
                    # Switch balance auxiliary from psum'd E-dim statistics
                    # (2E+1 floats cross the shards, not the features): the
                    # w-weights zero the CLS/pad rows and masked samples,
                    # so f/pbar equal the replicated step's exactly.  Each
                    # device adds balance/d because the caller psums the
                    # loss over the ring; the gradient flows only through
                    # the gate-prob sums (psum transpose = psum), so the
                    # psum'd grads equal the monolithic balance gradient
                    # (equality-tested in tests/test_moe.py).
                    from dino_tpu.models.heads import moe_balance_stats
                    a_l, b_l, w_l = moe_balance_stats(
                        head_p, feats, weights=w_sh.reshape(-1))
                    a_g = jax.lax.psum(a_l, seq_axis)
                    b_g = jax.lax.psum(b_l, seq_axis)
                    w_g = jnp.maximum(jax.lax.psum(w_l, seq_axis), 1.0)
                    balance = a_g.shape[0] * jnp.dot(a_g / w_g, b_g / w_g)
                    loss = loss + 0.01 * balance / d
                return loss, logp

            (loss, logp), grads = jax.value_and_grad(
                local_loss, has_aux=True)(params)
            cm = confusion_matrix(jnp.argmax(logp, axis=-1),
                                  y_sh.reshape(-1), n_classes,
                                  weights=w_sh.reshape(-1))
            loss = jax.lax.psum(loss, seq_axis)
            cm = jax.lax.psum(cm, seq_axis)
            grads = jax.tree.map(lambda t: jax.lax.psum(t, seq_axis), grads)
            return loss, grads, cm

        params = {"vit": vit_p, "head": head_p}
        loss, grads, cm = value_and_psum_grads(params, x, y_tok, w_tok,
                                               denom)
        if zero:
            from dino_tpu.parallel.mesh import zero_constrain
            opt_state = zero_constrain(opt_state, mesh, seq_axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        if zero:
            opt_state = zero_constrain(opt_state, mesh, seq_axis)
        params = optax.apply_updates(params, updates)
        if zero:
            # params stay replicated (the delta all-gathers back): without
            # the pin GSPMD may leave token-axis-sharded params that eval /
            # checkpointing cannot materialize per-host
            from jax.sharding import NamedSharding
            params = jax.tree.map(
                lambda t: jax.lax.with_sharding_constraint(
                    t, NamedSharding(mesh, P())), params)
        return params["vit"], params["head"], opt_state, loss, cm

    # donate params+moments (like make_train_step's default) — the memory
    # headroom matters most in exactly this mode; off by default because
    # tests/callers may reuse input trees across calls
    return jax.jit(step, donate_argnums=(0, 1, 2) if donate else ())
