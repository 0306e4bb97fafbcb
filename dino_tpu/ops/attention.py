"""Attention ops: Pallas flash-attention (TPU) + XLA reference path.

The reference computes vanilla O(N^2) attention that always materializes the
probability matrix (dt_segmentation/src/vision_transformer.py:68-107), because
CLS-attention maps are a first-class API.  Here the hot path (no probs needed)
runs a Pallas online-softmax flash kernel that never materializes (N, N), which
is what makes 960px inference (N=14,401) memory-linear on one chip.  The probs
paths (``get_last_selfattention``, ``cls_mask``) use the XLA implementation.

Numerics: logits and softmax accumulate in float32 regardless of input dtype.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable when running on pure-CPU test rigs
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

Params = Dict[str, Any]

_NEG_INF = -1e30

# Kernel-internal dots pin their precision explicitly: the kernels define
# their own numerics (inputs in the input dtype, f32 accumulation), and an
# ambient jax.default_matmul_precision("highest") — set by the fp32 serving
# paths and the parity harness — must not leak into kernel tracing (f32
# dots would lower to the multi-pass MXU decomposition, blowing the scoped
# VMEM limit at 480px and slowing the kernel ~6x for no accuracy gain:
# per-cell kernel math is already bit-identical across batch shapes and
# AOT-exported programs).
_KERNEL_PREC = jax.lax.Precision.DEFAULT


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# XLA reference attention (materializes probabilities)
# ---------------------------------------------------------------------------

def attention_probs_xla(q: jnp.ndarray, k: jnp.ndarray, scale: float,
                        cls_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Probabilities (B, nh, Nq, N). With cls_mask: (1, nh, n_masks, N).

    cls_mask semantics (reference :88-99): binary masks multiply the CLS-row
    *logits* (zeroing, not -inf), after prepending a zero for the CLS column.
    Only that row of the score matrix is consumed, so q is sliced to the CLS
    token BEFORE the dot — the (N, N) matrix never materializes and
    ``forward_mask`` stays O(n_masks*N) memory at any resolution (960px
    would otherwise need ~5 GB f32 for the full matrix).
    """
    if cls_mask is not None:
        q = q[0:1, :, 0:1, :]  # CLS query row only: (1, nh, 1, hd)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if cls_mask is not None:
        n_masks = cls_mask.shape[0]
        flat = cls_mask.reshape(n_masks, -1).astype(jnp.float32)
        flat = jnp.concatenate(
            [jnp.zeros((n_masks, 1), jnp.float32), flat], axis=1)  # (n_masks, N)
        logits = logits * flat[None, None, :, :]  # broadcast to n_masks rows
    return jax.nn.softmax(logits, axis=-1)


def attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
                  cls_mask: Optional[jnp.ndarray] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    probs = attention_probs_xla(q, k, scale, cls_mask)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out, probs


# ---------------------------------------------------------------------------
# Pallas flash attention (forward)
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref=None, *,
                  scale: float, n_real: int, block_k: int):
    """Online-softmax flash attention for one (bh, q-block) grid cell.

    K/V for the whole (padded) sequence ride in VMEM (block-sized via the
    BlockSpec when the sequence is long); the kernel sweeps k in ``block_k``
    chunks with a fori_loop.  Only the final chunk needs the padding mask, so
    the main loop runs mask-free (saves an iota+select per chunk on the VPU).
    Matmuls run in the input dtype (bf16 = MXU fast path) with f32
    accumulation; scale applies post-matmul like the reference
    ``(q @ k.T) * scale``.
    """
    qb = q_ref[0]                                      # (BQ, hd), input dtype
    nk = k_ref.shape[1] // block_k

    def s_of(i):
        kb = k_ref[0, pl.ds(i * block_k, block_k), :]
        return jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=_KERNEL_PREC) * scale

    def update(i, carry, s, masked):
        m, l, acc = carry
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_k
            s = jnp.where(col < n_real, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        vb = v_ref[0, pl.ds(i * block_k, block_k), :]
        acc_new = acc * alpha + jnp.dot(p.astype(vb.dtype), vb,
                                        preferred_element_type=jnp.float32,
                                        precision=_KERNEL_PREC)
        return m_new, l_new, acc_new

    block_q, hd = qb.shape
    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    a0 = jnp.zeros((block_q, hd), jnp.float32)
    needs_mask = n_real < k_ref.shape[1]
    carry = (m0, l0, a0)
    # software-pipelined static unroll: chunk i+1's QK^T (MXU) is issued
    # before chunk i's softmax/accumulate (VPU), so the units overlap —
    # measured 13% faster than the fori_loop form at 480px
    s_next = s_of(0)
    for i in range(nk):
        s_cur = s_next
        if i + 1 < nk:
            s_next = s_of(i + 1)
        carry = update(i, carry, s_cur,
                       masked=(i == nk - 1 and needs_mask))
    m, l, acc = carry
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    if lse_ref is not None:  # row log-sum-exp, saved for the backward kernel
        lse_ref[0] = m + jnp.log(jnp.maximum(l, 1e-30))


def _flash_kernel_dyn(nmask_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                      scale: float, block_k: int):
    """Resident flash kernel with a *dynamic* valid-K bound (scalar-prefetch).

    Ring attention's per-hop shards have a traced number of valid keys (the
    global padding lives in whichever shard is currently held), so the mask
    bound cannot be baked in at trace time like the single-chip kernels'.
    Every chunk masks against the bound; costs one iota+select per chunk.
    """
    bound = nmask_ref[0]
    qb = q_ref[0]
    nk = k_ref.shape[1] // block_k

    def s_of(i):
        kb = k_ref[0, pl.ds(i * block_k, block_k), :]
        return jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=_KERNEL_PREC) * scale

    block_q, hd = qb.shape
    m = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, hd), jnp.float32)
    s_next = s_of(0)
    for i in range(nk):
        s = s_next
        if i + 1 < nk:
            s_next = s_of(i + 1)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_k
        s = jnp.where(col < bound, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        vb = v_ref[0, pl.ds(i * block_k, block_k), :]
        acc = acc * alpha + jnp.dot(p.astype(vb.dtype), vb,
                                    preferred_element_type=jnp.float32,
                                    precision=_KERNEL_PREC)
        m = m_new
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(jnp.maximum(l, 1e-30))


def _dyn_fwd_call(qf, kf, vf, scale, valid_k, block_q, block_k, out_dtype,
                  interpret):
    """One resident-K/V pass of the dyn kernel over padded (bnh, ·, hd)
    arrays; returns padded (out (bnh, npq, hd), lse (bnh, npq, 1) f32)."""
    bnh, npq, hd = qf.shape

    if pltpu is None:  # pragma: no cover — PrefetchScalarGridSpec needs the
        # pallas-TPU module even in interpret mode
        raise RuntimeError("pallas TPU backend unavailable (the dynamic-"
                           "bound ring kernel needs jax.experimental."
                           "pallas.tpu even for interpret=True)")
    # index maps receive the scalar-prefetch ref as a trailing argument
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bnh, npq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bh, iq, nm: (bh, iq, 0)),
            pl.BlockSpec((1, kf.shape[1], hd), lambda bh, iq, nm: (bh, 0, 0)),
            pl.BlockSpec((1, kf.shape[1], hd), lambda bh, iq, nm: (bh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bh, iq, nm: (bh, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, iq, nm: (bh, iq, 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_flash_kernel_dyn, scale=scale, block_k=block_k),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bnh, npq, hd), out_dtype),
                   jax.ShapeDtypeStruct((bnh, npq, 1), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(valid_k, jnp.int32).reshape(1), qf, kf, vf)


def flash_attention_with_lse_dyn(q, k, v, scale: float, valid_k,
                                 interpret: bool = False):
    """Flash attention with a traced valid-K bound, VMEM-safe at any shard.

    q: (B, nh, Nq, hd); k/v: (B, nh, Nk, hd); valid_k: traced int32 scalar —
    keys at positions >= valid_k are masked out.  Returns
    (out (B,nh,Nq,hd), lse (B*nh, Nq_padded, 1) f32).

    Ring shards are usually small, but NOT by construction: a 960px sequence
    on a 1-2 device ring leaves n_local in the tens of thousands, where a
    fully-resident K/V shard blows the scoped-VMEM limit (observed on-chip:
    30M needed vs the 16M cap on the backward twin).  So the same ladder as
    the static-bound path applies: resident when the shard fits the budget,
    resident-split per K/V slice merged by log-sum-exp when it doesn't
    (each slice's bound is the global bound clipped into the slice), and a
    masked-XLA fallback beyond the split cap.
    """
    b, nh, n, hd = q.shape
    n_k = k.shape[2]
    block_q = _q_block(n)
    qf = _pad_to(q.reshape(b * nh, n, hd), 1, block_q)
    kr = k.reshape(b * nh, n_k, hd)
    vr = v.reshape(b * nh, n_k, hd)
    npq = qf.shape[1]
    vk = jnp.asarray(valid_k, jnp.int32)

    splits = _split_count(n_k, hd, q.dtype.itemsize, _KV_VMEM_BUDGET)
    if splits == 1:
        block_k = _k_block(n_k)
        out, lse = _dyn_fwd_call(qf, _pad_to(kr, 1, block_k),
                                 _pad_to(vr, 1, block_k), scale, vk,
                                 block_q, block_k, q.dtype, interpret)
    elif splits is not None:
        base = _round_up(-(-n_k // splits), 16)
        outs, lses = [], []
        for s in range(splits):
            start = s * base
            length = min(base, n_k - start)
            block_k = _k_block(length)
            ks = _pad_to(kr[:, start:start + length, :], 1, block_k)
            vs = _pad_to(vr[:, start:start + length, :], 1, block_k)
            o_s, l_s = _dyn_fwd_call(qf, ks, vs, scale,
                                     jnp.clip(vk - start, 0, length),
                                     block_q, block_k, jnp.float32,
                                     interpret)
            outs.append(o_s)
            lses.append(l_s)
        out, lse = _merge_partials(outs, lses)
        out = out.astype(q.dtype)
    else:
        # masked-XLA fallback (shards beyond 8 split slices): O(N_local^2)
        # scores in HBM — correctness net, not a hot path
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        col = jnp.arange(n_k)[None, None, None, :]
        s = jnp.where(col < vk, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
        out = (jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32) / l
               ).astype(q.dtype)
        lse = _pad_to((m + jnp.log(l)).reshape(b * nh, n, 1), 1, block_q)
        return out, lse
    return out[:, :n, :].reshape(b, nh, n, hd), lse


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


_KV_VMEM_BUDGET = 5 * 1024 * 1024  # double-buffered K+V residency budget


def _q_block(n: int) -> int:
    """~512-row q blocks sized to exactly tile the sequence (3601 -> 8 blocks
    of 456 instead of 8 of 512, saving 12% padded work); 8-aligned blocks
    measure faster than 16-aligned (less padded work).  Long sequences
    (the resident-split regime) halve the block so the f32 score matrices
    and pipeline liveness fit VMEM next to the resident K/V slice."""
    target = 512 if n <= 8000 else 256
    nq = max(1, -(-n // target))
    return _round_up(-(-n // nq), 8)


def _k_block(n: int) -> int:
    """~464-row k chunks pipeline best (next chunk's MXU QK^T overlaps the
    current chunk's VPU softmax); multiple-of-16 blocks avoid sublane padding;
    unroll count capped for compile time."""
    n_inner = min(32, max(1, -(-n // 464)))
    return _round_up(-(-n // n_inner), 16)


def _kv_dbl_bytes(n_k: int, hd: int, itemsize: int) -> int:
    return 2 * 2 * _round_up(n_k, 16) * hd * itemsize


def _split_count(n: int, hd: int, itemsize: int, budget: int,
                 extra_per_row: int = 0, max_splits: int = 8):
    """Smallest split count whose per-split resident footprint
    (double-buffered K+V slice + ``extra_per_row`` bytes per k row) fits the
    budget, or None if even max_splits splits don't."""
    for s in range(1, max_splits + 1):
        n_s = -(-n // s)
        if (_kv_dbl_bytes(n_s, hd, itemsize)
                + extra_per_row * _round_up(n_s, 16)) <= budget:
            return s
    return None


def _choose_blocks(n: int, hd: int, itemsize: int):
    """(block_q, block_k, kv_resident) for the single-pass paths."""
    block_q = _q_block(n)
    if _kv_dbl_bytes(n, hd, itemsize) <= _KV_VMEM_BUDGET:
        return block_q, _k_block(n), True
    # chunked 3-D grid: fewer, larger DMA'd chunks bounded by the f32
    # score-matrix footprint
    s_budget = 6 * 1024 * 1024
    max_bk = max(16, (s_budget // (4 * block_q)) // 16 * 16)
    n_inner = max(1, -(-n // max_bk))
    return block_q, _round_up(-(-n // n_inner), 16), False


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, scale: float, interpret: bool = False):
    """Flash attention over (B, nh, N, hd) -> (B, nh, N, hd); fp32 accumulation.

    Forward runs the Pallas online-softmax kernel; the backward pass (used only
    by the finetune path at training resolutions) recomputes the XLA attention
    and differentiates it, trading memory during training for zero extra kernel
    surface in round 1.
    """
    return _flash_fwd_impl(q, k, v, scale, interpret)


def _flash_kernel_chunked(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                          scale: float, n_real: int):
    """Chunked fallback for sequences whose K/V exceed the VMEM budget.

    Grid (B*nh, num_q_blocks, num_k_chunks), k innermost; the online-softmax
    running state lives in VMEM scratch across the k sweep so only one K/V
    chunk is resident at a time (960px f32, N=14,401, fits comfortably).
    """
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    qb = q_ref[0]
    kb = k_ref[0]
    vb = v_ref[0]
    block_k = kb.shape[0]
    s = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_KERNEL_PREC) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ik * block_k
    s = jnp.where(col < n_real, s, _NEG_INF)

    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jnp.dot(
        p.astype(vb.dtype), vb, preferred_element_type=jnp.float32,
        precision=_KERNEL_PREC)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:, :1], 1e-30)
                    ).astype(o_ref.dtype)


def _resident_call(qf, kf, vf, scale, n_real_k, block_q, block_k,
                   out_dtype, want_lse, interpret):
    """One resident-K/V pass: grid (bh, q-blocks), fast kernel, optional
    per-row log-sum-exp output."""
    bnh, npq, hd = qf.shape
    kernel = functools.partial(_flash_kernel, scale=scale, n_real=n_real_k,
                               block_k=block_k)
    out_shapes = jax.ShapeDtypeStruct((bnh, npq, hd), out_dtype)
    out_specs = pl.BlockSpec((1, block_q, hd), lambda bh, iq: (bh, iq, 0))
    if want_lse:
        # rank-3 with a unit lane dim keeps Mosaic's block-tiling rules
        # happy for the non-128-multiple block_q
        out_shapes = (out_shapes,
                      jax.ShapeDtypeStruct((bnh, npq, 1), jnp.float32))
        out_specs = (out_specs,
                     pl.BlockSpec((1, block_q, 1), lambda bh, iq: (bh, iq, 0)))
    out = pl.pallas_call(
        kernel,
        grid=(bnh, npq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((1, kf.shape[1], hd), lambda bh, iq: (bh, 0, 0)),
            pl.BlockSpec((1, kf.shape[1], hd), lambda bh, iq: (bh, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(qf, kf, vf)
    return out if want_lse else (out, None)


def _merge_partials(outs, lses):
    """Online-softmax merge of per-K/V-slice partial results.

    Each slice returns its softmax-normalized output O_h and row
    log-sum-exp L_h; the exact global result is the L-weighted average
    O = sum_h O_h * exp(L_h - lse) with lse = logsumexp_h(L_h).
    """
    lse_all = jnp.stack(lses)                     # (S, bnh, npq, 1)
    m = jnp.max(lse_all, axis=0)
    w = jnp.exp(lse_all - m)                      # (S, bnh, npq, 1)
    denom = jnp.maximum(jnp.sum(w, axis=0), 1e-30)
    out = jnp.sum(jnp.stack(outs) * w, axis=0) / denom
    return out, m + jnp.log(denom)


def _flash_fwd_impl(q, k, v, scale, interpret, return_lse: bool = False):
    b, nh, n, hd = q.shape
    splits = _split_count(n, hd, q.dtype.itemsize, _KV_VMEM_BUDGET)
    block_q = _q_block(n)

    qf = _pad_to(q.reshape(b * nh, n, hd), 1, block_q)
    kr = k.reshape(b * nh, n, hd)
    vr = v.reshape(b * nh, n, hd)
    lse = None

    if splits == 1:
        # fast path: K/V fully VMEM-resident, fori-loop sweep inside
        block_k = _k_block(n)
        out, lse = _resident_call(qf, _pad_to(kr, 1, block_k),
                                  _pad_to(vr, 1, block_k), scale, n,
                                  block_q, block_k, q.dtype, return_lse,
                                  interpret)
    elif splits is not None:
        # resident-split: run the fast kernel once per K/V slice (each slice
        # VMEM-resident), then merge the partials with an online-softmax
        # weighted average.  ~3x faster than the chunked 3-D grid at 960px
        # because every pass runs at the resident kernel's MXU/VPU overlap.
        base = _round_up(-(-n // splits), 16)
        outs, lses = [], []
        for s in range(splits):
            start = s * base
            length = min(base, n - start)
            block_k = _k_block(length)
            ks = _pad_to(kr[:, start:start + length, :], 1, block_k)
            vs = _pad_to(vr[:, start:start + length, :], 1, block_k)
            o_s, l_s = _resident_call(qf, ks, vs, scale, length, block_q,
                                      block_k, jnp.float32, True, interpret)
            outs.append(o_s)
            lses.append(l_s)
        out, lse = _merge_partials(outs, lses)
        out = out.astype(q.dtype)
    else:
        # chunked 3-D grid with VMEM scratch state: the >8-split regime
        block_q, block_k, _ = _choose_blocks(n, hd, q.dtype.itemsize)
        kernel = functools.partial(_flash_kernel_chunked, scale=scale,
                                   n_real=n)
        if pltpu is None:  # pragma: no cover
            raise RuntimeError("pallas TPU backend unavailable")
        kf = _pad_to(kr, 1, block_k)
        vf = _pad_to(vr, 1, block_k)
        scratch = [pltpu.VMEM((block_q, 128), jnp.float32),   # running max
                   pltpu.VMEM((block_q, 128), jnp.float32),   # running denom
                   pltpu.VMEM((block_q, hd), jnp.float32)]    # accumulator
        out = pl.pallas_call(
            kernel,
            grid=(b * nh, qf.shape[1] // block_q, kf.shape[1] // block_k),
            in_specs=[
                pl.BlockSpec((1, block_q, hd), lambda bh, iq, ik: (bh, iq, 0)),
                pl.BlockSpec((1, block_k, hd), lambda bh, iq, ik: (bh, ik, 0)),
                pl.BlockSpec((1, block_k, hd), lambda bh, iq, ik: (bh, ik, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, hd),
                                   lambda bh, iq, ik: (bh, iq, 0)),
            out_shape=jax.ShapeDtypeStruct((b * nh, qf.shape[1], hd), q.dtype),
            scratch_shapes=scratch,
            interpret=interpret,
        )(qf, kf, vf)
    out = out[:, :n, :].reshape(b, nh, n, hd)
    if return_lse:
        # (b*nh, npq, 1), padded rows included; the bwd kernel never lets
        # padded entries contribute (their dO/D are zero)
        return out, lse
    return out


def _flash_fwd_rule(q, k, v, scale, interpret):
    out, lse = _flash_fwd_impl(q, k, v, scale, interpret, return_lse=True)
    return out, (q, k, v, out, lse)


def _flash_bwd_chunked(q, k, v, g, scale, block: int = 128):
    """Memory-linear attention backward: recompute softmax per q-chunk and
    scan, carrying dK/dV accumulators — the flash-attention backward
    formulation in XLA.  Peak memory is O(block * N) instead of O(N^2),
    which is what makes unfrozen 480px training possible at batch 16."""
    b, nh, n, hd = q.shape
    in_dtype = q.dtype
    qp = _pad_to(q, 2, block)
    gp = _pad_to(g, 2, block)
    npq = qp.shape[2]
    nq = npq // block

    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    def chunk(carry, idx):
        dk, dv = carry
        qs = jax.lax.dynamic_slice_in_dim(qp, idx * block, block, axis=2)
        gs = jax.lax.dynamic_slice_in_dim(gp, idx * block, block, axis=2
                                          ).astype(jnp.float32)
        row_ok = (idx * block + jnp.arange(block)) < n       # mask padded q
        s = jnp.einsum("bhqd,bhkd->bhqk", qs, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        dp = jnp.einsum("bhqd,bhkd->bhqk", gs, vf,
                        preferred_element_type=jnp.float32)
        dsum = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - dsum) * scale
        ds = jnp.where(row_ok[None, None, :, None], ds, 0.0)
        p_ok = jnp.where(row_ok[None, None, :, None], p, 0.0)
        dq_chunk = jnp.einsum("bhqk,bhkd->bhqd", ds, kf,
                              preferred_element_type=jnp.float32)
        dk = dk + jnp.einsum("bhqk,bhqd->bhkd", ds, qs.astype(jnp.float32),
                             preferred_element_type=jnp.float32)
        dv = dv + jnp.einsum("bhqk,bhqd->bhkd", p_ok, gs,
                             preferred_element_type=jnp.float32)
        return (dk, dv), dq_chunk

    zeros = jnp.zeros((b, nh, n, hd), jnp.float32)
    (dk, dv), dq_chunks = jax.lax.scan(chunk, (zeros, zeros), jnp.arange(nq))
    dq = jnp.moveaxis(dq_chunks, 0, 2).reshape(b, nh, npq, hd)[:, :, :n, :]
    return (dq.astype(in_dtype), dk.astype(in_dtype), dv.astype(in_dtype))


def _flash_bwd_kernel(q_ref, g_ref, lse_ref, d_ref, k_ref, v_ref,
                      dq_ref, dk_ref, dv_ref, *,
                      scale: float, n_real: int, block_k: int):
    """dq/dk/dv for one (bh, q-block) grid cell; K/V and the dK/dV
    accumulators ride in VMEM for the whole bh row.

    TPU Pallas grids execute sequentially and output blocks whose index map
    ignores ``iq`` stay resident in VMEM across the q sweep, so dK/dV
    accumulate race-free and write back to HBM once per bh.  P is recomputed
    from Q·Kᵀ and the forward's saved row log-sum-exp (no O(N²) residual).
    Standard flash-attention backward:

        P  = exp(S·scale − lse)
        dV = Pᵀ·dO          dP = dO·Vᵀ
        dS = P ∘ (dP − rowsum(dO ∘ O)) · scale
        dQ = dS·K           dK = dSᵀ·Q

    Replaces the reference's autograd through vanilla attention
    (vision_transformer.py:85-104).
    """
    iq = pl.program_id(1)

    @pl.when(iq == 0)
    def _zero_accumulators():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    qb = q_ref[0]                                   # (BQ, hd), input dtype
    gb = g_ref[0]                                   # (BQ, hd), input dtype
    lse = lse_ref[0]                                # (BQ, 1) f32
    dsum = d_ref[0]                                 # (BQ, 1) f32
    nk = k_ref.shape[1] // block_k
    needs_mask = n_real < k_ref.shape[1]

    for i in range(nk):
        sl = pl.ds(i * block_k, block_k)
        kb = k_ref[0, sl, :]
        vb = v_ref[0, sl, :]
        s = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=_KERNEL_PREC) * scale
        p = jnp.exp(s - lse)
        if i == nk - 1 and needs_mask:  # zero padded k columns
            col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) + i * block_k
            p = jnp.where(col < n_real, p, 0.0)
        pc = p.astype(gb.dtype)
        dv_ref[0, sl, :] += jax.lax.dot_general(
            pc, gb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_KERNEL_PREC)
        dp = jax.lax.dot_general(gb, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=_KERNEL_PREC)
        ds = (p * (dp - dsum) * scale).astype(qb.dtype)
        dk_ref[0, sl, :] += jax.lax.dot_general(
            ds, qb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_KERNEL_PREC)
        dq_i = jnp.dot(ds, kb, preferred_element_type=jnp.float32,
                       precision=_KERNEL_PREC)
        if i == 0:
            dq_acc = dq_i
        else:
            dq_acc = dq_acc + dq_i
    dq_ref[0] = dq_acc


def _flash_bwd_kernel_dyn(nmask_ref, q_ref, g_ref, lse_ref, d_ref, k_ref,
                          v_ref, dq_ref, dk_ref, dv_ref, *,
                          scale: float, block_k: int):
    """Backward twin of ``_flash_kernel_dyn``: dq/dk/dv for one (bh, q-block)
    grid cell with a *traced* valid-K bound (scalar-prefetch).

    Ring attention's backward reuses the single-chip flash-backward partition
    argument (P's columns split exactly across K/V slices given the GLOBAL
    row log-sum-exp and D = rowsum(dO ∘ O), see ``_flash_bwd_rule``) — but
    each hop's valid-key count depends on which shard is in hand, so the mask
    bound is a runtime scalar.  Every chunk masks (one iota+select per chunk,
    same cost profile as the dyn forward kernel).
    """
    bound = nmask_ref[0]
    iq = pl.program_id(1)

    @pl.when(iq == 0)
    def _zero_accumulators():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    qb = q_ref[0]
    gb = g_ref[0]
    lse = lse_ref[0]
    dsum = d_ref[0]
    nk = k_ref.shape[1] // block_k

    for i in range(nk):
        sl = pl.ds(i * block_k, block_k)
        kb = k_ref[0, sl, :]
        vb = v_ref[0, sl, :]
        s = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=_KERNEL_PREC) * scale
        p = jnp.exp(s - lse)
        col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) + i * block_k
        p = jnp.where(col < bound, p, 0.0)
        pc = p.astype(gb.dtype)
        dv_ref[0, sl, :] += jax.lax.dot_general(
            pc, gb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_KERNEL_PREC)
        dp = jax.lax.dot_general(gb, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=_KERNEL_PREC)
        ds = (p * (dp - dsum) * scale).astype(qb.dtype)
        dk_ref[0, sl, :] += jax.lax.dot_general(
            ds, qb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_KERNEL_PREC)
        dq_i = jnp.dot(ds, kb, preferred_element_type=jnp.float32,
                       precision=_KERNEL_PREC)
        if i == 0:
            dq_acc = dq_i
        else:
            dq_acc = dq_acc + dq_i
    dq_ref[0] = dq_acc


def _dyn_bwd_call(q, g, lse, dsum, k, v, scale, valid_k, interpret):
    """One resident-K/V pass of the dyn backward kernel (K/V must fit the
    residency budget); shapes as in :func:`flash_attention_bwd_dyn`."""
    b, nh, n, hd = q.shape
    n_k = k.shape[2]
    block_q = _q_block(n)
    block_k = _k_block(n_k)
    qf = _pad_to(q.reshape(b * nh, n, hd), 1, block_q)
    gf = _pad_to(g.reshape(b * nh, n, hd), 1, block_q)
    lf = _pad_to(lse.reshape(b * nh, n, 1), 1, block_q)
    df = _pad_to(dsum.reshape(b * nh, n, 1), 1, block_q)
    kf = _pad_to(k.reshape(b * nh, n_k, hd), 1, block_k)
    vf = _pad_to(v.reshape(b * nh, n_k, hd), 1, block_k)
    npq, npk = qf.shape[1], kf.shape[1]

    if pltpu is None:  # pragma: no cover
        raise RuntimeError("pallas TPU backend unavailable (the dynamic-"
                           "bound bwd kernel needs jax.experimental."
                           "pallas.tpu even for interpret=True)")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * nh, npq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bh, iq, nm: (bh, iq, 0)),
            pl.BlockSpec((1, block_q, hd), lambda bh, iq, nm: (bh, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, iq, nm: (bh, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, iq, nm: (bh, iq, 0)),
            pl.BlockSpec((1, npk, hd), lambda bh, iq, nm: (bh, 0, 0)),
            pl.BlockSpec((1, npk, hd), lambda bh, iq, nm: (bh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bh, iq, nm: (bh, iq, 0)),
            pl.BlockSpec((1, npk, hd), lambda bh, iq, nm: (bh, 0, 0)),
            pl.BlockSpec((1, npk, hd), lambda bh, iq, nm: (bh, 0, 0)),
        ],
    )
    kernel = functools.partial(_flash_bwd_kernel_dyn, scale=scale,
                               block_k=block_k)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * nh, npq, hd), jnp.float32),
            jax.ShapeDtypeStruct((b * nh, npk, hd), jnp.float32),
            jax.ShapeDtypeStruct((b * nh, npk, hd), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(valid_k, jnp.int32).reshape(1), qf, gf, lf, df, kf, vf)
    dq = dq[:, :n, :].reshape(b, nh, n, hd)
    dk = dk[:, :n_k, :].reshape(b, nh, n_k, hd)
    dv = dv[:, :n_k, :].reshape(b, nh, n_k, hd)
    return dq, dk, dv


def flash_attention_bwd_dyn(q, g, lse, dsum, k, v, scale: float, valid_k,
                            interpret: bool = False):
    """dq/dk/dv against one K/V shard with a traced valid-key bound.

    q/g: (B, nh, Nq, hd); lse/dsum: (B, nh, Nq, 1) f32 — the GLOBAL row
    log-sum-exp and rowsum(dO ∘ O) (merged over every shard); k/v:
    (B, nh, Nk, hd).  Keys at positions >= valid_k are dead (p forced to 0).
    Returns f32 (dq_partial, dk, dv) — the ring backward sums dq over hops
    and rotates dk/dv home.

    Like the static-bound backward (:func:`_flash_bwd_rule`), the K/V shard
    splits into resident slices when it exceeds the VMEM budget: given the
    GLOBAL lse/D, P's columns partition exactly across slices, so each
    slice's dq/dk/dv is independent — dq sums, dk/dv concatenate.  The
    slice bound is the global bound clipped into the slice.  Beyond the
    split cap a masked-XLA fallback keeps the math (this is what lets a
    960px ring run on 1-2 devices, where n_local is in the tens of
    thousands: unsplit, the kernel's scoped-VMEM allocation measured 30M
    against the chip's 16M cap).

    The split accounting here is SCORE-AWARE, unlike the K/V-byte model of
    the static path: Mosaic schedules the unrolled chunk sweep with ~2
    score-sized f32 temporaries live PER CHUNK, so the scoped ask scales as
    ~8·block_q·npk bytes regardless of head dim (measured on-chip: 30.0M at
    npk=14848 and 22.5M at npk=7424+buffers, block_q=256, hd=16 — where the
    K/V-byte model predicted a comfortable fit).  Small head dims therefore
    split far earlier than the byte model would say.
    """
    b, nh, n, hd = q.shape
    n_k = k.shape[2]
    itemsize = q.dtype.itemsize
    per_row = (8 * _q_block(n)        # ~2 live f32 score chunks per key row
               + 4 * hd * itemsize    # double-buffered K+V slice
               + 4 * hd * 4)          # f32 dK/dV accumulators (+dbl buffer)
    splits = next(
        (s for s in range(1, 65)
         if _round_up(-(-n_k // s), 16) * per_row <= _DYN_BWD_VMEM_BUDGET),
        None)
    if splits == 1:
        return _dyn_bwd_call(q, g, lse, dsum, k, v, scale, valid_k, interpret)
    vk = jnp.asarray(valid_k, jnp.int32)
    if splits is not None:
        base = _round_up(-(-n_k // splits), 16)
        dq, dks, dvs = 0.0, [], []
        for s in range(splits):
            start = s * base
            length = min(base, n_k - start)
            dq_s, dk_s, dv_s = _dyn_bwd_call(
                q, g, lse, dsum, k[:, :, start:start + length],
                v[:, :, start:start + length], scale,
                jnp.clip(vk - start, 0, length), interpret)
            dq = dq + dq_s
            dks.append(dk_s)
            dvs.append(dv_s)
        return dq, jnp.concatenate(dks, axis=2), jnp.concatenate(dvs, axis=2)
    # masked-XLA fallback: O(N_local^2) scores in HBM — correctness net
    qf = q.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, k.astype(jnp.float32),
                   preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse)
    col = jnp.arange(n_k)[None, None, None, :]
    p = jnp.where(col < vk, p, 0.0)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf,
                    preferred_element_type=jnp.float32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, v.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    ds = p * (dp - dsum) * scale
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf,
                    preferred_element_type=jnp.float32)
    return dq, dk, dv


# K/V slice + f32 dK/dV accumulators; conservative because Mosaic also
# double-buffers the accumulator outputs and keeps several unrolled score
# chunks live (22.7MB actual at a 7.4MB model estimate, measured at 960px)
_BWD_VMEM_BUDGET = 4 * 1024 * 1024

# Dyn (ring per-hop) backward: budget for the SCORE-AWARE per-row model
# (~8·block_q bytes/row of live score temporaries + K/V residency + dK/dV
# accumulators — see flash_attention_bwd_dyn).  Half the 16M scoped cap,
# leaving headroom for Mosaic's own pipeline liveness.
_DYN_BWD_VMEM_BUDGET = 8 * 1024 * 1024


def _flash_bwd_pallas(q, k, v, lse, g, dsum, scale, interpret):
    """Pallas backward over one K/V slice (k/v may be shorter than q when the
    rule splits them for VMEM residency).  Returns f32 dq/dk/dv."""
    b, nh, n, hd = q.shape
    n_k = k.shape[2]
    block_q = _q_block(n)       # must match the forward's q-block padding
    block_k = _k_block(n_k)

    qf = _pad_to(q.reshape(b * nh, n, hd), 1, block_q)
    gf = _pad_to(g.reshape(b * nh, n, hd), 1, block_q)
    # lse comes back from the forward already padded to the q-block grid
    lf = lse
    df = _pad_to(dsum.reshape(b * nh, n, 1), 1, block_q)
    kf = _pad_to(k.reshape(b * nh, n_k, hd), 1, block_k)
    vf = _pad_to(v.reshape(b * nh, n_k, hd), 1, block_k)
    npq, npk = qf.shape[1], kf.shape[1]

    kernel = functools.partial(_flash_bwd_kernel, scale=scale, n_real=n_k,
                               block_k=block_k)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b * nh, npq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((1, block_q, hd), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((1, npk, hd), lambda bh, iq: (bh, 0, 0)),
            pl.BlockSpec((1, npk, hd), lambda bh, iq: (bh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((1, npk, hd), lambda bh, iq: (bh, 0, 0)),
            pl.BlockSpec((1, npk, hd), lambda bh, iq: (bh, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * nh, npq, hd), jnp.float32),
            jax.ShapeDtypeStruct((b * nh, npk, hd), jnp.float32),
            jax.ShapeDtypeStruct((b * nh, npk, hd), jnp.float32),
        ],
        interpret=interpret,
    )(qf, gf, lf, df, kf, vf)
    dq = dq[:, :n, :].reshape(b, nh, n, hd)
    dk = dk[:, :n_k, :].reshape(b, nh, n_k, hd)
    dv = dv[:, :n_k, :].reshape(b, nh, n_k, hd)
    return dq, dk, dv


def _flash_bwd_rule(scale, interpret, res, g):
    q, k, v, out, lse = res
    b, nh, n, hd = q.shape
    splits = _split_count(n, hd, q.dtype.itemsize, _BWD_VMEM_BUDGET,
                          extra_per_row=2 * hd * 4)
    if lse is None or splits is None:
        return _flash_bwd_chunked(q, k, v, g, scale)
    # D = rowsum(dO ∘ O) per query row (f32), fused by XLA into the
    # surrounding graph; everything else happens in the Pallas kernel.
    dsum = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    if splits == 1:
        dq, dk, dv = _flash_bwd_pallas(q, k, v, lse, g, dsum, scale,
                                       interpret)
    else:
        # split K/V into resident slices; P's columns partition exactly, so
        # each slice's backward is independent given the global lse/D —
        # dK/dV concatenate, dQ sums (in f32)
        base = _round_up(-(-n // splits), 16)
        dq, dks, dvs = 0.0, [], []
        for s in range(splits):
            sl = slice(s * base, min(n, (s + 1) * base))
            dq_s, dk_s, dv_s = _flash_bwd_pallas(
                q, k[:, :, sl], v[:, :, sl], lse, g, dsum, scale, interpret)
            dq = dq + dq_s
            dks.append(dk_s)
            dvs.append(dv_s)
        dk = jnp.concatenate(dks, axis=2)
        dv = jnp.concatenate(dvs, axis=2)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


# ---------------------------------------------------------------------------
# Full multi-head attention layer (qkv proj -> attention -> out proj)
# ---------------------------------------------------------------------------

def multi_head_attention(p: Params, x: jnp.ndarray, *, num_heads: int,
                         scale: float, cls_mask: Optional[jnp.ndarray] = None,
                         need_probs: bool = False, use_flash: bool = True,
                         attn_drop=None
                         ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Reference-equivalent MHSA returning (out, attn_probs_or_None).

    Matches Attention.forward (reference :80-107) including the cls_mask path
    where the output collapses to one token per mask.  ``attn_drop`` is an
    optional (rate, rng) pair applying train-mode dropout to the attention
    probabilities (forces the probs path).
    """
    b, n, c = x.shape
    hd = c // num_heads
    if "kernel_i8" in p["qkv"]:  # int8 serving params (ops/quant.py)
        from dino_tpu.ops.quant import int8_dense
        qkv = int8_dense(p["qkv"], x)
        qkv = qkv.reshape(b, n, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, nh, N, hd)
    else:
        # emit head-major (3, B, nh, N, hd) straight out of the projection:
        # XLA folds the layout permutation into the dot's output, skipping
        # the separate (B, N, 3, nh, hd) -> transpose HBM shuffle (~1ms of
        # the 26.5ms 480px batch-16 predict program, measured on-chip)
        w = p["qkv"]["kernel"].astype(x.dtype).reshape(c, 3, num_heads, hd)
        bias = p["qkv"]["bias"].astype(jnp.float32).reshape(
            3, 1, num_heads, 1, hd)
        qkv = jnp.einsum("bnc,cthd->tbhnd", x, w,
                         preferred_element_type=jnp.float32)
        qkv = (qkv + bias).astype(x.dtype)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, nh, N, hd)

    probs = None
    if need_probs or cls_mask is not None or attn_drop is not None:
        probs = attention_probs_xla(q, k, scale, cls_mask)
        applied = probs
        if attn_drop is not None:
            rate, rng = attn_drop
            keep = 1.0 - rate
            mask = jax.random.bernoulli(rng, keep, probs.shape)
            applied = jnp.where(mask, probs / keep, 0.0)
        out = jnp.einsum("bhqk,bhkd->bhqd", applied.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
    elif use_flash and _on_tpu():
        out = flash_attention(q, k, v, scale)
    else:
        out, _ = attention_xla(q, k, v, scale)

    nq = out.shape[2]
    if "kernel_i8" in p["proj"]:
        from dino_tpu.ops.quant import int8_dense
        out = out.transpose(0, 2, 1, 3).reshape(out.shape[0], nq, c)
        out = int8_dense(p["proj"], out).astype(x.dtype)
    else:
        # contract heads straight out of the head-major layout (no
        # transpose-back); same trick as the qkv projection above
        wp = p["proj"]["kernel"].astype(out.dtype).reshape(num_heads, hd, c)
        out = jnp.einsum("bhnd,hdc->bnc", out, wp,
                         preferred_element_type=jnp.float32)
        out = (out + p["proj"]["bias"].astype(jnp.float32)).astype(x.dtype)
    return out, probs
