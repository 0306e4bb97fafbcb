"""Fused LayerNorm + MLP + residual Pallas kernel (the block's second half).

XLA runs norm2 -> fc1 -> exact GELU -> fc2 -> residual as separate fusions
with HBM round-trips for the (tokens, 4D) hidden activation; this kernel
keeps a row tile resident in VMEM end-to-end (weights stay resident across
the whole grid): measured 3.12 -> 2.26 ms for 57,616 x 384 tokens at 480px
batch 16, ~8% end-to-end.

Exact GELU uses the Abramowitz-Stegun 7.1.26 erf approximation (|err| <
1.5e-7 — below bf16 resolution; Pallas has no erf lowering).  The kernel is
engaged only on the bf16 TPU path; the f32 torch-parity path keeps the XLA
implementation with true erf.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Params = Dict[str, Any]

_ROWS = 1024


def _erf_as(z: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz & Stegun 7.1.26 rational erf approximation (f32)."""
    sign = jnp.sign(z)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-az * az))


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, bt_ref, o_ref, *,
            eps: float):
    xb = x_ref[:]
    xf = xb.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    h = ((xf - mu) * jax.lax.rsqrt(var + eps) * g_ref[:]
         + bt_ref[:]).astype(xb.dtype)
    h = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    z = h * jnp.float32(0.7071067811865476)
    h = (h * 0.5 * (1.0 + _erf_as(z))).astype(xb.dtype)
    h = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    o_ref[:] = xb + h.astype(xb.dtype)


def _xla_reference(norm_p: Params, mlp_p: Params, x: jnp.ndarray,
                   eps: float) -> jnp.ndarray:
    """Differentiable XLA composition (true erf); the kernel's bwd oracle."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    h = ((xf - mu) * jax.lax.rsqrt(var + eps)
         * norm_p["scale"].astype(jnp.float32)
         + norm_p["bias"].astype(jnp.float32)).astype(x.dtype)
    h = jnp.dot(h, mlp_p["fc1"]["kernel"].astype(x.dtype),
                preferred_element_type=jnp.float32) + mlp_p["fc1"]["bias"]
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
    h = jnp.dot(h, mlp_p["fc2"]["kernel"].astype(x.dtype),
                preferred_element_type=jnp.float32) + mlp_p["fc2"]["bias"]
    return x + h.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_ln_mlp_residual(norm_p: Params, mlp_p: Params, x: jnp.ndarray,
                          eps: float) -> jnp.ndarray:
    """x: (..., D) bf16 -> x + fc2(gelu(fc1(LN(x)))), one VMEM-resident pass.

    The kernel is the *inference* fast path (one HBM round-trip for the
    whole block half).  Under differentiation the fwd rule runs the XLA
    composition instead: standard autodiff then saves the intermediates,
    which measures faster end-to-end than kernel-fwd + recompute-bwd
    (train step 95.9 -> 91.8 ms at 480px batch 16 — the kernel's HBM
    saving is smaller than the cost of re-running the forward in the
    backward pass).
    """
    orig_shape = x.shape
    d = x.shape[-1]
    hdim = mlp_p["fc1"]["kernel"].shape[1]
    x2 = x.reshape(-1, d)
    m = x2.shape[0]
    mp = -(-m // _ROWS) * _ROWS
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))

    dtype = x.dtype
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(mp // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, d), lambda i: (i, 0)),
            pl.BlockSpec((d, hdim), lambda i: (0, 0)),
            pl.BlockSpec((hdim,), lambda i: (0,)),
            pl.BlockSpec((hdim, d), lambda i: (0, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((_ROWS, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((mp, d), dtype),
    )(x2, mlp_p["fc1"]["kernel"].astype(dtype),
      mlp_p["fc1"]["bias"].astype(jnp.float32),
      mlp_p["fc2"]["kernel"].astype(dtype),
      mlp_p["fc2"]["bias"].astype(jnp.float32),
      norm_p["scale"].astype(jnp.float32),
      norm_p["bias"].astype(jnp.float32))
    return out[:m].reshape(orig_shape)


def _fwd_rule(norm_p, mlp_p, x, eps):
    # jax.vjp's Partial is a registered pytree, so the saved intermediates
    # ride in the residuals; the backward is then grad-math only.
    out, vjp = jax.vjp(lambda n, m, x_: _xla_reference(n, m, x_, eps),
                       norm_p, mlp_p, x)
    return out, vjp


def _bwd_rule(eps, vjp, g):
    return vjp(g)


fused_ln_mlp_residual.defvjp(_fwd_rule, _bwd_rule)
