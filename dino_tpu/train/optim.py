"""Optimizer utilities: per-parameter gradient clipping, LARS, param groups.

JAX-native equivalents of the reference training utilities
(utils.py:132-141 clip_gradients, :553-591 LARS, :632-643 get_params_groups).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax

Params = Any


def clip_gradients(grads: Params, clip: float) -> Tuple[Params, Params]:
    """DINO-style PER-PARAMETER norm clipping (not global-norm).

    Each leaf is rescaled by clip/||g|| when its own L2 norm exceeds ``clip``.
    Returns (clipped_grads, norms) — the reference returns the norms list.
    """
    norms = jax.tree.map(lambda g: jnp.linalg.norm(g.astype(jnp.float32)),
                         grads)
    clipped = jax.tree.map(
        lambda g, n: g * jnp.minimum(1.0, clip / (n + 1e-6)), grads, norms)
    return clipped, norms


def per_param_clip(clip: float) -> optax.GradientTransformation:
    """optax transform wrapping clip_gradients."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        clipped, _ = clip_gradients(updates, clip)
        return clipped, state

    return optax.GradientTransformation(init, update)


def lars(learning_rate, momentum: float = 0.9, weight_decay: float = 0.0,
         eta: float = 0.001) -> optax.GradientTransformation:
    """LARS with DINO semantics: weight decay + trust-ratio adaptation only
    for >=2-D parameters; 1-D params (biases, norm scales) take plain SGD."""

    def init(params):
        return {"momentum": jax.tree.map(jnp.zeros_like, params),
                "count": jnp.zeros((), jnp.int32)}

    def update(updates, state, params):
        count = state["count"] + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        def one(g, p, m):
            g = g.astype(jnp.float32)
            if p.ndim > 1:
                g = g + weight_decay * p
                p_norm = jnp.linalg.norm(p)
                g_norm = jnp.linalg.norm(g)
                trust = jnp.where(
                    (p_norm > 0) & (g_norm > 0),
                    eta * p_norm / (g_norm + 1e-12), 1.0)
                g = g * trust
            m_new = momentum * m + g
            return -lr * m_new, m_new

        flat_u, tdef = jax.tree.flatten(updates)
        flat_p = tdef.flatten_up_to(params)
        flat_m = tdef.flatten_up_to(state["momentum"])
        outs = [one(g, p, m) for g, p, m in zip(flat_u, flat_p, flat_m)]
        new_updates = tdef.unflatten([o[0] for o in outs])
        new_mom = tdef.unflatten([o[1] for o in outs])
        return new_updates, {"momentum": new_mom, "count": count}

    return optax.GradientTransformation(init, update)


def get_params_groups(params: Params):
    """(regularized_mask, not_regularized_mask) pytrees of booleans:
    biases and 1-D params are exempt from weight decay
    (reference utils.py:632-643).  Use with optax.masked."""
    reg = jax.tree.map(lambda p: p.ndim > 1, params)
    not_reg = jax.tree.map(lambda p: p.ndim <= 1, params)
    return reg, not_reg
