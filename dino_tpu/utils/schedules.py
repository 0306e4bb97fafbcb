"""Parameter schedules.

``cosine_scheduler`` is DERIVED from the reference's utility of the same name
(dt_segmentation/src/utils.py:187-198, itself from facebookresearch/dino):
linear-warmup-then-cosine admits essentially one spelling, and the API
contract (a per-iteration value array) is the deliverable. Kept intentionally
output-identical; pinned by tests/test_utils_parity.py.
"""
from __future__ import annotations

import numpy as np


def cosine_scheduler(base_value: float, final_value: float, epochs: int,
                     niter_per_ep: int, warmup_epochs: int = 0,
                     start_warmup_value: float = 0.0) -> np.ndarray:
    """Per-iteration schedule: linear warmup then cosine decay.

    Returns an array of length epochs * niter_per_ep (index with the global
    step, or wrap with ``as_optax_schedule``).
    """
    warmup_iters = warmup_epochs * niter_per_ep
    warmup_schedule = np.array([])
    if warmup_epochs > 0:
        warmup_schedule = np.linspace(start_warmup_value, base_value,
                                      warmup_iters)
    iters = np.arange(epochs * niter_per_ep - warmup_iters)
    schedule = final_value + 0.5 * (base_value - final_value) * (
        1 + np.cos(np.pi * iters / len(iters)))
    schedule = np.concatenate((warmup_schedule, schedule))
    assert len(schedule) == epochs * niter_per_ep
    return schedule


def as_optax_schedule(schedule: np.ndarray):
    """Wrap a precomputed per-step array as an optax schedule fn."""
    import jax.numpy as jnp
    table = jnp.asarray(schedule)

    def fn(step):
        idx = jnp.clip(step, 0, table.shape[0] - 1).astype(jnp.int32)
        return table[idx]

    return fn
