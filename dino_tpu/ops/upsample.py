"""Label-map upsampling (np.kron equivalent) in-graph.

The reference always returns a 480x480 int label map regardless of inference
resolution, via np.kron with a ones block on the host
(pl_torch_modules.py:294-298).  Here the blow-up happens on-device with two
repeats so predict() does a single small device->host transfer.
"""
from __future__ import annotations

import jax.numpy as jnp


def kron_upsample(low_res: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(H, W) -> (H*factor, W*factor) by block replication."""
    x = jnp.repeat(low_res, factor, axis=0)
    return jnp.repeat(x, factor, axis=1)
