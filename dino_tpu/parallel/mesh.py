"""Device mesh construction + sharding rules (pjit/GSPMD).

The reference is single-GPU with dormant NCCL scaffolding (utils.py:467-499).
Here multi-chip is first-class: a ('data', 'model') mesh over ICI, batch
sharded on 'data' (DP), the ViT/head matmuls sharded on 'model' (TP) — XLA
inserts the all-reduces.  On one chip everything degenerates to replicated.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_axis: int = 1) -> Mesh:
    """Mesh over the first n devices, shaped (data = n/model_axis, model)."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n % model_axis != 0:
        raise ValueError(f"{n} devices not divisible by model axis {model_axis}")
    grid = np.array(devices[:n]).reshape(n // model_axis, model_axis)
    return Mesh(grid, ("data", "model"))


def _vit_block_spec() -> Any:
    """Megatron-style TP layout for one transformer block: qkv/fc1 split on
    the output (head / hidden) dim, proj/fc2 on the input dim, so each block
    needs exactly one psum after attention and one after the MLP."""
    col = {"kernel": P(None, "model"), "bias": P("model")}
    row = {"kernel": P("model", None), "bias": P()}
    ln = {"scale": P(), "bias": P()}
    return {
        "norm1": ln,
        "attn": {"qkv": col, "proj": row},
        "norm2": ln,
        "mlp": {"fc1": col, "fc2": row},
    }


def vit_param_spec(n_blocks: int) -> Any:
    return {
        "cls_token": P(),
        "pos_embed": P(),
        "patch_embed": {"kernel": P(), "bias": P()},
        "blocks": [_vit_block_spec() for _ in range(n_blocks)],
        "norm": {"scale": P(), "bias": P()},
    }


def head_param_spec(head_type: str) -> Any:
    if head_type == "moe":
        # Expert parallelism: the stacked expert axis shards over 'model',
        # so each device holds/computes only its experts; the router is
        # tiny and replicated.  The one-hot combine in moe_head_apply
        # contracts over the expert axis -> GSPMD inserts the all-reduce.
        ex = {"kernel": P("model", None, None), "bias": P("model", None)}
        return {"router": {"kernel": P(), "bias": P()},
                "layer_1": ex, "layer_2": ex, "layer_3": ex}
    # The MLP/Linear heads are tiny (384->200->100->C); replicate them.
    layers = ["layer_1"] if head_type == "linear" else ["layer_1", "layer_2",
                                                        "layer_3"]
    return {name: {"kernel": P(), "bias": P()} for name in layers}


def batch_spec() -> P:
    return P("data")


def data_sharding(n_devices: Optional[int] = None) -> NamedSharding:
    """Batch-axis (DP) sharding over a pure-data mesh of the first n devices
    — the placement used by sharded serving, feature precompute, and
    DP-exported artifacts."""
    return NamedSharding(make_mesh(n_devices, model_axis=1), P("data"))


def host_slab_to_global(local: Any, sharding: NamedSharding) -> Any:
    """Multi-host feed: each process passes the rows for ITS devices; the
    result is one global array sharded per ``sharding`` whose value is the
    concatenation of every host's slab.  The standard way to drive an SPMD
    step from per-host data loaders."""
    from jax.experimental import multihost_utils
    return multihost_utils.host_local_array_to_global_array(
        np.asarray(local), sharding.mesh, sharding.spec)


def shard_params(params: Any, spec: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, spec,
        is_leaf=lambda x: isinstance(x, P))


def named(mesh: Mesh, spec) -> NamedSharding:
    return NamedSharding(mesh, spec)


def fsdp_spec(tree: Any, mesh: Mesh, axis: str = "data") -> Any:
    """PartitionSpec tree for FSDP (ZeRO-3) storage: each array leaf's
    FIRST dimension divisible by the ``axis`` size shards over that axis;
    scalars and indivisible leaves replicate.

    Applied as entry/exit constraints on params, gradients, and optimizer
    state in one jitted train step (see train/loop.py:make_train_step
    ``fsdp_mesh``), GSPMD materializes the full FSDP dataflow on its own:
    parameters and Adam moments LIVE 1/N-per-device, the forward/backward
    ALL-GATHER each weight where it is used (transient, freed after the
    op), and the data-parallel gradient REDUCE-SCATTERS straight into the
    sharded update.  The same shape-driven rule covers the optimizer state
    (moments mirror their params' shapes; odd leaves like the step count
    fall back to replicated), so no optax state introspection is needed.
    Reference: single-GPU, none of this (utils.py:467-499 is dormant DDP);
    this is the ZeRO-3/FSDP member of the parallelism matrix
    (docs/SCALING.md).
    """
    n = mesh.shape[axis]

    def spec_of(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return P()
        for d, s in enumerate(x.shape):
            if s >= n and s % n == 0:
                parts: list = [None] * x.ndim
                parts[d] = axis
                return P(*parts)
        return P()

    return jax.tree.map(spec_of, tree)


def fsdp_constrain(tree: Any, mesh: Mesh, axis: str = "data") -> Any:
    """with_sharding_constraint every leaf of ``tree`` to its
    :func:`fsdp_spec` placement (inside-jit use)."""
    spec = fsdp_spec(tree, mesh, axis)
    return jax.tree.map(
        lambda x, s: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, s)),
        tree, spec, is_leaf=lambda x: isinstance(x, P))


def fsdp_place(tree: Any, mesh: Mesh, axis: str = "data") -> Any:
    """device_put every ARRAY leaf of ``tree`` straight to its
    :func:`fsdp_spec` placement (outside-jit use); non-array leaves (python
    config scalars like the DINO head's ``_meta``) pass through.

    This is the missing half of FSDP for models that do not fit one
    device: the train step's entry constraint reshards state that already
    materialized, but freshly-initialized or checkpoint-restored state
    would otherwise sit UNSHARDED on the default device first and OOM
    before the first step.  Placing at init/restore keeps the whole
    lifecycle 1/N-per-device.  On multi-host the host value must be
    identical on every process (it is: seeded init / a checkpoint read
    from the shared FS)."""
    spec = fsdp_spec(tree, mesh, axis)
    return jax.tree.map(
        lambda x, s: (jax.device_put(x, NamedSharding(mesh, s))
                      if hasattr(x, "ndim") else x),
        tree, spec, is_leaf=lambda x: isinstance(x, P))


def gather_if_sharded(tree: Any) -> Any:
    """Materialize a host-local copy of every leaf: leaves whose shards
    span other processes gather collectively (every rank must call this —
    it is a collective in that case); fully-addressable leaves (single
    host, or host-local state restored from disk) pass through UNCHANGED.

    The per-leaf ``is_fully_addressable`` guard matters: feeding an
    already-host-local tree to ``process_allgather(tiled=True)`` would
    take jax's fully-addressable branch, which CONCATENATES the same
    value across processes instead of reassembling shards — silently
    garbling e.g. a resumed-and-already-finished run's export.  Python
    scalars (``_meta`` config) pass through untouched rather than being
    expanded to (n_proc,) arrays."""
    leaves = [l for l in jax.tree.leaves(tree) if isinstance(l, jax.Array)]
    if not any(not l.is_fully_addressable for l in leaves):
        return tree
    from jax.experimental import multihost_utils

    def gather(l):
        if isinstance(l, jax.Array) and not l.is_fully_addressable:
            return multihost_utils.process_allgather(l, tiled=True)
        return l

    return jax.tree.map(gather, tree)


class _SpecBox:
    """Opaque wrapper so a PartitionSpec (a tuple subclass, hence a pytree
    *container*) survives as a single leaf through optax.tree_map_params."""

    __slots__ = ("spec",)

    def __init__(self, spec):
        self.spec = spec


def zero_constrain(tree: Any, mesh: Mesh, axis: str = "data",
                   param_spec: Any = None, optimizer: Any = None) -> Any:
    """ZeRO-1 optimizer-state sharding as sharding *constraints*.

    Pins, for each array leaf, one dimension divisible by the ``axis``
    size (the first such dimension the leaf's param sharding leaves free)
    to that mesh axis; scalars and indivisible leaves stay replicated.
    Applied to the optimizer state inside a jitted train step (both the
    incoming state and the updated one), GSPMD then materializes the
    classic sharded-optimizer dataflow on its own: Adam moments live
    1/N-per-device, the data-parallel gradient REDUCE-SCATTERS into the
    moment/update math (instead of all-reducing a full replica onto every
    chip), and the parameter delta ALL-GATHERS back — the ZeRO-1 memory
    story with zero hand-written collectives (for FULL state sharding —
    params too — see :func:`fsdp_spec` / ZeRO-3; the reference has
    neither: its DDP scaffolding is dormant, utils.py:467-499).

    ``param_spec`` + ``optimizer`` (both or neither): the PartitionSpec
    tree of the params the moments mirror, mapped onto the state via
    ``optax.tree_map_params``.  With it, a TP-sharded moment (e.g. the
    row-parallel proj/fc2 kernels under DPxTP, spec ('model', None))
    keeps its 'model' axis on its own dim and takes 'data' on a FREE dim
    — ZeRO composes with the partitioner instead of evicting the TP
    placement.  Without it, dims other than the pinned one are left
    UNCONSTRAINED for GSPMD to place (fine under pure DP, where params
    are replicated).
    """
    n = mesh.shape[axis]

    def pin(x, sp=None):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        taken = tuple(sp) if sp is not None else ()
        taken = taken + (None,) * (x.ndim - len(taken))
        for d, s in enumerate(x.shape):
            if s >= n and s % n == 0 and taken[d] is None:
                spec = [t if t is not None else P.UNCONSTRAINED
                        for t in taken]
                if sp is None:
                    spec = [P.UNCONSTRAINED] * x.ndim
                spec[d] = axis
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P(*spec)))
        return x

    if param_spec is None or optimizer is None:
        return jax.tree.map(pin, tree)

    import optax
    boxed = jax.tree.map(_SpecBox, param_spec,
                         is_leaf=lambda x: isinstance(x, P))
    return optax.tree_map_params(optimizer,
                                 lambda x, b: pin(x, b.spec), tree, boxed)
