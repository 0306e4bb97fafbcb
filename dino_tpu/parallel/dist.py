"""Multi-host runtime helpers (the live replacement for the reference's
dormant NCCL scaffolding, utils.py:423-499).

jax.distributed.initialize + process-rank helpers + psum-style metric
reduction over the ICI/DCN mesh; host-0-only printing/saving.
"""
from __future__ import annotations

import builtins
import os
from typing import Dict, Optional

import jax
import numpy as np


def init_distributed_mode(coordinator_address: Optional[str] = None,
                          num_processes: Optional[int] = None,
                          process_id: Optional[int] = None) -> None:
    """Initialize the multi-host JAX runtime.

    Rank discovery mirrors the reference (env RANK/WORLD_SIZE, then Slurm,
    utils.py:469-476) but feeds jax.distributed instead of NCCL.  On a TPU pod
    slice with no explicit args, jax.distributed.initialize() auto-detects.
    """
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    elif "MASTER_ADDR" in os.environ:
        port = os.environ.get("MASTER_PORT", "12355")
        kwargs["coordinator_address"] = f"{os.environ['MASTER_ADDR']}:{port}"
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    elif "WORLD_SIZE" in os.environ:
        kwargs["num_processes"] = int(os.environ["WORLD_SIZE"])
    if process_id is not None:
        kwargs["process_id"] = process_id
    elif "RANK" in os.environ:
        kwargs["process_id"] = int(os.environ["RANK"])
    elif "SLURM_PROCID" in os.environ:
        kwargs["process_id"] = int(os.environ["SLURM_PROCID"])

    jax.distributed.initialize(**kwargs)
    setup_for_distributed(is_main_process())
    print(f"| distributed init (rank {get_rank()}/{get_world_size()}): "
          f"{kwargs.get('coordinator_address', 'auto')}", flush=True)


def is_dist_avail_and_initialized() -> bool:
    return jax.process_count() > 1


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def save_on_master(save_fn, *args, **kwargs):
    """Run a save callback only on host 0 (reference save_on_master)."""
    if is_main_process():
        return save_fn(*args, **kwargs)
    return None


def setup_for_distributed(is_master: bool) -> None:
    """Suppress print on non-master hosts unless force=True."""
    builtin_print = builtins.print

    def print_(*args, **kwargs):
        force = kwargs.pop("force", False)
        if is_master or force:
            builtin_print(*args, **kwargs)

    builtins.print = print_


def agree_across_hosts(name: str, value) -> np.ndarray:
    """Allgather every rank's value, fail fast on EVERY rank if any two
    disagree, and return host 0's value.

    Resume decisions depend on what each host sees on disk; host 0 alone
    writes the resume/checkpoint files, so on a non-shared filesystem other
    ranks would silently diverge (start at epoch 0 while host 0 starts at
    k+1 — one SPMD program fed different schedules).  This turns that into
    an immediate, explicit error; multi-host training requires a shared
    filesystem (docs/SCALING.md).

    Allgather rather than broadcast-and-check-locally: with a broadcast,
    host 0 compares its value against its own copy and can never detect the
    mismatch — the other ranks raise while host 0 sails into the epoch loop
    and hangs at the first collective.  With the allgather every rank sees
    every value, so the writing host raises too.
    """
    # f32: the gather goes through a jax.Array, which truncates f64 to
    # f32 (x64 disabled) — every rank must see the same rounding or equal
    # file contents would spuriously "disagree"
    local = np.atleast_1d(np.asarray(value, np.float32))
    if get_world_size() < 2:
        return local
    from jax.experimental import multihost_utils
    gathered = np.asarray(multihost_utils.process_allgather(local)
                          ).astype(np.float32)  # (world, *local.shape)
    bad = [r for r in range(gathered.shape[0])
           if not np.array_equal(gathered[r], gathered[0])]
    if bad:
        raise RuntimeError(
            f"hosts disagree on {name} (this is rank {get_rank()}; ranks "
            f"{bad} differ from host 0: "
            f"{ {r: gathered[r].tolist() for r in [0] + bad} }): multi-host "
            "resume/checkpointing requires a filesystem shared by every "
            "host (docs/SCALING.md)")
    return gathered[0]


def any_across_hosts(flag: bool) -> bool:
    """True on EVERY rank iff the flag is set on any rank.

    For decisions that must be taken in lockstep by one SPMD program —
    e.g. a preemption SIGTERM that the scheduler delivers to each host at
    a slightly different moment: without agreement, one host breaks out of
    the step loop while another dispatches the next step's collectives and
    the job deadlocks.  Every rank must call this at the same point (it is
    itself a collective); single-process returns the flag unchanged.
    """
    if get_world_size() < 2:
        return bool(flag)
    from jax.experimental import multihost_utils
    gathered = np.asarray(multihost_utils.process_allgather(
        np.atleast_1d(np.asarray(flag, np.int32))))
    return bool(gathered.any())


def reduce_dict(input_dict: Dict[str, float], average: bool = True
                ) -> Dict[str, float]:
    """Sum (or average) a dict of scalars across hosts
    (reference utils.py:286-310)."""
    world_size = get_world_size()
    if world_size < 2:
        return dict(input_dict)
    from jax.experimental import multihost_utils
    names = sorted(input_dict.keys())
    values = np.array([float(input_dict[k]) for k in names], np.float64)
    gathered = np.asarray(multihost_utils.process_allgather(values))
    total = gathered.reshape(world_size, -1).sum(axis=0)
    if average:
        total = total / world_size
    return {k: float(v) for k, v in zip(names, total)}
