"""Mid-training resume: save/restore the full train state.

Upgrades the reference's dormant restart_from_checkpoint (utils.py:152-184)
into a live subsystem: params + optimizer state + RNG + loop counters go into
one npz so an interrupted run continues exactly where it stopped.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from dino_tpu.checkpointing.io import flatten_params, unflatten_params

_SENTINEL_NONE = "__none__"


def save_train_state(path: str, state: Dict[str, Any],
                     run_variables: Optional[Dict[str, Any]] = None) -> None:
    """state: pytree dict (params/opt_state/...); run_variables: scalars
    (epoch, step, best metric)."""
    flat = {"state/" + k: np.asarray(v)
            for k, v in flatten_params(state).items()}
    for k, v in (run_variables or {}).items():
        flat["run/" + k] = np.asarray(v if v is not None else _SENTINEL_NONE)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def restart_from_checkpoint(path: str, run_variables: Optional[Dict] = None,
                            **pytrees) -> Dict[str, Any]:
    """Restore named pytrees in place and fill run_variables
    (reference-compatible call shape: restart_from_checkpoint(p, run_vars,
    model=..., optimizer=...)).

    Returns {name: restored_pytree}; missing file leaves inputs untouched,
    matching the reference's tolerant behavior.
    """
    out = dict(pytrees)
    if not os.path.isfile(path):
        print(f"Pre-trained weights not found at {path}")
        return out
    print(f"Found checkpoint at {path}")
    with np.load(path, allow_pickle=False) as z:
        state_flat = {k[len("state/"):]: z[k] for k in z.files
                      if k.startswith("state/")}
        run_flat = {k[len("run/"):]: z[k] for k in z.files
                    if k.startswith("run/")}
    state = unflatten_params(state_flat)
    for name in pytrees:
        if name in state:
            out[name] = jax.tree.map(lambda x: x, state[name])
            print(f"=> loaded '{name}' from checkpoint: '{path}'")
        else:
            print(f"=> failed to load '{name}' from checkpoint: '{path}'")
    if run_variables is not None:
        for k in list(run_variables.keys()):
            if k in run_flat:
                v = run_flat[k]
                if v.dtype.kind in "US" and str(v) == _SENTINEL_NONE:
                    run_variables[k] = None
                elif v.dtype.kind in "US":
                    run_variables[k] = str(v)
                else:
                    run_variables[k] = v.item() if v.ndim == 0 else v
    return out
