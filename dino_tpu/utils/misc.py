"""Small utilities (reference utils.py parity: accuracy :502-509,
fix_random_seeds :215-221, get_sha :403-420, bool_flag :201-212,
has_batchnorms :646-651)."""
from __future__ import annotations

import argparse
import os
import subprocess
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def accuracy(output, target, topk: Sequence[int] = (1,)):
    """Top-k accuracy (percent) of logits ``output`` vs int ``target``."""
    output = jnp.asarray(output)
    target = jnp.asarray(target)
    maxk = max(topk)
    batch_size = target.shape[0]
    idx = jnp.argsort(output, axis=1)[:, ::-1][:, :maxk]  # (B, maxk)
    correct = idx == target[:, None]
    return [float(correct[:, :k].sum()) * 100.0 / batch_size for k in topk]


def fix_random_seeds(seed: int = 31) -> jax.Array:
    """Seed numpy and return a jax PRNGKey (the functional analog of
    torch.manual_seed)."""
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def get_sha() -> str:
    """Repo provenance string: sha, diff status, branch."""
    cwd = os.path.dirname(os.path.abspath(__file__))

    def _run(cmd):
        return subprocess.check_output(cmd, cwd=cwd).decode("ascii").strip()

    sha, diff, branch = "N/A", "clean", "N/A"
    try:
        sha = _run(["git", "rev-parse", "HEAD"])
        subprocess.check_output(["git", "diff"], cwd=cwd)
        diff = _run(["git", "diff-index", "HEAD"])
        diff = "has uncommitted changes" if diff else "clean"
        branch = _run(["git", "rev-parse", "--abbrev-ref", "HEAD"])
    except Exception:
        pass
    return f"sha: {sha}, status: {diff}, branch: {branch}"


def bool_flag(s: str) -> bool:
    """argparse type for boolean flags (reference utils.py:201-212)."""
    FALSY = {"off", "false", "0"}
    TRUTHY = {"on", "true", "1"}
    if s.lower() in FALSY:
        return False
    if s.lower() in TRUTHY:
        return True
    raise argparse.ArgumentTypeError("invalid value for a boolean flag")


def has_batchnorms(params: Any) -> bool:
    """True if a param pytree carries batch-norm state (running stats keys).

    Functional analog of the reference's module scan (utils.py:646-651); our
    ViT has none, ResNet params carry 'mean'/'var' leaves.
    """
    def is_bn_dict(node: Any) -> bool:
        # a BN param group carries BOTH running stats (plus scale/bias);
        # matching on a lone 'mean'/'var' leaf would false-positive on
        # optimizer states and metric pytrees
        return (isinstance(node, dict) and "mean" in node and "var" in node)

    def walk(node: Any) -> bool:
        if is_bn_dict(node):
            return True
        if isinstance(node, dict):
            return any(walk(v) for v in node.values())
        if isinstance(node, (list, tuple)):
            return any(walk(v) for v in node)
        return False

    return walk(params)
