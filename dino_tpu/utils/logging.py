"""Pluggable experiment loggers.

The reference logs metrics/params/confusion-matrices/checkpoints to Comet when
$COMET_API_KEY is set (run_experiment.py:67-75, pl_torch_modules.py:326-332).
Here the default sink is a JSONL file (offline-first, greppable); a
Comet-shaped adapter engages only if comet_ml is importable and a tag is given.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class JSONLLogger:
    """Append-only JSONL metrics log with the Comet-adapter method surface."""

    def __init__(self, path: str, tag: Optional[str] = None):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self.tag = tag
        self._write({"event": "start", "tag": tag})

    def _write(self, record: Dict[str, Any]) -> None:
        record = dict(record, ts=time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        self._write({"event": "metrics", "step": step, **metrics})

    def log_params(self, params: Dict[str, Any]) -> None:
        self._write({"event": "params", **params})

    def log_confusion_matrix(self, cm, title: str, step: int,
                             labels=None, file_name=None) -> None:
        self._write({"event": "confusion_matrix", "title": title,
                     "step": step, "labels": list(labels) if labels else None,
                     "file_name": file_name,
                     "matrix": [list(map(int, row)) for row in cm]})

    def log_asset(self, path: str) -> None:
        self._write({"event": "asset", "path": os.path.abspath(path)})


class CometAdapter:  # pragma: no cover - requires comet_ml + network
    def __init__(self, tag: str, project: str = "duck"):
        import comet_ml
        self.exp = comet_ml.Experiment(
            api_key=os.environ.get("COMET_API_KEY"), project_name=project)
        self.exp.add_tag(tag)

    def log_metrics(self, metrics, step):
        self.exp.log_metrics(metrics, step=step)

    def log_params(self, params):
        self.exp.log_parameters(params)

    def log_confusion_matrix(self, cm, title, step, labels=None,
                             file_name=None):
        # the reference logs per-epoch CMs from per-patch probabilities
        # (pl_torch_modules.py:326-330); Comet derives the same count
        # matrix from them, so passing our on-device count matrix plus the
        # per-epoch file_name yields the identical Comet artifact without
        # hauling every probability to the host
        self.exp.log_confusion_matrix(
            matrix=cm, title=title, labels=labels,
            file_name=file_name or f"{title}_epoch_{step}.json")

    def log_asset(self, path):
        self.exp.log_asset(path)


def make_logger(tag: Optional[str], write_path: str,
                params: Optional[Dict[str, Any]] = None):
    """Comet when available + tagged (reference parity), else JSONL."""
    logger = None
    if tag is not None:
        try:
            logger = CometAdapter(tag)
        except Exception:
            logger = JSONLLogger(os.path.join(write_path, "metrics.jsonl"),
                                 tag=tag)
    else:
        logger = JSONLLogger(os.path.join(write_path, "metrics.jsonl"))
    if params:
        logger.log_params(params)
    return logger
