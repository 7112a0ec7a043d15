"""Structured metrics logging (host side).

Replacement for the reference's pickle-append streams and flush-prints
(SURVEY.md §5.5): solver telemetry arrives as stacked device arrays
(``ILQRLogs``) and is written as JSONL records or compressed npz shards —
replayable, appendable, and greppable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np


class JsonlLogger:
    """Append-only JSONL metrics writer with automatic timestamps."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, record: Dict[str, Any]) -> None:
        payload = {"ts": time.time(), **_to_jsonable(record)}
        with open(self.path, "a") as f:
            f.write(json.dumps(payload) + "\n")

    def read(self):
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]


def _to_jsonable(value):
    if isinstance(value, dict):
        return {k: _to_jsonable(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_to_jsonable(v) for v in value]
    if hasattr(value, "item") and getattr(value, "ndim", 1) == 0:
        return value.item()
    if hasattr(value, "tolist"):
        return np.asarray(value).tolist()
    return value


def solver_log_summary(logs, valid_only: bool = True) -> Dict[str, Any]:
    """Reduce an ``ILQRLogs`` pytree to per-iteration scalars for JSONL."""
    valid = np.asarray(logs.valid)
    idx = np.nonzero(valid)[0] if valid_only else np.arange(valid.size)
    return {
        "iterations": int(valid.sum()),
        "cost": np.asarray(logs.cost)[idx].tolist(),
        "new_cost": np.asarray(logs.new_cost)[idx].tolist(),
        "alpha": np.asarray(logs.alpha)[idx].tolist(),
        "found_update": np.asarray(logs.found_update)[idx].astype(bool).tolist(),
    }


def save_dataset_shard(path: str, x_data, kk_data, shard_index: Optional[int] = None) -> str:
    """Write a compressed npz dataset shard (replaces pickle-append streams,
    cartpole training_data_collection.py:197-214). Idempotent per shard —
    rerunnable collection jobs (SURVEY.md §5.3)."""
    if shard_index is not None:
        base, ext = os.path.splitext(path)
        path = f"{base}_{shard_index:05d}{ext or '.npz'}"
    np.savez_compressed(path, x_data=np.asarray(x_data), kk_data=np.asarray(kk_data))
    return path


def load_dataset_shards(paths):
    """Concatenate npz shards back into one dataset (merge step equivalent,
    training_data_collection.py:265-290 — without deleting sources)."""
    xs, ks = [], []
    for p in paths:
        with np.load(p) as data:
            xs.append(data["x_data"])
            ks.append(data["kk_data"])
    return np.concatenate(xs, axis=0), np.concatenate(ks, axis=0)
