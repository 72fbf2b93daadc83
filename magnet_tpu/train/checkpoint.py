"""Checkpointing with best/last policies and real resume support.

The reference relies on Lightning ModelCheckpoint (monitor val_mae_loss,
save_top_k=1, save_last — configs/callbacks/default.yaml:1-11) but never
consumes its ``ckpt_path`` (run.py:52-54); here resume is first-class.

Format: flax.serialization msgpack for the param/opt pytrees + a JSON
sidecar with step/epoch/metric.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
from flax import serialization


def save_checkpoint(path: str, state: dict[str, Any], meta: dict[str, Any]):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    state = jax.device_get(serialization.to_state_dict(state))
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(state))
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


def load_checkpoint(path: str, target: Optional[dict] = None):
    with open(path, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    if target is not None:
        state = serialization.from_state_dict(target, state)
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return state, meta


class CheckpointManager:
    """best (min monitored metric) + last, like the reference callbacks."""

    def __init__(self, dirpath: str, monitor: str = "val_mae_loss"):
        self.dirpath = dirpath
        self.monitor = monitor
        self.best = float("inf")
        self.best_path = os.path.join(dirpath, "best.msgpack")
        self.last_path = os.path.join(dirpath, "last.msgpack")

    def update(self, state: dict, epoch: int, metrics: dict) -> bool:
        meta = {"epoch": epoch, **{k: float(v) for k, v in metrics.items()}}
        save_checkpoint(self.last_path, state, meta)
        val = float(metrics.get(self.monitor, float("inf")))
        if val < self.best:
            self.best = val
            save_checkpoint(self.best_path, state, meta)
            return True
        return False
