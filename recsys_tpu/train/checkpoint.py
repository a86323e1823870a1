"""Checkpoint save/restore for train state.

The reference comments its ModelCheckpoint blocks out everywhere
(/root/reference/src/ctr/fm/train.py:52-55 etc.); this provides real
checkpointing: the full TrainState pytree (params, batch_stats, opt_state,
step) serialised with flax msgpack.  Sharded arrays are gathered to host on
save and re-sharded by the caller's device_put on restore — table-shard
parallel save is layered on top in recsys_tpu/parallel for the sharded
embedding engine.
"""
from __future__ import annotations

import os

import flax.serialization
import jax


def save(path: str, state) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host_state = jax.device_get(state)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(host_state))


def restore(path: str, template):
    """Restore into the structure of ``template`` (an initialised state)."""
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


class BestCheckpointer:
    """Keeps the best-metric checkpoint on disk (lower is better by default)."""

    def __init__(self, path: str, mode: str = "min"):
        self.path = path
        self.mode = mode
        self.best: float | None = None

    def update(self, metric: float, state) -> bool:
        better = (
            self.best is None
            or (self.mode == "min" and metric < self.best)
            or (self.mode == "max" and metric > self.best)
        )
        if better:
            self.best = metric
            save(self.path, state)
        return better
