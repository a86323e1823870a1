"""Typed experiment configuration.

Replaces the reference's hardcoded per-script hyperparameters and personal
data paths (SURVEY.md §5 config row; e.g. /root/reference/src/ctr/fm/
train.py:25-34) with one dataclass per experiment: defaults in code, file
overrides from JSON, final overrides from CLI flags.

    cfg = ExperimentConfig(task="ctr", model="deepfm")
    cfg = load_config("exp.json", task="ctr")      # file + kwargs override
    cfg.to_json("exp.json")
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any


@dataclasses.dataclass
class ExperimentConfig:
    # what to run
    task: str = "ctr"            # ctr | din | multitask | match | ncf | sasrec | youtube | mind
    model: str = "fm"
    # data
    data_path: str | None = None
    embed_dim: int = 8
    maxlen: int = 50
    sample_num: int = 0
    # training protocol (reference defaults: Adam 1e-3, bs 512, ES patience 1)
    batch_size: int = 512
    epochs: int = 10
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    validation_split: float = 0.1
    early_stopping_patience: int | None = 1
    seed: int = 0
    # infrastructure
    mesh_data: int | None = None   # None -> all devices
    mesh_model: int = 1
    checkpoint_path: str | None = None
    log_jsonl: str | None = None
    # optimizer / precision extensions (no reference analogue)
    embedding_optimizer: str | None = None  # lazy_adam | rowwise_adagrad
    bf16_compute: bool = False

    def override(self, **kwargs) -> "ExperimentConfig":
        """New config with non-None kwargs applied."""
        updates = {k: v for k, v in kwargs.items() if v is not None}
        return dataclasses.replace(self, **updates)

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ExperimentConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        unknown = set(d) - fields
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        return cls(**d)


def load_config(path: str | None = None, **overrides) -> ExperimentConfig:
    """Defaults <- JSON file (optional) <- keyword overrides."""
    cfg = ExperimentConfig()
    if path is not None:
        with open(path) as f:
            cfg = ExperimentConfig.from_dict({**dataclasses.asdict(cfg),
                                              **json.load(f)})
    return cfg.override(**overrides)
