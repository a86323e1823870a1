import json
import os
import tempfile

import pytest

from recsys_tpu.core.config import ExperimentConfig, load_config


def test_defaults_match_reference_protocol():
    cfg = ExperimentConfig()
    assert cfg.learning_rate == 1e-3
    assert cfg.batch_size == 512
    assert cfg.early_stopping_patience == 1


def test_file_and_kwarg_overrides():
    path = os.path.join(tempfile.mkdtemp(), "exp.json")
    with open(path, "w") as f:
        json.dump({"task": "sasrec", "epochs": 3}, f)
    cfg = load_config(path, learning_rate=5e-4)
    assert cfg.task == "sasrec" and cfg.epochs == 3
    assert cfg.learning_rate == 5e-4
    assert cfg.batch_size == 512  # untouched default


def test_round_trip_and_unknown_keys():
    path = os.path.join(tempfile.mkdtemp(), "exp.json")
    ExperimentConfig(model="dlrm").to_json(path)
    assert load_config(path).model == "dlrm"
    with pytest.raises(ValueError):
        ExperimentConfig.from_dict({"nope": 1})
