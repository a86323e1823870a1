"""CLI smoke tests: each task runs end-to-end on tiny settings."""
import numpy as np
import pytest

from recsys_tpu import cli


def test_ctr_task_runs(capsys):
    cli.main(["ctr", "--model", "fm", "--epochs", "1", "--batch-size", "512",
              "--lr", "1e-2"])
    out = capsys.readouterr().out
    assert "test AUC:" in out
    auc = float(out.rsplit("test AUC:", 1)[1].strip())
    assert 0.4 < auc <= 1.0


def test_match_task_runs(capsys):
    cli.main(["match", "--model", "dssm", "--epochs", "2"])
    out = capsys.readouterr().out
    assert "recall@10:" in out


def test_multitask_task_runs(capsys):
    cli.main(["multitask", "--model", "esmm", "--epochs", "1"])
    out = capsys.readouterr().out
    assert "ctr AUC:" in out and "ctcvr AUC:" in out


def test_cli_ctr_sparse_optimizer_and_bf16(capsys):
    from recsys_tpu import cli

    cli.main([
        "ctr", "--model", "dlrm", "--epochs", "2",
        "--embedding-optimizer", "rowwise_adagrad", "--bf16",
    ])
    assert "test AUC" in capsys.readouterr().out
