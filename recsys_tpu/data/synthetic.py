"""Synthetic dataset generators.

Serve the same role as the reference's random-frame fixtures for
ESMM/MMoE/DIN (/root/reference/src/ctr/esmm/train.py:25-72,
/root/reference/src/ctr/mmoe/train.py:25-72, /root/reference/src/ctr/din/
train.py:38-75, /root/reference/src/match/utils/create_data_util.py:21-105)
— but with *planted structure*: labels are Bernoulli draws from a hidden
random linear model over the features, so training has signal and tests can
assert AUC > 0.5 on held-out data.
"""
from __future__ import annotations

import numpy as np

from recsys_tpu.core.features import (
    DenseFeature,
    FeatureSchema,
    SparseFeature,
    VarLenSparseFeature,
)


def synthetic_ctr(
    num_examples: int = 8192,
    num_dense: int = 13,
    num_sparse: int = 26,
    vocab_size: int = 100,
    embed_dim: int = 8,
    seed: int = 0,
    signal: float = 1.0,
):
    """Criteo-shaped synthetic CTR data with a planted logistic model."""
    rng = np.random.default_rng(seed)
    dense = rng.random((num_examples, num_dense)).astype(np.float32)
    sparse = rng.integers(
        0, vocab_size, (num_examples, num_sparse), dtype=np.int32
    )

    w_dense = rng.normal(0, 1, num_dense)
    w_sparse = rng.normal(0, 1, (num_sparse, vocab_size))
    logits = dense @ w_dense + w_sparse[np.arange(num_sparse), sparse].sum(-1)
    logits = signal * (logits - logits.mean()) / (logits.std() + 1e-9)
    label = (rng.random(num_examples) < _sigmoid(logits)).astype(np.float32)

    schema = FeatureSchema(
        dense=[DenseFeature(f"I{i}") for i in range(num_dense)],
        sparse=[
            SparseFeature(f"C{i}", vocab_size, embed_dim)
            for i in range(num_sparse)
        ],
    )
    return schema, {"dense": dense, "sparse": sparse, "label": label}


def synthetic_multitask(
    num_examples: int = 8192,
    num_sparse: int = 8,
    vocab_size: int = 50,
    embed_dim: int = 8,
    tasks: tuple = ("ctr", "cvr"),
    seed: int = 0,
):
    """Two-task synthetic data (ESMM/MMoE/PLE fixtures) with correlated tasks."""
    rng = np.random.default_rng(seed)
    sparse = rng.integers(
        0, vocab_size, (num_examples, num_sparse), dtype=np.int32
    )
    shared = rng.normal(0, 1, (num_sparse, vocab_size))
    base = shared[np.arange(num_sparse), sparse].sum(-1)
    base = (base - base.mean()) / (base.std() + 1e-9)
    labels = {}
    for t, name in enumerate(tasks):
        own = rng.normal(0, 1, (num_sparse, vocab_size))
        z = own[np.arange(num_sparse), sparse].sum(-1)
        z = (z - z.mean()) / (z.std() + 1e-9)
        logits = 0.7 * base + 0.7 * z
        labels[name] = (rng.random(num_examples) < _sigmoid(logits)).astype(
            np.float32
        )
    schema = FeatureSchema(
        sparse=[
            SparseFeature(f"C{i}", vocab_size, embed_dim)
            for i in range(num_sparse)
        ]
    )
    data = {"sparse": sparse, "labels": labels}
    return schema, data


def synthetic_sequence(
    num_examples: int = 4096,
    num_items: int = 200,
    max_len: int = 20,
    embed_dim: int = 8,
    seed: int = 0,
):
    """DIN-style behaviour-sequence data: the label is 1 when the candidate
    item's hidden cluster matches the majority cluster of the history."""
    rng = np.random.default_rng(seed)
    clusters = rng.integers(0, 8, num_items + 1)  # item -> hidden cluster
    hist = rng.integers(1, num_items + 1, (num_examples, max_len))
    lengths = rng.integers(1, max_len + 1, num_examples)
    mask = np.arange(max_len)[None, :] < lengths[:, None]
    hist = np.where(mask, hist, 0).astype(np.int32)
    target = rng.integers(1, num_items + 1, num_examples).astype(np.int32)

    hist_cl = clusters[hist]
    maj = []
    for i in range(num_examples):
        counts = np.bincount(hist_cl[i][mask[i]], minlength=8)
        maj.append(counts.argmax())
    match = clusters[target] == np.asarray(maj)
    noise = rng.random(num_examples) < 0.1
    label = (match ^ noise).astype(np.float32)

    schema = FeatureSchema(
        sparse=[SparseFeature("item", num_items + 1, embed_dim)],
        varlen=[
            VarLenSparseFeature(
                "hist_item",
                num_items + 1,
                embed_dim,
                max_len=max_len,
                shared_with="item",
            )
        ],
    )
    data = {
        "sparse": target[:, None],
        "hist": hist,
        "label": label,
    }
    return schema, data


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))
