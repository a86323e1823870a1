"""Evaluation metrics: streaming binned AUC, HR@K, NDCG@K, recall@K.

Replaces the reference's Keras ``AUC`` metric (/root/reference/src/ctr/fm/
train.py:50) and NCF's host-side HR/NDCG loop (/root/reference/src/match/
ncf/train.py:11-26) with jit-friendly, shard-friendly implementations:

* AUC is accumulated as two fixed-size histograms (positives / negatives over
  score bins) so shards can merge with a ``psum`` and no per-example gather
  to the host is ever needed (SURVEY.md §5 metrics row).  The final AUC is
  the trapezoidal area over the cumulative TPR/FPR — the same estimator
  Keras' bucketed AUC uses.
* HR@K / NDCG@K follow NCF's 101-candidate ranked protocol exactly: the
  positive's rank among [pos, negs] decides hit and 1/log2(rank+2) gain.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class AucAccumulator:
    """Streaming AUC over probability-like scores in [0, 1]."""

    def __init__(self, num_bins: int = 2048):
        self.num_bins = num_bins
        self.pos = jnp.zeros((num_bins,), jnp.float32)
        self.neg = jnp.zeros((num_bins,), jnp.float32)

    def update(self, scores: jnp.ndarray, labels: jnp.ndarray, weights=None):
        p, n = auc_histogram(scores, labels, self.num_bins, weights)
        self.pos = self.pos + p
        self.neg = self.neg + n

    def result(self) -> float:
        return float(auc_from_histogram(self.pos, self.neg))


def auc_histogram(
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    num_bins: int = 2048,
    weights: jnp.ndarray | None = None,
):
    """Bin scores (sigmoid-space [0,1]) into per-class histograms.

    Returns (pos_hist, neg_hist), each (num_bins,).  jit/psum-safe.
    """
    scores = jnp.clip(scores, 0.0, 1.0)
    bins = jnp.minimum((scores * num_bins).astype(jnp.int32), num_bins - 1)
    labels = labels.astype(jnp.float32)
    w = jnp.ones_like(labels) if weights is None else weights.astype(jnp.float32)
    pos = jnp.zeros((num_bins,), jnp.float32).at[bins].add(labels * w)
    neg = jnp.zeros((num_bins,), jnp.float32).at[bins].add((1.0 - labels) * w)
    return pos, neg


def auc_from_histogram(pos: jnp.ndarray, neg: jnp.ndarray) -> jnp.ndarray:
    """Trapezoidal AUC from per-class score histograms.

    Single-class inputs (no positives or no negatives) return the
    conventional 0.5, matching :func:`auc_exact`, instead of a silent 0.
    """
    # Sweep thresholds from high score to low: cumulative TP/FP counts.
    tp = jnp.cumsum(pos[::-1])
    fp = jnp.cumsum(neg[::-1])
    total_pos = jnp.maximum(tp[-1], 1.0)
    total_neg = jnp.maximum(fp[-1], 1.0)
    tpr = jnp.concatenate([jnp.zeros((1,)), tp / total_pos])
    fpr = jnp.concatenate([jnp.zeros((1,)), fp / total_neg])
    area = jnp.sum((fpr[1:] - fpr[:-1]) * 0.5 * (tpr[1:] + tpr[:-1]))
    degenerate = (tp[-1] == 0.0) | (fp[-1] == 0.0)
    return jnp.where(degenerate, 0.5, area)


def auc(scores, labels, num_bins: int = 8192) -> float:
    """One-shot AUC on host or device arrays."""
    pos, neg = auc_histogram(jnp.asarray(scores), jnp.asarray(labels), num_bins)
    return float(auc_from_histogram(pos, neg))


def auc_exact(scores, labels) -> float:
    """Exact Mann-Whitney AUC (numpy; for tests / small eval sets)."""
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels)
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    # average ranks for ties
    sorted_scores = scores[order]
    i = 0
    while i < len(scores):
        j = i
        while j + 1 < len(scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = (i + 1 + j + 1) / 2.0
        i = j + 1
    n_pos = labels.sum()
    n_neg = len(labels) - n_pos
    if n_pos == 0 or n_neg == 0:
        return 0.5
    return float((ranks[labels == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def hit_rate_ndcg_at_k(pos_scores: jnp.ndarray, neg_scores: jnp.ndarray, k: int):
    """NCF ranked-candidate eval (protocol of /root/reference/src/match/ncf/
    train.py:11-26): per example, rank the positive among its negatives.

    pos_scores (B,), neg_scores (B, N) -> (HR@k, NDCG@k) scalars.
    """
    rank = jnp.sum(neg_scores > pos_scores[:, None], axis=-1)  # 0-based
    hit = (rank < k).astype(jnp.float32)
    ndcg = hit * (1.0 / jnp.log2(rank.astype(jnp.float32) + 2.0))
    return jnp.mean(hit), jnp.mean(ndcg)


def recall_at_k(retrieved_ids: np.ndarray, true_ids: np.ndarray) -> float:
    """Fraction of examples whose true item appears in the retrieved top-k.

    retrieved_ids (B, K), true_ids (B,).
    """
    hits = (retrieved_ids == np.asarray(true_ids)[:, None]).any(axis=1)
    return float(hits.mean())
