import numpy as np

from recsys_tpu.train import metrics


def test_binned_auc_matches_exact():
    rng = np.random.default_rng(0)
    labels = (rng.random(5000) < 0.3).astype(np.float32)
    # informative scores
    scores = np.clip(labels * 0.3 + rng.random(5000) * 0.7, 0, 1)
    exact = metrics.auc_exact(scores, labels)
    binned = metrics.auc(scores, labels, num_bins=8192)
    assert abs(exact - binned) < 2e-3


def test_auc_perfect_and_random():
    labels = np.asarray([0, 0, 1, 1], np.float32)
    assert metrics.auc(np.asarray([0.1, 0.2, 0.8, 0.9]), labels) > 0.99
    assert abs(metrics.auc_exact([0.5, 0.5, 0.5, 0.5], labels) - 0.5) < 1e-9


def test_hit_rate_ndcg():
    import jax.numpy as jnp

    pos = jnp.asarray([2.0, 0.1])
    neg = jnp.asarray([[1.0, 0.5, 0.2], [1.0, 2.0, 3.0]])
    hr, ndcg = metrics.hit_rate_ndcg_at_k(pos, neg, k=2)
    # ex0 rank 0 -> hit, ndcg 1.0 ; ex1 rank 3 -> miss
    assert abs(float(hr) - 0.5) < 1e-6
    assert abs(float(ndcg) - 0.5) < 1e-6


def test_recall_at_k():
    retrieved = np.asarray([[1, 2, 3], [4, 5, 6]])
    assert metrics.recall_at_k(retrieved, np.asarray([2, 9])) == 0.5


def test_streaming_accumulator_merges_batches():
    rng = np.random.default_rng(1)
    labels = (rng.random(4000) < 0.5).astype(np.float32)
    scores = np.clip(labels * 0.4 + rng.random(4000) * 0.6, 0, 1)
    acc = metrics.AucAccumulator(num_bins=4096)
    for s in range(0, 4000, 512):
        acc.update(scores[s : s + 512], labels[s : s + 512])
    assert abs(acc.result() - metrics.auc_exact(scores, labels)) < 3e-3
