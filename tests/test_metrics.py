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


def test_log_uniform_candidates_distribution_and_range():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from recsys_tpu.train.losses import log_uniform_candidates

    n = 1000
    ids, logp = log_uniform_candidates(jax.random.PRNGKey(0), n, (50_000,))
    ids = np.asarray(ids)
    assert ids.min() >= 0 and ids.max() < n
    # Zipfian: id 0 drawn far more often than id 500
    c0 = (ids == 0).sum()
    c500 = (ids == 500).sum()
    assert c0 > 5 * max(c500, 1)
    # log_p matches the closed form
    np.testing.assert_allclose(
        np.asarray(logp[:5]),
        np.log1p(1.0 / (ids[:5] + 1.0)) - np.log(n + 1.0),
        rtol=1e-6,
    )


def test_sampled_softmax_matches_manual_ce():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from recsys_tpu.train.losses import sampled_softmax

    rng = np.random.default_rng(0)
    B, D, S = 6, 8, 5
    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    neg = jnp.asarray(rng.normal(size=(S, D)).astype(np.float32))

    got = float(sampled_softmax(q, pos, neg))
    logits = np.concatenate(
        [np.sum(np.asarray(q) * np.asarray(pos), -1, keepdims=True),
         np.asarray(q) @ np.asarray(neg).T], axis=1)
    lse = np.log(np.exp(logits - logits.max(1, keepdims=True)).sum(1)) \
        + logits.max(1)
    expect = float(np.mean(lse - logits[:, 0]))
    assert abs(got - expect) < 1e-5

    # per-example negatives + logQ shift run and stay finite
    neg_b = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    lq = jnp.asarray(rng.normal(size=(B, S)).astype(np.float32))
    assert np.isfinite(float(sampled_softmax(q, pos, neg_b, neg_log_q=lq)))
