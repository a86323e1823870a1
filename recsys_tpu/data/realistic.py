"""Distribution-realistic synthetic datasets at reference protocol scale.

The reference's quality surface is "metric printed after training on real
Criteo / ml-100k / ml-latest" (/root/reference/src/ctr/fm/train.py:61-67,
/root/reference/src/match/ncf/train.py:64-83).  Those files cannot be
downloaded here (no egress), so these generators reproduce the *statistics
that make the protocols hard at scale* — Zipfian category traffic at
reference-magnitude vocabularies, heavy-tailed dense features, latent-factor
collaborative structure with popularity skew, and leave-last-2 user
histories — so the exact training/eval protocols can run end-to-end at
>=1M-row / >=100k-user size (round-1 VERDICT item 3).

Every generator also returns the *oracle* (Bayes) score where defined, so a
measured model AUC can be reported as a fraction of the achievable ceiling
instead of an uncalibrated number.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from recsys_tpu.core.features import DenseFeature, FeatureSchema, SparseFeature

# 26 categorical vocabulary sizes echoing the Criteo sample's magnitude mix
# (a few 100k+ hashed fields, mid-size 1k-60k fields, and tiny enum fields —
# the LabelEncoder vocabularies the reference builds at
# /root/reference/src/ctr/utils/data_process.py:69-74).
CRITEO_VOCABS = (
    1460, 583, 250_000, 100_000, 305, 24, 12_000, 633, 3, 60_000,
    5_000, 200_000, 3_194, 27, 14_000, 150_000, 10, 5_652, 2_173, 4,
    240_000, 15, 16, 50_000, 105, 80_000,
)


def _zipf_probs(v: int, s: float, rng: np.random.Generator) -> np.ndarray:
    """Zipf pmf over v ids, rank order shuffled (ids are hash-like)."""
    p = 1.0 / np.arange(1, v + 1) ** s
    p /= p.sum()
    rng.shuffle(p)
    return p


def realistic_criteo(
    num_examples: int = 1_000_000,
    embed_dim: int = 16,
    vocabs: tuple = CRITEO_VOCABS,
    num_dense: int = 13,
    target_ctr: float = 0.25,
    signal_std: float = 1.6,
    zipf_s: float = 1.05,
    latent_dim: int = 4,
    seed: int = 0,
):
    """Criteo-shaped CTR data: Zipfian categories at reference vocab sizes,
    heavy-tailed min-max-scaled dense features, and a planted logistic model
    with first-order, pairwise-interaction, and dense terms (so FM-family
    models have real interaction signal to find).

    Returns ``(schema, data, meta)`` where data has the standard
    dense/sparse/label arrays plus nothing else, and ``meta`` carries the
    true per-example probability (``p_true``) and the empirical oracle AUC
    of the generator — the quality ceiling any model can hit.
    """
    rng = np.random.default_rng(seed)
    f = len(vocabs)

    sparse = np.empty((num_examples, f), np.int32)
    for j, v in enumerate(vocabs):
        probs = _zipf_probs(v, zipf_s, rng)
        sparse[:, j] = rng.choice(v, size=num_examples, p=probs)

    # heavy-tailed dense counters (Criteo I* are counts), min-max scaled the
    # way the fixed loader scales them (per-column — data/criteo.py)
    raw = rng.lognormal(mean=1.0, sigma=1.5, size=(num_examples, num_dense))
    dense = (raw - raw.min(0)) / (raw.max(0) - raw.min(0) + 1e-9)
    dense = dense.astype(np.float32)

    # planted model: first-order per-id weights (variance decaying by field),
    # pairwise interactions via per-id latent vectors, dense linear term
    logit = np.zeros(num_examples, np.float64)
    z_sum = np.zeros((num_examples, latent_dim), np.float64)
    z_sq = np.zeros(num_examples, np.float64)
    for j, v in enumerate(vocabs):
        field_scale = 1.0 / np.sqrt(1.0 + j % 7)
        w = rng.normal(0.0, field_scale, v)
        logit += w[sparse[:, j]]
        z = rng.normal(0.0, field_scale / np.sqrt(latent_dim), (v, latent_dim))
        zj = z[sparse[:, j]]
        z_sum += zj
        z_sq += np.einsum("nk,nk->n", zj, zj)
    inter = 0.5 * (np.einsum("nk,nk->n", z_sum, z_sum) - z_sq)
    w_dense = rng.normal(0.0, 1.0, num_dense)
    logit += 1.5 * inter + dense @ w_dense

    logit = signal_std * (logit - logit.mean()) / (logit.std() + 1e-12)
    # intercept for the target positive rate: bisection on mean(sigmoid)
    lo, hi = -20.0, 20.0
    for _ in range(50):
        c = 0.5 * (lo + hi)
        if (1.0 / (1.0 + np.exp(-(logit + c)))).mean() < target_ctr:
            lo = c
        else:
            hi = c
    logit += 0.5 * (lo + hi)
    p_true = 1.0 / (1.0 + np.exp(-logit))
    label = (rng.random(num_examples) < p_true).astype(np.float32)

    schema = FeatureSchema(
        dense=[DenseFeature(f"I{i}") for i in range(num_dense)],
        sparse=[
            SparseFeature(f"C{i}", int(v), embed_dim)
            for i, v in enumerate(vocabs)
        ],
    )
    data = {"dense": dense, "sparse": sparse, "label": label}
    meta = {
        "p_true": p_true.astype(np.float32),
        "ctr": float(label.mean()),
        "oracle_auc": _auc(label, p_true),
    }
    return schema, data, meta


def _auc(labels: np.ndarray, scores: np.ndarray) -> float:
    """Exact rank AUC (ties handled) — small helper for oracle ceilings."""
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty_like(order, np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    # average ranks over ties
    s_sorted = scores[order]
    _, inv, counts = np.unique(s_sorted, return_inverse=True, return_counts=True)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    avg = starts + (counts + 1) / 2.0
    ranks[order] = avg[inv]
    pos = labels > 0.5
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    if n_pos == 0 or n_neg == 0:
        return 0.5
    return float((ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


# ---------------------------------------------------------------------------
# Latent-factor interaction log at MovieLens-protocol scale
# ---------------------------------------------------------------------------
def realistic_ratings(
    num_users: int = 100_000,
    num_items: int = 20_000,
    mean_len: float = 26.0,
    min_len: int = 5,
    max_len: int = 200,
    latent_dim: int = 16,
    affinity_scale: float = 4.0,
    pop_scale: float = 1.0,
    zipf_s: float = 1.0,
    drift_scale: float = 6.0,
    user_batch: int = 1024,
    seed: int = 0,
) -> pd.DataFrame:
    """A ratings frame with collaborative + popularity + sequential structure.

    * latent-factor affinity: user/item vectors on the unit sphere; a user's
      items are Gumbel-top-L draws from affinity*scale + pop_scale*log(pop)
      — popularity is Zipf(s), so negative sampling and logQ correction face
      the real skew;
    * sequence order: each user's items are sorted by a global drift
      projection of the item vectors plus noise, so the NEXT item is
      predictable from the history (SASRec has signal) while timestamps stay
      a valid chronological key for the leave-last-2 protocols;
    * ratings: 1-5, higher for higher-affinity items, so rating-threshold
      filters (rating>=3, trans_score) keep their reference meaning.

    Feed the result to build_ncf_dataset / build_sasrec_dataset /
    build_ml100k-style builders — the exact protocol code — at scale.
    """
    rng = np.random.default_rng(seed)
    u_vec = rng.normal(0, 1, (num_users, latent_dim))
    u_vec /= np.linalg.norm(u_vec, axis=1, keepdims=True)
    v_vec = rng.normal(0, 1, (num_items, latent_dim))
    v_vec /= np.linalg.norm(v_vec, axis=1, keepdims=True)
    pop = _zipf_probs(num_items, zipf_s, rng)
    log_pop = np.log(pop + 1e-12)

    lengths = np.clip(
        rng.lognormal(np.log(mean_len) - 0.18, 0.6, num_users), min_len, max_len
    ).astype(np.int64)

    drift_dir = rng.normal(0, 1, latent_dim)
    drift_dir /= np.linalg.norm(drift_dir)
    item_drift = v_vec @ drift_dir  # global "time axis" over items

    users_out, items_out, ratings_out, ts_out = [], [], [], []
    for start in range(0, num_users, user_batch):
        ub = u_vec[start : start + num_users][:user_batch]
        lb = lengths[start : start + ub.shape[0]]
        aff = ub @ v_vec.T * affinity_scale
        scores = aff + pop_scale * log_pop[None, :]
        scores += rng.gumbel(0, 1.0, scores.shape)
        k = int(lb.max())
        top = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        for r in range(ub.shape[0]):
            L = int(lb[r])
            sel = top[r, :L]
            order = np.argsort(
                item_drift[sel] * drift_scale + rng.normal(0, 1.0, L),
                kind="mergesort",
            )
            sel = sel[order]
            a = aff[r, sel]
            # affinity quantile -> rating 1..5
            q = (a - a.min()) / (a.max() - a.min() + 1e-9)
            rating = 1 + np.minimum(4, (q * 4 + rng.random(L)).astype(np.int64))
            users_out.append(np.full(L, start + r + 1, np.int64))
            items_out.append(sel + 1)
            ratings_out.append(rating)
            ts_out.append(np.arange(L, dtype=np.int64))
    return pd.DataFrame(
        {
            "user_id": np.concatenate(users_out),
            "item_id": np.concatenate(items_out),
            "rating": np.concatenate(ratings_out),
            "timestamp": np.concatenate(ts_out),
        }
    )


# ---------------------------------------------------------------------------
# Vectorized NCF protocol builder (same protocol as
# data/movielens.build_ncf_dataset, numpy-vectorized negative sampling so
# 100k-user scale builds in seconds; RNG stream differs, distribution does
# not — the native-builder precedent in build_sasrec_dataset)
# ---------------------------------------------------------------------------
def build_ncf_dataset_fast(
    ratings: pd.DataFrame,
    train_neg_num: int = 1,
    test_neg_num: int = 100,
    trans_score: int = 1,
    seed: int = 2020,
):
    """Returns (num_users, num_items, train, val, test) — the leave-last-2 +
    sampled-negatives protocol of /root/reference/src/match/ncf/
    data_process.py:20-83 (with its gen_neg bug §2.6.11 fixed: every
    negative is a true non-interacted item), vectorized.
    """
    rng = np.random.default_rng(seed)
    df = ratings[ratings["rating"] >= trans_score]
    u_ids = np.sort(df["user_id"].unique())
    i_ids = np.sort(df["item_id"].unique())
    u = np.searchsorted(u_ids, df["user_id"].to_numpy())
    i = np.searchsorted(i_ids, df["item_id"].to_numpy())
    num_users, num_items = len(u_ids), len(i_ids)

    order = np.lexsort((df["timestamp"].to_numpy(), u))
    u, i = u[order], i[order]
    uniq, starts, counts = np.unique(u, return_index=True, return_counts=True)
    keep = counts >= 3  # users with < 3 interactions are dropped (protocol)
    uniq, starts, counts = uniq[keep], starts[keep], counts[keep]
    ends = starts + counts

    # membership structure: sorted (user, item) keys of ALL interactions
    pos_key = np.sort(u.astype(np.int64) * num_items + i)

    def draw_negs(users: np.ndarray, n: int) -> np.ndarray:
        """(len(users), n) true negatives via vectorized rejection."""
        out = rng.integers(0, num_items, (len(users), n), dtype=np.int64)
        base = users.astype(np.int64) * num_items
        for _ in range(64):
            key = base[:, None] + out
            idx = np.searchsorted(pos_key, key.ravel())
            hit = (idx < len(pos_key)) & (pos_key[np.minimum(idx, len(pos_key) - 1)] == key.ravel())
            hit = hit.reshape(out.shape)
            n_bad = int(hit.sum())
            if n_bad == 0:
                return out.astype(np.int32)
            out[hit] = rng.integers(0, num_items, n_bad, dtype=np.int64)
        raise RuntimeError("negative sampling failed to converge")

    # train rows: all but the last two items of each user
    tr_count = counts - 2
    tr_users = np.repeat(uniq, tr_count)
    tr_idx = np.concatenate([np.arange(s, e - 2) for s, e in zip(starts, ends)])
    tr_pos = i[tr_idx]
    val_users, test_users = uniq, uniq
    val_pos, test_pos = i[ends - 2], i[ends - 1]

    train = {
        "user": tr_users.astype(np.int32),
        "pos_item": tr_pos.astype(np.int32),
        "neg_item": draw_negs(tr_users, train_neg_num),
    }
    val = {
        "user": val_users.astype(np.int32),
        "pos_item": val_pos.astype(np.int32),
        "neg_item": draw_negs(val_users, test_neg_num),
    }
    test = {
        "user": test_users.astype(np.int32),
        "pos_item": test_pos.astype(np.int32),
        "neg_item": draw_negs(test_users, test_neg_num),
    }
    return num_users, num_items, train, val, test
