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
    teacher: str = "fm",
):
    """Criteo-shaped CTR data: Zipfian categories at reference vocab sizes,
    heavy-tailed min-max-scaled dense features, and a planted logistic
    teacher.

    ``teacher='fm'`` (default): first-order + FM-style pairwise latent
    dots + dense linear.  NOTE this makes plain FM the BAYES-FORM model —
    deep models can only approximate it, which is why they trail FM on
    this variant at any epoch budget (round-3 forensics,
    artifacts/protocol_ctr_fixed6.json).  ``teacher='mlp'`` plants
    NON-multiplicative structure instead — a random 2-layer tanh MLP over
    the concatenated field latents and dense features (plus a weak
    first-order term), which FM's functional form cannot represent but
    deep towers can: the variant that discriminates deep-model training
    quality.

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

    if teacher == "fm":
        # first-order per-id weights (variance decaying by field), pairwise
        # interactions via per-id latent vectors, dense linear term
        logit = np.zeros(num_examples, np.float64)
        z_sum = np.zeros((num_examples, latent_dim), np.float64)
        z_sq = np.zeros(num_examples, np.float64)
        for j, v in enumerate(vocabs):
            field_scale = 1.0 / np.sqrt(1.0 + j % 7)
            w = rng.normal(0.0, field_scale, v)
            logit += w[sparse[:, j]]
            z = rng.normal(0.0, field_scale / np.sqrt(latent_dim),
                           (v, latent_dim))
            zj = z[sparse[:, j]]
            z_sum += zj
            z_sq += np.einsum("nk,nk->n", zj, zj)
        inter = 0.5 * (np.einsum("nk,nk->n", z_sum, z_sum) - z_sq)
        w_dense = rng.normal(0.0, 1.0, num_dense)
        logit += 1.5 * inter + dense @ w_dense
    elif teacher == "mlp":
        # non-multiplicative teacher: random tanh MLP over the concatenated
        # per-field latents + dense, plus a weak first-order term
        f_in = len(vocabs) * latent_dim + num_dense
        x = np.empty((num_examples, f_in), np.float32)
        logit = np.zeros(num_examples, np.float64)
        for j, v in enumerate(vocabs):
            field_scale = 1.0 / np.sqrt(1.0 + j % 7)
            logit += 0.3 * rng.normal(0.0, field_scale, v)[sparse[:, j]]
            z = rng.normal(0.0, field_scale, (v, latent_dim))
            x[:, j * latent_dim:(j + 1) * latent_dim] = z[sparse[:, j]]
        x[:, -num_dense:] = dense
        h = 64
        w1 = rng.normal(0, 1.0 / np.sqrt(f_in), (f_in, h))
        w2 = rng.normal(0, 1.0 / np.sqrt(h), (h, h))
        w3 = rng.normal(0, 1.0 / np.sqrt(h), (h, 1))
        a = np.tanh(x @ w1)
        a = np.tanh(a @ w2)
        logit += 3.0 * (a @ w3)[:, 0]
        del x, a
    else:
        raise ValueError(f"unknown teacher {teacher!r}")

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
    return_meta: bool = False,
    num_cates: int = 200,
    num_occupations: int = 21,
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

    ``return_meta=True`` additionally returns a dict of side features
    DERIVED FROM THE SAME LATENT VECTORS (so they carry real signal):
      * ``item_cate`` (num_items+1,) int32, 1-based, 0=pad — Voronoi
        categories on the item sphere (argmax over ``num_cates`` random
        directions): a user's items cluster in category space, the
        structure DIN's attention and the DSSM category field exploit;
      * ``user_age_bin`` (num_users+1,) int32 in [1, 7],
        ``user_gender`` (num_users+1,) int32 in {1, 2},
        ``user_occupation`` (num_users+1,) int32 in [1, num_occupations] —
        quantized user-vector projections (the ml-100k demographic fields,
        /root/reference/src/match/utils/data_process.py:20-80, with
        latent-correlated rather than independent values).
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
    df = pd.DataFrame(
        {
            "user_id": np.concatenate(users_out),
            "item_id": np.concatenate(items_out),
            "rating": np.concatenate(ratings_out),
            "timestamp": np.concatenate(ts_out),
        }
    )
    if not return_meta:
        return df
    cat_dirs = rng.normal(0, 1, (latent_dim, num_cates))
    item_cate = np.zeros(num_items + 1, np.int32)
    item_cate[1:] = np.argmax(v_vec @ cat_dirs, axis=1) + 1
    age_proj = u_vec @ rng.normal(0, 1, latent_dim)
    qs = np.quantile(age_proj, np.linspace(0, 1, 8)[1:-1])
    occ_dirs = rng.normal(0, 1, (latent_dim, num_occupations))
    meta = {
        "item_cate": item_cate,
        "num_cates": num_cates + 1,
        "user_age_bin": np.concatenate(
            [[0], np.digitize(age_proj, qs) + 1]
        ).astype(np.int32),
        "user_gender": np.concatenate(
            [[0], (u_vec @ rng.normal(0, 1, latent_dim) > 0) + 1]
        ).astype(np.int32),
        "user_occupation": np.concatenate(
            [[0], np.argmax(u_vec @ occ_dirs, axis=1) + 1]
        ).astype(np.int32),
        "num_occupations": num_occupations + 1,
    }
    return df, meta


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


# ---------------------------------------------------------------------------
# Vectorized DIN (Amazon-Electronics) protocol builder at 100k-user scale —
# the same split/negative/padding semantics as
# data/amazon.build_amazon_arrays (reference /root/reference/src/ctr/utils/
# data_process.py:121-227), numpy-vectorized so >=100k users build in
# seconds instead of a per-position Python loop.
# ---------------------------------------------------------------------------
def build_din_dataset_fast(
    ratings: pd.DataFrame,
    item_cate: np.ndarray,
    num_cates: int,
    maxlen: int = 40,
    embed_dim: int = 8,
    seed: int = 2020,
    max_train_positions: int | None = None,
):
    """(schema, train, val, test) in the DIN batch layout:
    {'sparse': (B, 2) [item, cate], 'hist': (B, L), 'hist_cate': (B, L),
    'label': (B,)}.  Per-user chronological; every position t >= 1 yields a
    positive (the next item) and ONE random true negative; last position ->
    test, second-to-last -> val, rest -> train.  ``max_train_positions``
    caps train positions per user (most recent kept) to bound memory."""
    from recsys_tpu.core.features import (
        FeatureSchema, SparseFeature, VarLenSparseFeature,
    )

    rng = np.random.default_rng(seed)
    u = ratings["user_id"].to_numpy()
    i = ratings["item_id"].to_numpy().astype(np.int64)  # 1-based, 0 = pad
    ts = ratings["timestamp"].to_numpy()
    num_items = int(item_cate.shape[0])  # includes the pad slot

    order = np.lexsort((ts, u))
    u, items = u[order], i[order].astype(np.int32)
    uniq, starts, counts = np.unique(u, return_index=True, return_counts=True)
    keep = counts >= 3
    uniq, starts, counts = uniq[keep], starts[keep], counts[keep]
    ends = starts + counts

    # membership for true negatives
    pos_key = np.sort(u.astype(np.int64) * num_items + items)

    def draw_negs(users_int, n):
        out = rng.integers(1, num_items, (len(users_int), n), dtype=np.int64)
        base = users_int.astype(np.int64) * num_items
        for _ in range(64):
            key = base[:, None] + out
            idx = np.searchsorted(pos_key, key.ravel())
            hit = (idx < len(pos_key)) & (
                pos_key[np.minimum(idx, len(pos_key) - 1)] == key.ravel()
            )
            hit = hit.reshape(out.shape)
            n_bad = int(hit.sum())
            if n_bad == 0:
                return out.astype(np.int32)
            out[hit] = rng.integers(1, num_items, n_bad, dtype=np.int64)
        raise RuntimeError("negative sampling failed to converge")

    def positions(kind):
        """(user_row_idx, global position of the TARGET) per example."""
        if kind == "test":
            return np.arange(len(uniq)), ends - 1
        if kind == "val":
            return np.arange(len(uniq)), ends - 2
        # train targets: t = 1 .. L-3 (L-3 of them; 0 for 3-item users),
        # optionally capped to the most recent max_train_positions
        reps = counts - 3
        if max_train_positions is not None:
            reps = np.minimum(reps, max_train_positions)
        urow = np.repeat(np.arange(len(uniq)), reps)
        t_end = counts - 2  # exclusive bound: train t < L-2
        offs = (np.concatenate([np.arange(r) for r in reps])
                if len(reps) else np.zeros(0, np.int64))
        t = (t_end[urow] - reps[urow]) + offs
        return urow, starts[urow] + t

    def build(kind):
        urow, tpos = positions(kind)
        m = len(urow)
        # history window: local positions [tloc-maxlen, tloc)
        win = np.arange(maxlen)[None, :] + (tpos - maxlen)[:, None]
        valid = win >= starts[urow][:, None]
        hist = np.where(valid, items[np.maximum(win, 0)], 0).astype(np.int32)
        pos_items = items[tpos]
        negs = draw_negs(uniq[urow], 1)[:, 0]
        sparse = np.empty((2 * m, 2), np.int32)
        sparse[0::2, 0] = pos_items
        sparse[1::2, 0] = negs
        sparse[:, 1] = item_cate[sparse[:, 0]]
        hist2 = np.repeat(hist, 2, axis=0)
        return {
            "sparse": sparse,
            "hist": hist2,
            "hist_cate": item_cate[hist2].astype(np.int32),
            "label": np.tile(np.asarray([1.0, 0.0], np.float32), m),
        }

    schema = FeatureSchema(
        sparse=[
            SparseFeature("item", num_items, embed_dim),
            SparseFeature("cate", num_cates, embed_dim),
        ],
        varlen=[
            VarLenSparseFeature("hist_item", num_items, embed_dim,
                                max_len=maxlen, shared_with="item"),
            VarLenSparseFeature("hist_cate", num_cates, embed_dim,
                                max_len=maxlen, shared_with="cate"),
        ],
    )
    return schema, build("train"), build("val"), build("test")


# ---------------------------------------------------------------------------
# Multi-task CTR/CVR generator (ESMM/MMoE/PLE protocol at scale) — the
# reference trains these on synthetic frames (/root/reference/src/ctr/esmm/
# train.py:25-72, mmoe/train.py:25-72); this is the same idea with planted
# SHARED structure (the thing multi-task gating exists to exploit) and
# oracle ceilings for both heads.
# ---------------------------------------------------------------------------
def realistic_multitask(
    num_examples: int = 1_000_000,
    embed_dim: int = 16,
    vocabs: tuple = CRITEO_VOCABS[:12],
    num_dense: int = 8,
    target_ctr: float = 0.25,
    target_cvr: float = 0.15,
    signal_std: float = 1.6,
    task_corr: float = 0.6,
    zipf_s: float = 1.05,
    latent_dim: int = 4,
    seed: int = 0,
):
    """Two-task frame: click ~ Bern(p_ctr); conversion observed ONLY on
    clicks (the entire-space setting ESMM models).  The two task logits
    share a common latent component (weight ``task_corr``) plus
    task-specific components.  Returns (schema, data, meta): data has
    dense/sparse plus 'click' and 'ctcvr' (= click * converted) labels;
    meta carries oracle AUCs for both heads.
    """
    rng = np.random.default_rng(seed)
    f = len(vocabs)
    sparse = np.empty((num_examples, f), np.int32)
    for j, v in enumerate(vocabs):
        sparse[:, j] = rng.choice(v, size=num_examples,
                                  p=_zipf_probs(v, zipf_s, rng))
    raw = rng.lognormal(1.0, 1.5, (num_examples, num_dense))
    dense = ((raw - raw.min(0)) / (raw.max(0) - raw.min(0) + 1e-9)
             ).astype(np.float32)

    def planted(seed_off):
        r = np.random.default_rng(seed + 1000 + seed_off)
        logit = np.zeros(num_examples, np.float64)
        z_sum = np.zeros((num_examples, latent_dim))
        z_sq = np.zeros(num_examples)
        for j, v in enumerate(vocabs):
            fs = 1.0 / np.sqrt(1.0 + j % 7)
            logit += r.normal(0, fs, v)[sparse[:, j]]
            z = r.normal(0, fs / np.sqrt(latent_dim), (v, latent_dim))
            zj = z[sparse[:, j]]
            z_sum += zj
            z_sq += np.einsum("nk,nk->n", zj, zj)
        inter = 0.5 * (np.einsum("nk,nk->n", z_sum, z_sum) - z_sq)
        return logit + 1.5 * inter + dense @ r.normal(0, 1, num_dense)

    shared = planted(0)
    l_ctr = task_corr * shared + (1 - task_corr) * planted(1)
    l_cvr = task_corr * shared + (1 - task_corr) * planted(2)

    def calibrate(logit, rate):
        logit = signal_std * (logit - logit.mean()) / (logit.std() + 1e-12)
        lo, hi = -20.0, 20.0
        for _ in range(50):
            c = 0.5 * (lo + hi)
            if (1 / (1 + np.exp(-(logit + c)))).mean() < rate:
                lo = c
            else:
                hi = c
        return 1 / (1 + np.exp(-(logit + 0.5 * (lo + hi))))

    p_ctr = calibrate(l_ctr, target_ctr)
    p_cvr = calibrate(l_cvr, target_cvr)
    click = (rng.random(num_examples) < p_ctr).astype(np.float32)
    converted = (rng.random(num_examples) < p_cvr).astype(np.float32)
    ctcvr = click * converted

    schema = FeatureSchema(
        dense=[DenseFeature(f"I{i}") for i in range(num_dense)],
        sparse=[SparseFeature(f"C{i}", int(v), embed_dim)
                for i, v in enumerate(vocabs)],
    )
    data = {"dense": dense, "sparse": sparse, "click": click,
            "ctcvr": ctcvr}
    meta = {
        "ctr": float(click.mean()),
        "ctcvr_rate": float(ctcvr.mean()),
        "oracle_auc_ctr": _auc(click, p_ctr),
        "oracle_auc_ctcvr": _auc(ctcvr, p_ctr * p_cvr),
    }
    return schema, data, meta


def realistic_census(
    num_train: int = 200_000,
    num_test: int = 100_000,
    target_income: float = 0.12,
    target_marital: float = 0.33,
    signal_std: float = 1.4,
    task_corr: float = 0.5,
    seed: int = 0,
):
    """Census-income-FORMAT two-task frames (the MMoE/PLE protocol shape,
    /root/reference/src/ctr/utils/data_process.py:229-294) with planted
    learnable structure.

    Emits (train_df, test_df, meta): dataframes in the exact 42-column
    census layout data/census.py::create_census_dataset parses — string
    categoricals for the 32 feature columns, 7 numeric columns, the
    ``income_50k`` label column as the reference's ``' - 50000.'`` /
    ``' 50000+.'`` strings, ``marital_stat`` carrying task 2 as the
    ``'Never married'`` category, and a throwaway ``instance_weight``.
    Task logits share a latent component (weight ``task_corr``) plus
    task-specific components over the same category assignments, so both
    heads are learnable from the embedded features; meta carries the
    oracle AUC per head.
    """
    from recsys_tpu.data.census import COLUMNS, DENSE_COLS, DROP_COLS
    from recsys_tpu.data.census import LABEL_INCOME, LABEL_MARITAL

    rng = np.random.default_rng(seed)
    n = num_train + num_test
    feat_cols = [
        c for c in COLUMNS
        if c not in DENSE_COLS + DROP_COLS + [LABEL_INCOME, LABEL_MARITAL]
    ]
    # census-like small enum vocabularies (3..52 categories per column)
    vocabs = [int(v) for v in rng.integers(3, 53, len(feat_cols))]
    codes = np.empty((n, len(feat_cols)), np.int32)
    for j, v in enumerate(vocabs):
        codes[:, j] = rng.choice(v, size=n, p=_zipf_probs(v, 1.05, rng))
    dense_raw = rng.lognormal(1.0, 1.2, (n, len(DENSE_COLS)))

    def planted(seed_off):
        r = np.random.default_rng(seed + 500 + seed_off)
        logit = np.zeros(n, np.float64)
        for j, v in enumerate(vocabs):
            logit += r.normal(0, 1.0 / np.sqrt(1 + j % 5), v)[codes[:, j]]
        z = (dense_raw - dense_raw.mean(0)) / (dense_raw.std(0) + 1e-9)
        return logit + z @ r.normal(0, 0.6, len(DENSE_COLS))

    shared = planted(0)
    l_inc = task_corr * shared + (1 - task_corr) * planted(1)
    l_mar = task_corr * shared + (1 - task_corr) * planted(2)

    def calibrate(logit, rate):
        logit = signal_std * (logit - logit.mean()) / (logit.std() + 1e-12)
        lo, hi = -20.0, 20.0
        for _ in range(50):
            c = 0.5 * (lo + hi)
            if (1 / (1 + np.exp(-(logit + c)))).mean() < rate:
                lo = c
            else:
                hi = c
        return 1 / (1 + np.exp(-(logit + 0.5 * (lo + hi))))

    p_inc = calibrate(l_inc, target_income)
    p_mar = calibrate(l_mar, target_marital)
    y_inc = (rng.random(n) < p_inc).astype(np.int32)
    y_mar = (rng.random(n) < p_mar).astype(np.int32)

    df = pd.DataFrame(index=np.arange(n))
    for c, raw_col in zip(DENSE_COLS, dense_raw.T):
        df[c] = np.round(raw_col * 10).astype(np.int64)
    for j, c in enumerate(feat_cols):
        df[c] = pd.Series(codes[:, j]).map(lambda k, c=c: f" {c}_v{k}")
    df["instance_weight"] = np.round(rng.uniform(100, 5000, n), 2)
    # the reference's exact label strings (data_process.py:241-252 strips
    # whitespace and matches '50000+' / 'Never married')
    df[LABEL_INCOME] = np.where(y_inc == 1, " 50000+.", " - 50000.")
    others = [" Married-civilian spouse present", " Divorced", " Widowed",
              " Separated", " Married-spouse absent"]
    df[LABEL_MARITAL] = np.where(
        y_mar == 1, " Never married",
        np.asarray(others)[rng.integers(0, len(others), n)],
    )
    df = df[COLUMNS]
    meta = {
        "income_rate": float(y_inc.mean()),
        "marital_rate": float(y_mar.mean()),
        "oracle_auc_income": _auc(y_inc, p_inc),
        "oracle_auc_marital": _auc(y_mar, p_mar),
    }
    return df.iloc[:num_train], df.iloc[num_train:], meta
