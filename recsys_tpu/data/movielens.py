"""MovieLens pipelines: ml-100k two-tower, SASRec sequences, NCF ranked eval.

Reproduces the reference's experimental protocols (SURVEY.md §7.3 exact-parity
list) with its crash bugs fixed:

* ml-100k two-tower (/root/reference/src/match/utils/data_process.py:20-80):
  label = rating >= 3, age binning, label-encode everything, per-tower arrays.
* SASRec (/root/reference/src/match/utils/data_process.py:84-145): filter
  items with <5 events, per-user chronological leave-last-2, 1 train
  negative per positive, ``test_neg_num`` test negatives, front-padded
  histories.  (The reference's random.shuffle on a defaultdict — bug
  §2.6.10 — is a crash; users are shuffled via their key list.)
* NCF (/root/reference/src/match/ncf/data_process.py:20-83): leave-last-2,
  100 test negatives, with ``gen_neg`` fixed to always return a true negative
  (bug §2.6.11 could return a positive or None).

Every ``create_*`` reads the public file formats; every ``build_*`` takes a
DataFrame so tests can feed synthetic frames through the identical logic.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from recsys_tpu.core.features import (
    FeatureSchema,
    SparseFeature,
    VarLenSparseFeature,
)

AGE_BINS = [0, 15, 25, 35, 45, 60, 100]


# --------------------------------------------------------------------------
# ml-100k two-tower (DSSM / FM-match / SENet)
# --------------------------------------------------------------------------
def create_ml_100k_dataset(
    data_dir: str, embed_dim: int = 16, test_size: float = 0.2, seed: int = 2020
):
    ratings = pd.read_csv(
        f"{data_dir}/u.data",
        sep="\t",
        names=["user_id", "item_id", "rating", "timestamp"],
    )
    users = pd.read_csv(
        f"{data_dir}/u.user",
        sep="|",
        names=["user_id", "age", "gender", "occupation", "zip"],
    )
    items = pd.read_csv(
        f"{data_dir}/u.item",
        sep="|",
        encoding="latin-1",
        header=None,
        usecols=[0, 2],
        names=["item_id", "release_date"],
    )
    return build_ml100k_arrays(
        ratings, users, items, embed_dim, test_size, seed
    )


def build_ml100k_arrays(
    ratings: pd.DataFrame,
    users: pd.DataFrame,
    items: pd.DataFrame,
    embed_dim: int = 16,
    test_size: float = 0.2,
    seed: int = 2020,
):
    df = ratings.merge(users, on="user_id").merge(items, on="item_id")
    # label threshold: rating >= 3 (reference get_label, data_process.py:12-18)
    df["label"] = (df["rating"] >= 3).astype(np.float32)
    df["age_bin"] = pd.cut(df["age"], bins=AGE_BINS, labels=False).fillna(0)

    user_cols = ["user_id", "age_bin", "gender", "occupation"]
    item_cols = ["item_id"]
    enc = {}
    for col in user_cols + item_cols:
        codes, uniques = pd.factorize(df[col], sort=True)
        df[col + "_enc"] = codes.astype(np.int32)
        enc[col] = len(uniques)

    user_schema = FeatureSchema(
        sparse=[SparseFeature(c, enc[c], embed_dim) for c in user_cols]
    )
    item_schema = FeatureSchema(
        sparse=[SparseFeature(c, enc[c], embed_dim) for c in item_cols]
    )

    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(df))
    cut = int(len(df) * (1.0 - test_size))

    def take(sel):
        sub = df.iloc[sel]
        return {
            "user_sparse": sub[[c + "_enc" for c in user_cols]].to_numpy(np.int32),
            "item_sparse": sub[[c + "_enc" for c in item_cols]].to_numpy(np.int32),
            "label": sub["label"].to_numpy(np.float32),
        }

    return user_schema, item_schema, take(idx[:cut]), take(idx[cut:])


# --------------------------------------------------------------------------
# SASRec sequences (leave-last-2, sampled negatives)
# --------------------------------------------------------------------------
def create_sasrec_dataset(
    ratings_csv: str,
    maxlen: int = 50,
    test_neg_num: int = 20,
    min_item_count: int = 5,
    seed: int = 2020,
):
    df = pd.read_csv(ratings_csv)  # ml-latest-small format
    df = df.rename(columns={"userId": "user_id", "movieId": "item_id"})
    return build_sasrec_dataset(df, maxlen, test_neg_num, min_item_count, seed,
                                use_native="auto")


def build_sasrec_dataset(
    ratings: pd.DataFrame,
    maxlen: int = 50,
    test_neg_num: int = 20,
    min_item_count: int = 5,
    seed: int = 2020,
    all_positions: bool = False,
    use_native: bool | str = False,
):
    """Returns (num_items, train_dict, val_dict, test_dict).

    Item ids are remapped to 1..N (0 = pad).  Two training layouts:
    exploded prefixes (default; pos/neg per example) or, with
    ``all_positions``, the published per-user scheme where train rows are
    whole sequences with per-position targets/negatives (pos/neg (B, L)).
    Validation targets the second-to-last item, test the last — the
    leave-last-2 protocol either way.

    ``use_native`` ('auto' | True | False) routes the per-user row
    construction through the C++ builder (native/recsys_native.cc) — same
    splits and padding, different (still seeded) negative-sampling stream.
    """
    rng = np.random.default_rng(seed)
    counts = ratings["item_id"].value_counts()
    keep = counts[counts >= min_item_count].index
    df = ratings[ratings["item_id"].isin(keep)].copy()

    item_ids = np.sort(df["item_id"].unique())
    remap = {v: i + 1 for i, v in enumerate(item_ids)}  # 0 is pad
    df["iid"] = df["item_id"].map(remap)
    num_items = len(item_ids) + 1

    df = df.sort_values(["user_id", "timestamp"], kind="mergesort")

    if use_native:
        from recsys_tpu.data import native

        if native.available():
            import logging

            # the C++ path draws negatives from a different (still seeded)
            # stream than numpy's: metrics are deterministic per path but
            # not comparable ACROSS machines with/without the built .so —
            # say so instead of silently switching
            logging.getLogger(__name__).info(
                "build_sasrec_dataset: using the native C++ builder "
                "(PCG32 negative-sample stream)"
            )
            items = df["iid"].to_numpy(np.int32)
            # CSR offsets over the user-sorted stream
            _, starts = np.unique(df["user_id"].to_numpy(), return_index=True)
            user_off = np.concatenate(
                [np.sort(starts), [len(items)]]
            ).astype(np.int64)
            train, val, test = native.build_seq_leave_last2(
                items, user_off, maxlen, num_items, test_neg_num,
                seed=seed, all_positions=all_positions,
            )
            return num_items, train, val, test
        if use_native is True:  # explicit request, no silent fallback
            raise RuntimeError("native library unavailable")

    seqs = df.groupby("user_id")["iid"].apply(list)

    def sample_neg(exclude: set, n: int) -> list[int]:
        out = []
        while len(out) < n:
            cand = int(rng.integers(1, num_items))
            if cand not in exclude:
                out.append(cand)
        return out

    def pad(seq: list[int]) -> np.ndarray:
        seq = seq[-maxlen:]
        return np.asarray([0] * (maxlen - len(seq)) + seq, np.int32)

    train_h, train_p, train_n = [], [], []
    val_h, val_p, val_n = [], [], []
    test_h, test_p, test_n = [], [], []
    for _, seq in seqs.items():
        if len(seq) < 3:
            continue
        exclude = set(seq)
        if all_positions:
            # published SASRec scheme: ONE row per user; position t of the
            # front-padded input predicts target[t] (the next item), one
            # sampled negative per position (pad positions -> 0)
            train_seq = seq[:-2]
            if len(train_seq) >= 2:
                inp = pad(train_seq[:-1])
                tgt = pad(train_seq[1:])
                negs = np.where(
                    tgt > 0,
                    np.asarray(sample_neg(exclude, maxlen), np.int32),
                    0,
                )
                train_h.append(inp)
                train_p.append(tgt)
                train_n.append(negs)
        else:
            # exploded prefixes: predict seq[t] from seq[:t]
            for t in range(1, len(seq) - 2):
                train_h.append(pad(seq[:t]))
                train_p.append(seq[t])
                train_n.append(sample_neg(exclude, 1))
        val_h.append(pad(seq[:-2]))
        val_p.append(seq[-2])
        val_n.append(sample_neg(exclude, test_neg_num))
        test_h.append(pad(seq[:-1]))
        test_p.append(seq[-1])
        test_n.append(sample_neg(exclude, test_neg_num))

    def pack(h, p, n):
        return {
            "hist": np.stack(h).astype(np.int32),
            "pos": np.asarray(p, np.int32),
            "neg": np.asarray(n, np.int32),
        }

    return (
        num_items,
        pack(train_h, train_p, train_n),
        pack(val_h, val_p, val_n),
        pack(test_h, test_p, test_n),
    )


# --------------------------------------------------------------------------
# NCF leave-last-2 with 100-candidate ranked eval
# --------------------------------------------------------------------------
def build_ncf_dataset(
    ratings: pd.DataFrame,
    train_neg_num: int = 1,
    test_neg_num: int = 100,
    trans_score: int = 1,
    seed: int = 2020,
):
    """Returns (num_users, num_items, train, val, test) dicts.

    ``trans_score`` drops interactions below the rating threshold
    (/root/reference/src/match/ncf/data_process.py:36).  Train negatives are
    per-positive; val/test hold the last two items with ``test_neg_num``
    sampled negatives each.
    """
    rng = np.random.default_rng(seed)
    df = ratings[ratings["rating"] >= trans_score].copy()
    u_ids = np.sort(df["user_id"].unique())
    i_ids = np.sort(df["item_id"].unique())
    umap = {v: i for i, v in enumerate(u_ids)}
    imap = {v: i for i, v in enumerate(i_ids)}
    df["u"] = df["user_id"].map(umap)
    df["i"] = df["item_id"].map(imap)
    num_users, num_items = len(u_ids), len(i_ids)

    df = df.sort_values(["u", "timestamp"], kind="mergesort")
    seqs = df.groupby("u")["i"].apply(list)

    def sample_neg(exclude: set, n: int) -> list[int]:
        # fixed gen_neg: loop until n true negatives collected (bug §2.6.11)
        out = []
        while len(out) < n:
            cand = int(rng.integers(0, num_items))
            if cand not in exclude:
                out.append(cand)
        return out

    tr_u, tr_p, tr_n = [], [], []
    va_u, va_p, va_n = [], [], []
    te_u, te_p, te_n = [], [], []
    for u, seq in seqs.items():
        if len(seq) < 3:
            continue
        exclude = set(seq)
        for item in seq[:-2]:
            tr_u.append(u)
            tr_p.append(item)
            tr_n.append(sample_neg(exclude, train_neg_num))
        va_u.append(u)
        va_p.append(seq[-2])
        va_n.append(sample_neg(exclude, test_neg_num))
        te_u.append(u)
        te_p.append(seq[-1])
        te_n.append(sample_neg(exclude, test_neg_num))

    def pack(u, p, n):
        return {
            "user": np.asarray(u, np.int32),
            "pos_item": np.asarray(p, np.int32),
            "neg_item": np.asarray(n, np.int32),
        }

    return (
        num_users,
        num_items,
        pack(tr_u, tr_p, tr_n),
        pack(va_u, va_p, va_n),
        pack(te_u, te_p, te_n),
    )


def create_ncf_dataset(path: str, **kw):
    ratings = pd.read_csv(
        path, sep="\t", names=["user_id", "item_id", "rating", "timestamp"]
    )
    return build_ncf_dataset(ratings, **kw)


def build_seq_retrieval_dataset(
    ratings: pd.DataFrame,
    maxlen: int = 20,
    min_item_count: int = 2,
    seed: int = 2020,
):
    """Sequence retrieval protocol for YoutubeDNN / MIND: predict the next
    item from the padded watch history; in-batch softmax supplies negatives.

    Returns (num_items, train, test): {'hist': (N, L), 'item_id': (N,)} with
    item ids 1..V (0 = pad); per-user last item held out for test
    (leave-last, matching the retrieval eval of the reference's match zoo).
    """
    counts = ratings["item_id"].value_counts()
    keep = counts[counts >= min_item_count].index
    df = ratings[ratings["item_id"].isin(keep)].copy()
    item_ids = np.sort(df["item_id"].unique())
    remap = {v: i + 1 for i, v in enumerate(item_ids)}
    df["iid"] = df["item_id"].map(remap)
    num_items = len(item_ids) + 1
    df = df.sort_values(["user_id", "timestamp"], kind="mergesort")
    seqs = df.groupby("user_id")["iid"].apply(list)

    def pad(seq):
        seq = seq[-maxlen:]
        return np.asarray([0] * (maxlen - len(seq)) + seq, np.int32)

    tr_h, tr_t, te_h, te_t = [], [], [], []
    for _, seq in seqs.items():
        if len(seq) < 3:
            continue
        for t in range(1, len(seq) - 1):
            tr_h.append(pad(seq[:t]))
            tr_t.append(seq[t])
        te_h.append(pad(seq[:-1]))
        te_t.append(seq[-1])

    def pack(h, t):
        return {"hist": np.stack(h), "item_id": np.asarray(t, np.int32)}

    return num_items, pack(tr_h, tr_t), pack(te_h, te_t)


def synthetic_ratings(
    num_users: int = 200,
    num_items: int = 100,
    events_per_user: tuple = (5, 30),
    seed: int = 0,
) -> pd.DataFrame:
    """A synthetic ratings frame with cluster structure for pipeline tests:
    users prefer items from their own hidden cluster."""
    rng = np.random.default_rng(seed)
    user_cluster = rng.integers(0, 4, num_users)
    item_cluster = rng.integers(0, 4, num_items)
    rows = []
    t = 0
    for u in range(num_users):
        n = int(rng.integers(*events_per_user))
        liked = np.flatnonzero(item_cluster == user_cluster[u])
        for _ in range(n):
            if len(liked) > 0 and rng.random() < 0.7:
                i = int(rng.choice(liked))
                r = int(rng.integers(3, 6))
            else:
                i = int(rng.integers(0, num_items))
                r = int(rng.integers(1, 6))
            rows.append((u + 1, i + 1, r, t))
            t += 1
    return pd.DataFrame(rows, columns=["user_id", "item_id", "rating", "timestamp"])
