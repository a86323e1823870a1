"""Amazon-Electronics behaviour-sequence pipeline (DIN protocol).

Reproduces /root/reference/src/ctr/utils/data_process.py:121-227: reviews +
meta JSON, id/category remapping, per-user chronological split with 1:1
random negatives, history padded to ``maxlen`` (front-padded), DIN-style
batches.  The reference's per-line ``eval`` JSON parsing (:103) is replaced
with ``json.loads``.

``build_amazon_arrays`` takes DataFrames so tests can exercise the identical
logic on synthetic frames.
"""
from __future__ import annotations

import json

import numpy as np
import pandas as pd

from recsys_tpu.core.features import (
    FeatureSchema,
    SparseFeature,
    VarLenSparseFeature,
)


def _parse_line(line: str) -> dict:
    """Amazon dumps are python-literal lines (single quotes), not valid
    JSON — the reason the reference resorted to per-line ``eval`` (:103).
    ``ast.literal_eval`` parses them safely; real JSON also works."""
    try:
        return json.loads(line)
    except json.JSONDecodeError:
        import ast

        return ast.literal_eval(line)


def create_amazon_electronic_dataset(
    reviews_path: str, meta_path: str, embed_dim: int = 8, maxlen: int = 40,
    seed: int = 2020,
):
    reviews = pd.DataFrame(
        [_parse_line(line) for line in open(reviews_path)]
    )[["reviewerID", "asin", "unixReviewTime"]]
    meta = pd.DataFrame([_parse_line(line) for line in open(meta_path)])
    meta = meta[["asin", "categories"]]
    meta["category"] = meta["categories"].map(lambda c: c[-1][-1])
    return build_amazon_arrays(reviews, meta[["asin", "category"]],
                               embed_dim, maxlen, seed)


def build_amazon_arrays(
    reviews: pd.DataFrame,
    meta: pd.DataFrame,
    embed_dim: int = 8,
    maxlen: int = 40,
    seed: int = 2020,
):
    """reviews: [reviewerID, asin, unixReviewTime]; meta: [asin, category].

    Returns (schema, train, val, test) DIN batches:
    {'sparse': (B, 2) [item, category], 'hist': (B, L), 'hist_cate': (B, L),
     'label': (B,)}.  Per-user chronological: every position t >= 1 yields a
    positive (next item) and one random negative; the LAST position goes to
    test, the second-to-last to val (reference split :162-192).
    """
    rng = np.random.default_rng(seed)
    item_ids = np.sort(meta["asin"].unique())
    imap = {v: i + 1 for i, v in enumerate(item_ids)}  # 0 = pad
    cates, cat_uniques = pd.factorize(meta["category"], sort=True)
    item_to_cate = np.zeros(len(item_ids) + 1, np.int32)
    for asin, cate in zip(meta["asin"], cates):
        item_to_cate[imap[asin]] = cate + 1  # 0 = pad cate
    num_items = len(item_ids) + 1
    num_cates = len(cat_uniques) + 1

    df = reviews[reviews["asin"].isin(imap)].copy()
    df["iid"] = df["asin"].map(imap)
    df = df.sort_values(["reviewerID", "unixReviewTime"], kind="mergesort")
    seqs = df.groupby("reviewerID")["iid"].apply(list)

    def pad(seq):
        seq = seq[-maxlen:]
        return [0] * (maxlen - len(seq)) + list(seq)

    splits = {k: {"sparse": [], "hist": [], "label": []} for k in
              ("train", "val", "test")}
    for _, seq in seqs.items():
        if len(seq) < 3:
            continue
        exclude = set(seq)
        for t in range(1, len(seq)):
            if t == len(seq) - 1:
                dest = splits["test"]
            elif t == len(seq) - 2:
                dest = splits["val"]
            else:
                dest = splits["train"]
            hist = pad(seq[:t])
            pos = seq[t]
            while True:
                neg = int(rng.integers(1, num_items))
                if neg not in exclude:
                    break
            for item, label in ((pos, 1.0), (neg, 0.0)):
                dest["sparse"].append([item, item_to_cate[item]])
                dest["hist"].append(hist)
                dest["label"].append(label)

    schema = FeatureSchema(
        sparse=[
            SparseFeature("item", num_items, embed_dim),
            SparseFeature("cate", num_cates, embed_dim),
        ],
        varlen=[
            VarLenSparseFeature(
                "hist_item", num_items, embed_dim, max_len=maxlen,
                shared_with="item",
            ),
            VarLenSparseFeature(
                "hist_cate", num_cates, embed_dim, max_len=maxlen,
                shared_with="cate",
            ),
        ],
    )

    def pack(d):
        hist = np.asarray(d["hist"], np.int32)
        return {
            "sparse": np.asarray(d["sparse"], np.int32),
            "hist": hist,
            "hist_cate": item_to_cate[hist].astype(np.int32),
            "label": np.asarray(d["label"], np.float32),
        }

    return schema, pack(splits["train"]), pack(splits["val"]), pack(splits["test"])


def synthetic_reviews(
    num_users: int = 100, num_items: int = 60, seed: int = 0
):
    """Synthetic (reviews, meta) frames in the shapes build_amazon_arrays
    expects, with category-cluster preference structure."""
    rng = np.random.default_rng(seed)
    asins = [f"A{i:04d}" for i in range(num_items)]
    cats = [f"cat{rng.integers(0, 5)}" for _ in range(num_items)]
    meta = pd.DataFrame({"asin": asins, "category": cats})
    rows = []
    t = 0
    for u in range(num_users):
        pref = rng.integers(0, 5)
        liked = [a for a, c in zip(asins, cats) if c == f"cat{pref}"]
        n = int(rng.integers(3, 15))
        for _ in range(n):
            a = (rng.choice(liked) if liked and rng.random() < 0.7
                 else rng.choice(asins))
            rows.append((f"U{u}", a, t))
            t += 1
    reviews = pd.DataFrame(rows, columns=["reviewerID", "asin", "unixReviewTime"])
    return reviews, meta
