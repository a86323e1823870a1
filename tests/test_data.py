"""Data pipelines: protocol invariants on synthetic inputs."""
import numpy as np
import pandas as pd

from recsys_tpu.data.amazon import build_amazon_arrays, synthetic_reviews
from recsys_tpu.data.criteo import DENSE_COLS, SPARSE_COLS, build_criteo_arrays
from recsys_tpu.data.movielens import (
    build_ml100k_arrays,
    build_ncf_dataset,
    build_sasrec_dataset,
    synthetic_ratings,
)


def _criteo_frame(n=500, seed=0):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({"label": rng.integers(0, 2, n)})
    for c in DENSE_COLS:
        col = rng.normal(10, 5, n)
        col[rng.random(n) < 0.1] = np.nan
        df[c] = col
    for c in SPARSE_COLS:
        df[c] = rng.choice([f"v{i}" for i in range(20)], n)
        df.loc[rng.random(n) < 0.05, c] = None
    return df


def test_criteo_per_column_scaling_and_split():
    schema, train, test = build_criteo_arrays(_criteo_frame(), embed_dim=4)
    dense = np.concatenate([train["dense"], test["dense"]])
    # bug §2.6.15 regression: EVERY column individually spans ~[0, 1]
    assert dense.min() >= 0.0 and dense.max() <= 1.0
    assert np.all(dense.max(axis=0) > 0.9)
    assert len(schema.sparse) == 26 and len(schema.dense) == 13
    for j, f in enumerate(schema.sparse):
        sp = np.concatenate([train["sparse"], test["sparse"]])[:, j]
        assert sp.max() < f.vocab_size
    n = len(train["label"]) + len(test["label"])
    assert abs(len(test["label"]) / n - 0.2) < 0.01


def test_ml100k_arrays():
    ratings = synthetic_ratings(num_users=50, num_items=30)
    users = pd.DataFrame({
        "user_id": np.arange(1, 51),
        "age": np.random.default_rng(0).integers(10, 70, 50),
        "gender": ["M", "F"] * 25,
        "occupation": ["a", "b", "c", "d", "e"] * 10,
        "zip": ["0"] * 50,
    })
    items = pd.DataFrame({"item_id": np.arange(1, 31),
                          "release_date": ["1995"] * 30})
    user_schema, item_schema, train, test = build_ml100k_arrays(
        ratings, users, items, embed_dim=4
    )
    assert train["user_sparse"].shape[1] == 4
    assert train["item_sparse"].shape[1] == 1
    # label threshold: rating >= 3
    merged = ratings.merge(users, on="user_id").merge(items, on="item_id")
    want_rate = (merged["rating"] >= 3).mean()
    got_rate = np.concatenate([train["label"], test["label"]]).mean()
    assert abs(want_rate - got_rate) < 1e-6


def test_sasrec_dataset_protocol():
    ratings = synthetic_ratings(num_users=40, num_items=30, seed=1)
    num_items, train, val, test = build_sasrec_dataset(
        ratings, maxlen=8, test_neg_num=5, min_item_count=2
    )
    assert train["hist"].shape[1] == 8
    assert train["neg"].shape[1] == 1  # 1 train negative
    assert test["neg"].shape[1] == 5  # test_neg_num
    # front padding: zeros only at the start of each row
    for row in train["hist"][:50]:
        nz = np.flatnonzero(row)
        if len(nz):
            assert np.all(row[nz[0]:] > 0)
    # positives are never pad
    assert np.all(train["pos"] > 0)
    assert np.all(train["neg"] > 0)


def test_ncf_dataset_negatives_are_true_negatives():
    ratings = synthetic_ratings(num_users=30, num_items=25, seed=2)
    num_users, num_items, train, val, test = build_ncf_dataset(
        ratings, test_neg_num=10
    )
    assert test["neg_item"].shape[1] == 10
    # bug §2.6.11 regression: no sampled negative may be a positive
    df = ratings.copy()
    umap = {v: i for i, v in enumerate(np.sort(df["user_id"].unique()))}
    imap = {v: i for i, v in enumerate(np.sort(df["item_id"].unique()))}
    pos = set(zip(df["user_id"].map(umap), df["item_id"].map(imap)))
    for split in (train, val, test):
        for u, negs in zip(split["user"], split["neg_item"]):
            for nitem in negs:
                assert (u, nitem) not in pos


def test_amazon_arrays():
    reviews, meta = synthetic_reviews(num_users=40, num_items=25)
    schema, train, val, test = build_amazon_arrays(reviews, meta, maxlen=10)
    assert train["sparse"].shape[1] == 2  # [item, cate]
    assert train["hist"].shape[1] == 10
    assert train["hist_cate"].shape == train["hist"].shape
    # 1:1 positives and negatives
    assert abs(train["label"].mean() - 0.5) < 1e-6
    # categories consistent: padded positions have cate 0
    assert np.all((train["hist"] == 0) == (train["hist_cate"] == 0))


def test_census_two_task_arrays():
    from recsys_tpu.data.census import COLUMNS, DENSE_COLS, build_census_arrays

    rng = np.random.default_rng(5)
    n = 300

    def frame(rows):
        d = {}
        for c in COLUMNS:
            if c in DENSE_COLS:
                d[c] = rng.integers(0, 90, rows)
            elif c == "income_50k":
                d[c] = rng.choice([" - 50000.", " 50000+."], rows)
            elif c == "marital_stat":
                d[c] = rng.choice(
                    [" Never married", " Married-civilian spouse present",
                     " Divorced"], rows)
            else:
                d[c] = rng.choice([f"v{i}" for i in range(5)], rows)
        return pd.DataFrame(d)

    schema, train, val, test = build_census_arrays(frame(n), frame(100))
    assert len(train["label_income"]) == n
    assert len(val["label_income"]) == 50 and len(test["label_income"]) == 50
    # labels: income parses the '50000+.' marker, marital the 'Never married'
    assert 0.0 < train["label_income"].mean() < 1.0
    assert 0.0 < train["label_marital"].mean() < 1.0
    assert train["dense"].shape[1] == len(DENSE_COLS)
    assert train["dense"].min() >= 0.0 and train["dense"].max() <= 1.0
    for j, f in enumerate(schema.sparse):
        assert train["sparse"][:, j].max() < f.vocab_size


def test_sasrec_all_positions_layout():
    ratings = synthetic_ratings(num_users=30, num_items=25, seed=4)
    ni, train, val, test = build_sasrec_dataset(
        ratings, maxlen=8, test_neg_num=5, min_item_count=2,
        all_positions=True,
    )
    B, L = train["hist"].shape
    assert train["pos"].shape == (B, L) and train["neg"].shape == (B, L)
    # target alignment: pos[t] is the item AFTER hist[t] in the sequence
    for b in range(min(B, 10)):
        h, p = train["hist"][b], train["pos"][b]
        nz = np.flatnonzero(h)
        for t in nz[:-1]:
            assert p[t] == h[t + 1]
    # negatives nonzero exactly where targets are
    assert np.all((train["neg"] > 0) == (train["pos"] > 0))


def test_amazon_python_literal_lines(tmp_path):
    """Real amazon dumps are python-literal lines, not JSON."""
    from recsys_tpu.data.amazon import create_amazon_electronic_dataset

    reviews = tmp_path / "reviews.json"
    meta = tmp_path / "meta.json"
    rng = np.random.default_rng(3)
    asins = [f"B{i:04d}" for i in range(10)]
    with open(meta, "w") as f:
        for a in asins:
            f.write(str({"asin": a,
                         "categories": [["Electronics", f"cat{hash(a)%3}"]]})
                    + "\n")
    with open(reviews, "w") as f:
        t = 0
        for u in range(12):
            for _ in range(4):
                f.write(str({"reviewerID": f"U{u}",
                             "asin": asins[int(rng.integers(0, 10))],
                             "unixReviewTime": t}) + "\n")
                t += 1
    schema, train, val, test = create_amazon_electronic_dataset(
        str(reviews), str(meta), maxlen=5
    )
    assert len(train["label"]) > 0
    assert train["hist"].shape[1] == 5
