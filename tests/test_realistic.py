"""Distribution-realistic generators: statistical shape + protocol safety."""
import numpy as np

from recsys_tpu.data import realistic


def test_realistic_criteo_shapes_and_signal():
    vocabs = (50, 2000, 10_000, 7, 300, 40)
    schema, data, meta = realistic.realistic_criteo(
        num_examples=20_000, vocabs=vocabs, num_dense=4, embed_dim=8, seed=0
    )
    assert data["sparse"].shape == (20_000, 6)
    assert data["dense"].shape == (20_000, 4)
    assert data["dense"].min() >= 0.0 and data["dense"].max() <= 1.0
    for j, v in enumerate(vocabs):
        assert data["sparse"][:, j].max() < v
    # target CTR hit within sampling noise
    assert abs(meta["ctr"] - 0.25) < 0.02
    # planted signal gives a real oracle ceiling
    assert meta["oracle_auc"] > 0.75
    # Zipfian traffic: the most popular id in a 10k-vocab field carries far
    # more than the uniform share
    counts = np.bincount(data["sparse"][:, 2], minlength=10_000)
    assert counts.max() > 20 * len(data["sparse"]) / 10_000


def test_realistic_criteo_oracle_beats_models_without_interactions():
    # interactions are planted: first-order-only logit must score BELOW the
    # oracle (otherwise FM-family models have nothing to find)
    _, data, meta = realistic.realistic_criteo(
        num_examples=20_000, vocabs=(50, 60, 70, 80), num_dense=2,
        embed_dim=8, seed=1,
    )
    assert meta["oracle_auc"] > 0.7


def test_realistic_ratings_protocol_validity():
    df = realistic.realistic_ratings(
        num_users=500, num_items=300, mean_len=15, seed=0
    )
    assert set(df.columns) == {"user_id", "item_id", "rating", "timestamp"}
    g = df.groupby("user_id")
    lens = g.size()
    assert lens.min() >= 5
    # timestamps strictly increasing per user (valid chronological key)
    assert (g["timestamp"].diff().dropna() > 0).all()
    assert df["rating"].between(1, 5).all()
    # popularity skew: top-1% of items take a disproportionate share
    counts = df["item_id"].value_counts().to_numpy()
    assert counts[: max(1, len(counts) // 100)].sum() > 0.05 * len(df)
    # collaborative structure: no user rates the same item twice
    assert not df.duplicated(["user_id", "item_id"]).any()


def test_build_ncf_dataset_fast_matches_protocol():
    from recsys_tpu.data.movielens import build_ncf_dataset, synthetic_ratings

    ratings = synthetic_ratings(num_users=120, num_items=80, seed=3)
    nu, ni, tr, va, te = realistic.build_ncf_dataset_fast(ratings, seed=7)
    nu2, ni2, tr2, va2, te2 = build_ncf_dataset(ratings, seed=7)
    assert (nu, ni) == (nu2, ni2)
    # identical leave-last-2 structure (positives are deterministic)
    assert np.array_equal(tr["user"], tr2["user"])
    assert np.array_equal(tr["pos_item"], tr2["pos_item"])
    assert np.array_equal(te["pos_item"], te2["pos_item"])
    assert te["neg_item"].shape == (len(te["user"]), 100)
    # every sampled negative is a true non-interacted item
    interacted = {
        (int(u), int(i))
        for u, i in zip(tr2["user"], tr2["pos_item"])
    } | {(int(u), int(i)) for u, i in zip(te2["user"], te2["pos_item"])} | {
        (int(u), int(i)) for u, i in zip(va2["user"], va2["pos_item"])
    }
    for split in (tr, va, te):
        for u, negs in zip(split["user"], split["neg_item"]):
            for n in np.atleast_1d(negs):
                assert (int(u), int(n)) not in interacted


def test_realistic_ratings_sequence_signal():
    # the drift ordering must make the next item predictable: items adjacent
    # in a user's sequence are closer in drift value than random pairs
    df = realistic.realistic_ratings(
        num_users=300, num_items=400, mean_len=20, seed=2
    )
    by_user = df.sort_values(["user_id", "timestamp"]).groupby("user_id")[
        "item_id"
    ].apply(np.asarray)
    adjacent_gaps, random_gaps = [], []
    rng = np.random.default_rng(0)
    items = df["item_id"].to_numpy()
    for seq in by_user:
        if len(seq) < 3:
            continue
        adjacent_gaps.append(np.abs(np.diff(seq.astype(np.int64))).mean())
    # proxy: item ids are arbitrary, so instead check popularity-rank
    # autocorrelation via repeat-draw — sequences ordered by a global drift
    # means two users sharing items tend to order them the same way
    shared_agree, shared_total = 0, 0
    seqs = [s for s in by_user if len(s) >= 3][:100]
    pos = {}
    for si, s in enumerate(seqs):
        pos[si] = {int(it): r for r, it in enumerate(s)}
    for a in range(0, len(seqs) - 1, 2):
        common = set(pos[a]) & set(pos[a + 1])
        common = list(common)[:20]
        for x in range(len(common) - 1):
            for y in range(x + 1, len(common)):
                ia, ja = pos[a][common[x]], pos[a][common[y]]
                ib, jb = pos[a + 1][common[x]], pos[a + 1][common[y]]
                shared_total += 1
                if (ia < ja) == (ib < jb):
                    shared_agree += 1
    assert shared_total > 50
    assert shared_agree / shared_total > 0.7  # strong shared ordering


def test_realistic_census_roundtrips_through_loader():
    """realistic_census emits census-FORMAT csv frames that
    data/census.py::create_census_dataset parses end-to-end: labels decode
    from the reference's strings, features factorize, oracle ceilings are
    meaningfully above 0.5 (the planted signal is learnable)."""
    import os
    import tempfile

    import numpy as np

    from recsys_tpu.data.census import COLUMNS, create_census_dataset
    from recsys_tpu.data.realistic import realistic_census

    train_df, test_df, meta = realistic_census(num_train=3000, num_test=1000,
                                               seed=5)
    assert list(train_df.columns) == COLUMNS
    assert meta["oracle_auc_income"] > 0.75
    assert meta["oracle_auc_marital"] > 0.75
    tmp = tempfile.mkdtemp()
    trp = os.path.join(tmp, "census-income.data")
    tep = os.path.join(tmp, "census-income.test")
    train_df.to_csv(trp, index=False, header=False)
    test_df.to_csv(tep, index=False, header=False)
    schema, train, val, test = create_census_dataset(trp, tep)
    assert len(train["label_income"]) == 3000
    assert len(val["label_income"]) + len(test["label_income"]) == 1000
    # the loader's string matching must recover the generator's labels
    np.testing.assert_allclose(train["label_income"].mean(),
                               meta["income_rate"], atol=0.05)
    np.testing.assert_allclose(train["label_marital"].mean(),
                               meta["marital_rate"], atol=0.05)
    assert train["sparse"].shape[1] == 32 and train["dense"].shape[1] == 7
    # marital_stat and income_50k must NOT leak into the feature columns
    names = [f.name for f in schema.sparse]
    assert "marital_stat" not in names and "income_50k" not in names
