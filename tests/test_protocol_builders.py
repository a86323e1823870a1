"""Round-3 generator/builder invariants (data/realistic.py additions)."""
import numpy as np

from recsys_tpu.data.realistic import (
    build_din_dataset_fast,
    realistic_multitask,
    realistic_ratings,
)


def test_realistic_ratings_meta_shapes_and_signal():
    df, meta = realistic_ratings(num_users=500, num_items=800, seed=3,
                                 return_meta=True)
    assert meta["item_cate"].shape == (801,)
    assert meta["item_cate"][0] == 0 and meta["item_cate"][1:].min() >= 1
    assert meta["user_age_bin"].shape == (501,)
    assert set(np.unique(meta["user_gender"][1:])) <= {1, 2}
    # category clustering carries signal: a user's items should repeat
    # categories far more than uniform draws would
    cats = meta["item_cate"][df["item_id"].to_numpy()]
    users = df["user_id"].to_numpy()
    top_frac = []
    for u in np.unique(users)[:50]:
        c = cats[users == u]
        top_frac.append(np.bincount(c).max() / len(c))
    n_cats = len(np.unique(meta["item_cate"][1:]))
    assert np.mean(top_frac) > 3.0 / n_cats * 2  # >> uniform share


def test_build_din_dataset_fast_invariants():
    df, meta = realistic_ratings(num_users=300, num_items=600, seed=5,
                                 return_meta=True)
    schema, train, val, test = build_din_dataset_fast(
        df, meta["item_cate"], meta["num_cates"], maxlen=12,
        max_train_positions=4,
    )
    # labels strictly alternate pos/neg (1:1 protocol)
    for d in (train, val, test):
        lab = d["label"]
        assert lab[0::2].min() == 1.0 and lab[1::2].max() == 0.0
        assert d["hist"].shape[1] == 12
        # pos/neg pairs share the SAME history
        np.testing.assert_array_equal(d["hist"][0::2], d["hist"][1::2])
        # hist_cate aligned with hist through the item->cate map
        np.testing.assert_array_equal(
            d["hist_cate"], meta["item_cate"][d["hist"]]
        )
    # every negative is a true non-interaction of its user
    users = df["user_id"].to_numpy()
    items = df["item_id"].to_numpy()
    seen = set(zip(users.tolist(), items.tolist()))
    # test rows are one (pos, neg) pair per kept user, user order = sorted
    kept = [u for u, c in zip(*np.unique(users, return_counts=True))
            if c >= 3]
    negs = test["sparse"][1::2, 0]
    assert len(negs) == len(kept)
    for u, n in zip(kept, negs.tolist()):
        assert (u, n) not in seen
    # positives: the held-out LAST item of each user
    df_sorted = df.sort_values(["user_id", "timestamp"], kind="mergesort")
    last = df_sorted.groupby("user_id")["item_id"].last()
    np.testing.assert_array_equal(
        test["sparse"][0::2, 0], last.loc[kept].to_numpy()
    )
    # train positions capped
    per_user_rows = len(train["label"]) / 2 / len(kept)
    assert per_user_rows <= 4.0 + 1e-9


def test_realistic_multitask_oracles_and_structure():
    schema, data, meta = realistic_multitask(num_examples=20000, seed=1)
    assert meta["oracle_auc_ctr"] > 0.75
    assert meta["oracle_auc_ctcvr"] > 0.8
    # ctcvr only fires on clicks (entire-space structure)
    assert np.all(data["ctcvr"] <= data["click"])
    assert 0.15 < data["click"].mean() < 0.35
    assert len(schema.sparse) == 12 and len(schema.dense) == 8


def test_census_protocol_rejects_unknown_models():
    """run_census must refuse model names it would otherwise silently map
    to PLE and mislabel in the report (round-4 self-review)."""
    import pytest

    from recsys_tpu.tools.protocol import run_census

    with pytest.raises(ValueError, match="esmm"):
        run_census(100, ["mmoe", "esmm"], batch_size=32, epochs=1)


def test_protocol_rows_default_resolution(tmp_path):
    """--rows None resolves per mode (1M ctr/multitask, 200k census); an
    explicit value is honored verbatim (the old 1M sentinel silently
    remapped census --rows 1000000 to 200k)."""
    import recsys_tpu.tools.protocol as proto

    calls = {}

    def fake_census(rows, models, batch_size, epochs, seed=0):
        calls["census"] = rows
        return {"rows": rows, "models": {}}

    orig = proto.run_census
    proto.run_census = fake_census
    try:
        out = str(tmp_path / "census.json")
        proto.main(["census", "--rows", "1000000", "--out", out])
        assert calls["census"] == 1_000_000
        proto.main(["census", "--out", out])
        assert calls["census"] == 200_000
    finally:
        proto.run_census = orig
