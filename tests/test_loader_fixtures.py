"""Loader round-trips on committed REAL-FORMAT files (VERDICT r4 #7).

Zero egress means the upstream datasets can't be fetched, so until this
round every ``create_*_dataset`` had only ever parsed in-memory frames in
tests.  tests/assets/make_fixtures.py writes a few hundred rows of each
dataset's exact on-disk format (tab/pipe/latin-1 ml-100k, header'd
ml-latest csv, python-literal amazon dumps, headerless 42-column census,
criteo with empty fields); these tests parse THE FILES and push each
result through one short fit."""
import os

import numpy as np
import pytest

from recsys_tpu.train.loop import Trainer

ASSETS = os.path.join(os.path.dirname(__file__), "assets")


def _fit_step(model, data, loss_fn=None, batch_size=64):
    kw = {} if loss_fn is None else {"loss_fn": loss_fn}
    tr = Trainer(model, learning_rate=1e-2, **kw)
    h = tr.fit(data, batch_size=batch_size, epochs=1, verbose=False)
    assert np.isfinite(h["loss"][0]), h
    return tr


def test_ml100k_files_round_trip():
    from recsys_tpu.data.movielens import create_ml_100k_dataset
    from recsys_tpu.models.match.two_tower import DSSM

    user_schema, item_schema, train, test = create_ml_100k_dataset(
        os.path.join(ASSETS, "ml100k"), embed_dim=8
    )
    assert train["user_sparse"].shape[1] == 4  # user_id, age_bin, gender, occ
    assert train["label"].max() == 1.0 and train["label"].min() == 0.0
    n = len(train["label"]) + len(test["label"])
    assert n == 555  # every u.data row survives the merge
    _fit_step(DSSM(user_schema, item_schema, user_units=(16,),
                   item_units=(16,), out_dim=8), train)


def test_sasrec_ratings_csv_round_trip():
    from recsys_tpu.data.movielens import create_sasrec_dataset
    from recsys_tpu.models.match.sasrec import SASRec
    from recsys_tpu.train import losses

    num_items, train, val, test = create_sasrec_dataset(
        os.path.join(ASSETS, "ml_latest_ratings.csv"), maxlen=10,
        test_neg_num=5,
    )
    assert num_items > 1
    assert train["hist"].shape[1] == 10
    assert test["neg"].shape[1] == 5
    _fit_step(
        SASRec(num_items=num_items, embed_dim=8, num_blocks=1,
               num_heads=1, max_len=10),
        train,
        loss_fn=lambda o, b: losses.pairwise_bce(
            o["pos_logits"], o["neg_logits"]
        ),
    )


def test_ncf_u_data_round_trip():
    from recsys_tpu.data.movielens import create_ncf_dataset
    from recsys_tpu.models.match.ncf import NCF
    from recsys_tpu.train import losses

    nu, ni, train, val, test = create_ncf_dataset(
        os.path.join(ASSETS, "ml100k", "u.data"), test_neg_num=20
    )
    assert nu == 60
    assert test["neg_item"].shape[1] == 20
    _fit_step(
        NCF(num_users=nu, num_items=ni, gmf_dim=8, mlp_dim=8,
            mlp_units=(16, 8)),
        train,
        loss_fn=lambda o, b: losses.pairwise_bce(
            o["pos_logits"], o["neg_logits"]
        ),
    )


def test_amazon_literal_json_round_trip():
    from recsys_tpu.data.amazon import create_amazon_electronic_dataset
    from recsys_tpu.models.ctr.din import DIN

    schema, train, val, test = create_amazon_electronic_dataset(
        os.path.join(ASSETS, "amazon_reviews.json"),
        os.path.join(ASSETS, "amazon_meta.json"),
        embed_dim=8, maxlen=10,
    )
    assert train["hist"].shape[1] == 10
    assert set(np.unique(train["label"])) == {0.0, 1.0}
    _fit_step(DIN(schema, att_hidden_units=(8,), ffn_hidden_units=(16,)),
              train)


def test_census_files_round_trip():
    from recsys_tpu.data.census import create_census_dataset
    from recsys_tpu.models.ctr.mmoe import MMoE
    from recsys_tpu.train import losses

    schema, train, val, test = create_census_dataset(
        os.path.join(ASSETS, "census_train.csv"),
        os.path.join(ASSETS, "census_test.csv"),
    )
    assert len(train["label_income"]) == 300
    assert len(val["label_income"]) == 60 and len(test["label_income"]) == 60
    assert 0.0 < train["label_income"].mean() < 1.0
    assert 0.0 < train["label_marital"].mean() < 1.0
    _fit_step(
        MMoE(schema, task_names=("income", "marital")),
        train,
        loss_fn=lambda o, b: losses.multi_task_bce(
            o, {"income": b["label_income"], "marital": b["label_marital"]}
        ),
    )


def test_criteo_sample_with_missing_fields_round_trip():
    from recsys_tpu.data.criteo import create_criteo_dataset
    from recsys_tpu.models.ctr.deepfm import DeepFM

    path = os.path.join(ASSETS, "criteo_sample.csv")
    schema, train, test = create_criteo_dataset(path, embed_dim=4)
    assert train["dense"].shape[1] == 13
    assert train["sparse"].shape[1] == 26
    assert len(train["label"]) + len(test["label"]) == 400
    # empty dense fields must not produce NaN after scaling
    assert np.isfinite(train["dense"]).all()
    _fit_step(DeepFM(schema), train)


def test_criteo_native_parser_on_sample_file():
    from recsys_tpu.data import native

    if not native.available():
        pytest.skip("native library unavailable")
    path = os.path.join(ASSETS, "criteo_sample.csv")
    labels, dense, sparse = native.parse_criteo(path, cat_buckets=1 << 12)
    assert labels.shape[0] == 400
    assert np.isfinite(dense).all()
    assert sparse.min() >= 0 and sparse.max() < (1 << 12)
