"""Reference-protocol quality runs at realistic scale.

The reference's entire quality surface is a metric printed after training on
real data (/root/reference/src/ctr/fm/train.py:61-67 AUC with EarlyStopping;
/root/reference/src/match/ncf/train.py:64-83 HR@10/NDCG@10 every 2 epochs;
faiss top-10 retrieval in the dssm/fm train scripts).  The real files cannot
be fetched here, so these runners execute the *exact* protocols — splits,
negative-sampling counts, loss, optimizer, early stopping, metrics — on the
distribution-realistic generators of data/realistic.py at reference scale
(>=1M Criteo-shaped rows, >=100k-user leave-last-2).  Results land in
BASELINE.md (round-1 VERDICT item 3).

    python -m recsys_tpu.tools.protocol ctr     [--rows 1000000] [--models fm,deepfm,...]
    python -m recsys_tpu.tools.protocol ncf     [--users 100000] [--items 20000]
    python -m recsys_tpu.tools.protocol sasrec  [--users 100000] [--maxlen 50]
    python -m recsys_tpu.tools.protocol seqret  [--users 100000]   # YoutubeDNN recall@10
    python -m recsys_tpu.tools.protocol din     [--users 100000] [--maxlen 40]
    python -m recsys_tpu.tools.protocol multitask [--rows 1000000] [--models esmm,mmoe,ple]
    python -m recsys_tpu.tools.protocol mind    [--users 100000]   # multi-interest recall@10
    python -m recsys_tpu.tools.protocol dssm    [--users 100000] [--models dssm,senet,fm_match]
    python -m recsys_tpu.tools.protocol census  [--rows 200000]   # census-format two-task via data/census.py

Each mode prints one JSON object with the measured metrics (and the
generator's oracle ceiling where defined).  Round-3 quality-forensics
knobs (VERDICT r2): ``--patience 0`` lifts early stopping (fixed-epoch
runs for the deep-vs-FM investigation), ``--lr`` overrides Adam's 1e-3,
``--embedding-optimizer rowwise_adagrad`` / ``--embedding-engine a2a``
run the CTR protocol through the production configs.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _log(msg: str):
    print(msg, file=sys.stderr, flush=True)


from recsys_tpu.tools import enable_compile_cache as _enable_compile_cache


def run_ctr(rows: int, models: list[str], embed_dim: int, batch_size: int,
            epochs: int, seed: int = 0, patience: int | None = 1,
            lr: float = 1e-3, embedding_optimizer: str | None = None,
            embedding_engine: str | None = None,
            teacher: str = "fm", embedding_lr: float | None = None,
            table_dtype: str = "f32") -> dict:
    """CTR AUC protocol: 80/20 split, 10% val, Adam 1e-3, EarlyStopping
    (val_loss, patience=1) — /root/reference/src/ctr/fm/train.py:32-34,58-67
    — on Zipfian Criteo-shaped data at reference vocab magnitudes.

    ``patience=None`` lifts early stopping (fixed ``epochs``);
    ``embedding_optimizer`` routes the tables through the sparse/fused
    paths; ``embedding_engine`` ('a2a', ...) runs the explicit sharded
    lookup on a dp-mesh over the local devices (the production configs —
    VERDICT r2 next-step #4)."""
    import jax
    import jax.numpy as jnp

    from recsys_tpu.cli import _ctr_model
    from recsys_tpu.data.realistic import realistic_criteo
    from recsys_tpu.train.loop import Trainer

    t0 = time.time()
    schema, data, meta = realistic_criteo(
        num_examples=rows, embed_dim=embed_dim, seed=seed, teacher=teacher
    )
    _log(f"generated {rows} rows in {time.time() - t0:.1f}s "
         f"(ctr={meta['ctr']:.3f}, oracle AUC={meta['oracle_auc']:.4f})")
    rng = np.random.default_rng(seed)
    idx = rng.permutation(rows)
    cut = int(rows * 0.8)
    train = {k: v[idx[:cut]] for k, v in data.items()}
    test = {k: v[idx[cut:]] for k, v in data.items()}

    mesh = None
    if embedding_engine:
        from recsys_tpu.parallel.mesh import make_mesh

        if jax.default_backend() == "cpu":
            # XLA:CPU deadlocks when async dispatch interleaves two
            # in-flight executions' cross-module collectives (rendezvous
            # stuck at different op_ids) — serialize executions on the
            # virtual mesh
            jax.config.update("jax_cpu_enable_async_dispatch", False)
        n = len(jax.devices())
        mesh = make_mesh(data=max(1, n // 2), model=min(2, n))

    if mesh is None:
        # one-time process costs otherwise land on the first model's
        # `seconds` (round 3's fm showed 572s vs 70s for the second model)
        _warm_process(schema, train, batch_size)

    out = {"rows": rows, "oracle_auc": round(meta["oracle_auc"], 4),
           "ctr": round(meta["ctr"], 4), "models": {}}
    if embedding_engine:
        out["embedding_engine"] = embedding_engine
    if embedding_optimizer:
        out["embedding_optimizer"] = embedding_optimizer
    out["teacher"] = teacher
    if table_dtype != "f32":
        out["table_dtype"] = table_dtype
    if patience is None:
        out["early_stopping"] = "lifted"
    for name in models:
        t0 = time.time()
        kw = {"compute_dtype": jnp.bfloat16} if name == "dlrm" else {}
        tkw = {}
        if embedding_optimizer:
            kw["sparse_embed_grads"] = True
            tkw["embedding_optimizer"] = embedding_optimizer
        if embedding_engine:
            kw["embed_kw"] = {"engine": embedding_engine, "mesh": mesh}
        if table_dtype == "bf16":
            kw.setdefault("embed_kw", {})["param_dtype"] = jnp.bfloat16
        if embedding_optimizer and embedding_lr is not None:
            tkw["embedding_lr"] = embedding_lr
        tr = Trainer(_ctr_model(name, schema, **kw), learning_rate=lr,
                     mesh=mesh, **tkw)
        hist = tr.fit(train, batch_size=batch_size, epochs=epochs,
                      validation_split=0.1,
                      early_stopping_patience=patience,
                      verbose=False)
        if "a2a_dropped" in hist:
            out["models"].setdefault(name, {})
            out.setdefault("a2a_dropped", {})[name] = int(
                np.sum(hist["a2a_dropped"])
            )
        auc = tr.evaluate_auc(test)
        out["models"][name] = {
            "test_auc": round(float(auc), 4),
            "pct_of_oracle": round(100 * (auc - 0.5) /
                                   (meta["oracle_auc"] - 0.5), 1),
            "epochs_ran": len(hist["loss"]),
            "seconds": round(time.time() - t0, 1),
        }
        _log(f"{name}: AUC {auc:.4f} "
             f"({out['models'][name]['pct_of_oracle']}% of oracle margin, "
             f"{out['models'][name]['epochs_ran']} epochs, "
             f"{out['models'][name]['seconds']}s)")
        del tr
    return out


def run_ncf(users: int, items: int, batch_size: int, epochs: int,
            seed: int = 0) -> dict:
    """NCF leave-last-2 + 100-negative HR@10/NDCG@10 every 2 epochs
    (/root/reference/src/match/ncf/train.py:54-83, eval fn :11-26) at
    100k-user scale (batch scaled up from the reference's 128 for the 25x
    larger train set; loss/optimizer/splits/negatives identical)."""
    import jax

    from recsys_tpu.data.realistic import build_ncf_dataset_fast, realistic_ratings
    from recsys_tpu.models.match.ncf import NCF
    from recsys_tpu.train import losses
    from recsys_tpu.train.loop import Trainer
    from recsys_tpu.train.metrics import hit_rate_ndcg_at_k

    t0 = time.time()
    ratings = realistic_ratings(num_users=users, num_items=items, seed=seed)
    nu, ni, train, val, test = build_ncf_dataset_fast(ratings)
    _log(f"built {len(train['user'])} train rows / {nu} users / {ni} items "
         f"in {time.time() - t0:.1f}s")

    model = NCF(num_users=nu, num_items=ni)

    def loss_fn(out, batch):
        return losses.pairwise_bce(out["pos_logits"], out["neg_logits"])

    history = []

    def eval_fn(trainer):
        out = trainer.predict(test)
        hr, ndcg = hit_rate_ndcg_at_k(
            jax.numpy.asarray(out["pos_logits"]),
            jax.numpy.asarray(out["neg_logits"]), k=10,
        )
        history.append((float(hr), float(ndcg)))
        return {"HR@10": float(hr), "NDCG@10": float(ndcg)}

    tr = Trainer(model, loss_fn=loss_fn, learning_rate=1e-3)
    tr.fit(train, batch_size=batch_size, epochs=epochs,
           eval_fn=eval_fn, eval_every=2, verbose=True)
    best = max(history) if history else (0.0, 0.0)
    return {
        "users": nu, "items": ni, "train_rows": int(len(train["user"])),
        "HR@10": round(history[-1][0], 4), "NDCG@10": round(history[-1][1], 4),
        "best_HR@10": round(best[0], 4),
        "random_HR@10": round(10 / 101, 4),
    }


def run_sasrec(users: int, items: int, maxlen: int, batch_size: int,
               epochs: int, seed: int = 0, drift_scale: float = 6.0) -> dict:
    """SASRec leave-last-2 with 20 test negatives (/root/reference/src/match/
    utils/data_process.py:84-145 protocol), all-position training, at
    100k-user scale via the native C++ builder."""
    import jax

    from recsys_tpu.data.movielens import build_sasrec_dataset
    from recsys_tpu.data.realistic import realistic_ratings
    from recsys_tpu.models.match.sasrec import SASRec
    from recsys_tpu.train import losses
    from recsys_tpu.train.loop import Trainer
    from recsys_tpu.train.metrics import hit_rate_ndcg_at_k

    t0 = time.time()
    ratings = realistic_ratings(num_users=users, num_items=items, seed=seed,
                                drift_scale=drift_scale)
    ni, train, val, test = build_sasrec_dataset(
        ratings, maxlen=maxlen, test_neg_num=20, all_positions=True,
        use_native="auto",
    )
    _log(f"built {len(train['hist'])} train sequences / {ni} items "
         f"in {time.time() - t0:.1f}s")

    model = SASRec(num_items=ni, embed_dim=64, max_len=maxlen)

    def loss_fn(out, batch):
        return losses.pairwise_bce(out["pos_logits"], out["neg_logits"],
                                   mask=out.get("mask"))

    tr = Trainer(model, loss_fn=loss_fn, learning_rate=1e-3)
    tr.fit(train, batch_size=batch_size, epochs=epochs, verbose=True)
    out = tr.predict(test)
    hr, ndcg = hit_rate_ndcg_at_k(
        jax.numpy.asarray(out["pos_logits"]),
        jax.numpy.asarray(out["neg_logits"]), k=10,
    )
    return {
        "users": users, "items": ni, "maxlen": maxlen,
        "drift_scale": drift_scale,
        "HR@10": round(float(hr), 4), "NDCG@10": round(float(ndcg), 4),
        "random_HR@10": round(10 / 21, 4),
    }


def run_seqret(users: int, items: int, maxlen: int, batch_size: int,
               epochs: int, seed: int = 0) -> dict:
    """YoutubeDNN next-item retrieval: in-batch softmax with logQ correction,
    recall@10 over the FULL catalog via the brute-force top-k engine (the
    faiss IndexFlatIP replacement — /root/reference/src/match/dssm/
    dssm_train.py:74-78)."""
    import jax.numpy as jnp

    from recsys_tpu.core.features import FeatureSchema, VarLenSparseFeature
    from recsys_tpu.data.movielens import build_seq_retrieval_dataset
    from recsys_tpu.data.realistic import realistic_ratings
    from recsys_tpu.models.match.youtube_dnn import YoutubeDNN
    from recsys_tpu.train import losses
    from recsys_tpu.train.loop import Trainer
    from recsys_tpu.train.metrics import recall_at_k
    from recsys_tpu.train.retrieval import topk_scores

    t0 = time.time()
    ratings = realistic_ratings(num_users=users, num_items=items, seed=seed)
    ni, train, test = build_seq_retrieval_dataset(ratings, maxlen=maxlen)
    _log(f"built {len(train['hist'])} train rows / {ni} items "
         f"in {time.time() - t0:.1f}s")

    schema = FeatureSchema(
        varlen=[VarLenSparseFeature("hist_item", ni, 32, max_len=maxlen)]
    )
    model = YoutubeDNN(schema, num_items=ni, embed_dim=32)
    counts = np.bincount(train["item_id"], minlength=ni)
    log_q = jnp.asarray(losses.popularity_log_q(counts))

    def loss_fn(out, batch):
        return losses.in_batch_sampled_softmax(
            out["user"], out["item"], item_log_q=log_q[batch["item_id"]])

    tr = Trainer(model, loss_fn=loss_fn, learning_rate=1e-3)
    tr.fit(train, batch_size=batch_size, epochs=epochs, verbose=True)

    variables = {"params": tr.state.params, "batch_stats": tr.state.batch_stats}
    item_embs = model.apply(variables, method=model.all_item_embeddings)
    hits = []
    for s in range(0, len(test["item_id"]), 8192):
        u = model.apply(
            variables, {"hist": jnp.asarray(test["hist"][s:s + 8192])},
            method=model.user_embed,
        )
        _, I = topk_scores(u, item_embs, k=10)
        hits.append(np.asarray(I))
    r = recall_at_k(np.concatenate(hits), test["item_id"])
    return {
        "users": users, "items": ni,
        "recall@10": round(float(r), 4),
        "random_recall@10": round(10 / ni, 5),
    }


def run_din(users: int, items: int, maxlen: int, batch_size: int,
            epochs: int, seed: int = 0) -> dict:
    """DIN Amazon-Electronics protocol at scale: per-user chronological
    split, 1:1 random negatives, history padded to maxlen=40, AUC
    (/root/reference/src/ctr/din/train.py:92-114 with the readme's real
    dataset, protocol in src/ctr/utils/data_process.py:121-227) — on
    category-clustered review sequences (data/realistic.realistic_ratings
    return_meta categories).  Train positions capped at the 12 most recent
    per user to bound host memory; batch scaled from the reference's 32
    for the 100k-user set."""
    from recsys_tpu.data.realistic import (
        build_din_dataset_fast, realistic_ratings,
    )
    from recsys_tpu.models.ctr.din import DIN
    from recsys_tpu.train.loop import Trainer

    t0 = time.time()
    ratings, meta = realistic_ratings(num_users=users, num_items=items,
                                      seed=seed, return_meta=True)
    schema, train, val, test = build_din_dataset_fast(
        ratings, meta["item_cate"], meta["num_cates"], maxlen=maxlen,
        max_train_positions=12, seed=seed,
    )
    _log(f"built {len(train['label'])} train rows / "
         f"{len(test['label'])} test rows in {time.time() - t0:.1f}s")
    tr = Trainer(DIN(schema), learning_rate=1e-3)
    hist = tr.fit(train, batch_size=batch_size, epochs=epochs,
                  val_data=val, early_stopping_patience=1, verbose=True)
    auc = tr.evaluate_auc(test)
    return {
        "users": users, "items": items, "maxlen": maxlen,
        "train_rows": int(len(train["label"])),
        "test_auc": round(float(auc), 4),
        "epochs_ran": len(hist["loss"]),
    }


def _warm_process(schema, data, batch_size: int):
    """One throwaway 2-batch fit so per-model ``seconds`` exclude the
    process's one-time costs (backend/PJRT init, first-jit machinery) —
    they otherwise land entirely on whichever model runs first."""
    from recsys_tpu.models.ctr.mmoe import MMoE
    from recsys_tpu.train import losses
    from recsys_tpu.train.loop import Trainer

    t0 = time.time()
    small = {k: v[: 2 * batch_size] for k, v in data.items()}
    label_keys = [k for k in small if k not in ("dense", "sparse")]
    tasks = tuple(f"t{i}" for i in range(len(label_keys)))

    def loss_fn(o, b):
        return losses.multi_task_bce(
            o, {t: b[k] for t, k in zip(tasks, label_keys)}
        )

    tr = Trainer(MMoE(schema, task_names=tasks), loss_fn=loss_fn)
    tr.fit(small, batch_size=batch_size, epochs=1, val_data=small,
           verbose=False)
    tr.predict(small)
    _log(f"process warmup {time.time() - t0:.1f}s (excluded from per-model "
         "seconds)")


def run_multitask(rows: int, models: list[str], batch_size: int,
                  epochs: int, seed: int = 0) -> dict:
    """ESMM/MMoE/PLE two-head AUC at scale (reference protocol:
    /root/reference/src/ctr/esmm/train.py:96-123, mmoe/train.py:95-105 —
    Adam, BCE per head, AUC per head) on planted shared-structure
    click/conversion data with oracle ceilings."""
    from recsys_tpu.data.realistic import realistic_multitask
    from recsys_tpu.train import losses
    from recsys_tpu.train.loop import Trainer
    from recsys_tpu.train.metrics import auc_exact

    import jax

    t0 = time.time()
    schema, data, meta = realistic_multitask(num_examples=rows, seed=seed)
    _log(f"generated {rows} rows in {time.time() - t0:.1f}s "
         f"(oracle ctr {meta['oracle_auc_ctr']:.4f}, "
         f"ctcvr {meta['oracle_auc_ctcvr']:.4f})")
    rng = np.random.default_rng(seed)
    idx = rng.permutation(rows)
    cut = int(rows * 0.8)
    train = {k: v[idx[:cut]] for k, v in data.items()}
    test = {k: v[idx[cut:]] for k, v in data.items()}

    # Warm the process ONCE before any timed model: the first model in a
    # process absorbs backend init + first-compile machinery (measured by
    # order swap: whichever of esmm/mmoe runs first costs ~2-4x the other;
    # round-3's 'esmm 210.9s vs mmoe 49.3s' was exactly this — esmm is the
    # FASTEST of the three once order-controlled; VERDICT r3 weak #7).
    _warm_process(schema, train, batch_size)

    out = {"rows": rows,
           "oracle_auc_ctr": round(meta["oracle_auc_ctr"], 4),
           "oracle_auc_ctcvr": round(meta["oracle_auc_ctcvr"], 4),
           "models": {}}
    for name in models:
        t0 = time.time()
        if name == "esmm":
            from recsys_tpu.models.ctr.esmm import ESMM

            model = ESMM(schema, num_user_fields=len(schema.sparse) // 2)

            def loss_fn(o, b):
                return losses.bce_probs(o["ctr"], b["click"]) + \
                    losses.bce_probs(o["ctcvr"], b["ctcvr"])
            heads, from_logits = ("ctr", "ctcvr"), False
        else:
            if name == "mmoe":
                from recsys_tpu.models.ctr.mmoe import MMoE as M
            else:
                from recsys_tpu.models.ctr.ple import PLE as M
            model = M(schema, task_names=("click", "ctcvr"))

            def loss_fn(o, b):
                return losses.multi_task_bce(
                    o, {"click": b["click"], "ctcvr": b["ctcvr"]}
                )
            heads, from_logits = ("click", "ctcvr"), True
        tr = Trainer(model, loss_fn=loss_fn, learning_rate=1e-3)
        hist = tr.fit(train, batch_size=batch_size, epochs=epochs,
                      validation_split=0.1, early_stopping_patience=1,
                      verbose=False)
        preds = tr.predict(test)
        row = {"epochs_ran": len(hist["loss"]),
               "seconds": round(time.time() - t0, 1)}
        for head, label in zip(heads, ("click", "ctcvr")):
            pr = preds[head]
            if from_logits:
                pr = np.asarray(jax.nn.sigmoid(pr))
            row[f"auc_{label}"] = round(float(auc_exact(pr, test[label])), 4)
        out["models"][name] = row
        _log(f"{name}: {row}")
        del tr
    return out


def run_census(rows: int, models: list[str], batch_size: int,
               epochs: int, seed: int = 0) -> dict:
    """The census-income two-task protocol END TO END through the
    data/census.py loader (/root/reference/src/ctr/utils/data_process.py:
    229-294): census-FORMAT csv files (generated at scale with planted
    structure, data/realistic.realistic_census) -> create_census_dataset
    (string label parsing, per-column factorize, 1:1 val/test split of the
    test file) -> MMoE/PLE two-head training -> AUC(income), AUC(marital).
    Closes the one reference protocol never exercised at scale
    (VERDICT r3 missing #4)."""
    import os
    import tempfile

    import jax

    from recsys_tpu.data.census import create_census_dataset
    from recsys_tpu.data.realistic import realistic_census
    from recsys_tpu.train import losses
    from recsys_tpu.train.loop import Trainer
    from recsys_tpu.train.metrics import auc_exact

    unknown = [m for m in models if m not in ("mmoe", "ple")]
    if unknown:
        raise ValueError(f"census protocol supports mmoe/ple, got {unknown}")

    t0 = time.time()
    n_test = max(rows // 2, 1)
    train_df, test_df, meta = realistic_census(num_train=rows,
                                               num_test=n_test, seed=seed)
    with tempfile.TemporaryDirectory(prefix="census_") as tmp:
        train_path = os.path.join(tmp, "census-income.data")
        test_path = os.path.join(tmp, "census-income.test")
        train_df.to_csv(train_path, index=False, header=False)
        test_df.to_csv(test_path, index=False, header=False)
        _log(f"generated census files ({rows}+{n_test} rows) in "
             f"{time.time() - t0:.1f}s (oracle income "
             f"{meta['oracle_auc_income']:.4f}, marital "
             f"{meta['oracle_auc_marital']:.4f})")

        t0 = time.time()
        schema, train, val, test = create_census_dataset(train_path,
                                                         test_path)
    _log(f"loader parsed + encoded in {time.time() - t0:.1f}s "
         f"({len(schema.sparse)} sparse, {len(schema.dense)} dense fields)")

    _warm_process(schema, train, batch_size)

    out = {"rows": rows,
           "oracle_auc_income": round(meta["oracle_auc_income"], 4),
           "oracle_auc_marital": round(meta["oracle_auc_marital"], 4),
           "models": {}}
    for name in models:
        t0 = time.time()
        if name == "mmoe":
            from recsys_tpu.models.ctr.mmoe import MMoE as M
        else:
            from recsys_tpu.models.ctr.ple import PLE as M
        model = M(schema, task_names=("income", "marital"))

        def loss_fn(o, b):
            return losses.multi_task_bce(
                o, {"income": b["label_income"],
                    "marital": b["label_marital"]}
            )

        tr = Trainer(model, loss_fn=loss_fn, learning_rate=1e-3)
        hist = tr.fit(train, batch_size=batch_size, epochs=epochs,
                      val_data=val, early_stopping_patience=1,
                      verbose=False)
        preds = tr.predict(test)
        row = {"epochs_ran": len(hist["loss"]),
               "seconds": round(time.time() - t0, 1)}
        for head in ("income", "marital"):
            pr = np.asarray(jax.nn.sigmoid(preds[head]))
            row[f"auc_{head}"] = round(
                float(auc_exact(pr, test[f"label_{head}"])), 4
            )
        out["models"][name] = row
        _log(f"{name}: {row}")
        del tr
    return out


def run_mind(users: int, items: int, maxlen: int, batch_size: int,
             epochs: int, seed: int = 0) -> dict:
    """MIND multi-interest retrieval: in-batch softmax + logQ training,
    recall@10 over the full catalog with per-capsule max scoring
    (/root/reference/src/match/mind/model.py:57-140 capability at
    reference protocol scale)."""
    import jax.numpy as jnp

    from recsys_tpu.data.movielens import build_seq_retrieval_dataset
    from recsys_tpu.data.realistic import realistic_ratings
    from recsys_tpu.models.match.mind import MIND
    from recsys_tpu.train import losses
    from recsys_tpu.train.loop import Trainer
    from recsys_tpu.train.metrics import recall_at_k
    from recsys_tpu.train.retrieval import topk_scores

    t0 = time.time()
    ratings = realistic_ratings(num_users=users, num_items=items, seed=seed)
    ni, train, test = build_seq_retrieval_dataset(ratings, maxlen=maxlen)
    _log(f"built {len(train['hist'])} train rows / {ni} items "
         f"in {time.time() - t0:.1f}s")

    model = MIND(num_items=ni, embed_dim=32, k_max=4)
    counts = np.bincount(train["item_id"], minlength=ni)
    log_q = jnp.asarray(losses.popularity_log_q(counts))

    def loss_fn(out, batch):
        return losses.in_batch_sampled_softmax(
            out["user"], out["item"], item_log_q=log_q[batch["item_id"]])

    tr = Trainer(model, loss_fn=loss_fn, learning_rate=1e-3)
    tr.fit(train, batch_size=batch_size, epochs=epochs, verbose=True)

    variables = {"params": tr.state.params,
                 "batch_stats": tr.state.batch_stats}
    item_embs = model.apply(variables, method=model.all_item_embeddings)
    hits = []
    k = 10
    for s in range(0, len(test["item_id"]), 4096):
        caps = model.apply(
            variables, {"hist": jnp.asarray(test["hist"][s:s + 4096])},
            method=model.interests,
        )  # (B, K, D)
        b, km, d = caps.shape
        v, I = topk_scores(caps.reshape(b * km, d), item_embs, k=k)
        v = np.asarray(v).reshape(b, km * k)
        I = np.asarray(I).reshape(b, km * k)
        # merge the per-capsule top-10s: exactly 10 distinct items per user
        merged = np.empty((b, k), np.int64)
        order = np.argsort(-v, axis=1, kind="mergesort")
        for r in range(b):
            seen, out_row = set(), []
            for c in order[r]:
                it = int(I[r, c])
                if it not in seen:
                    seen.add(it)
                    out_row.append(it)
                    if len(out_row) == k:
                        break
            merged[r] = out_row + [-1] * (k - len(out_row))
        hits.append(merged)
    r = recall_at_k(np.concatenate(hits), test["item_id"])
    return {
        "users": users, "items": ni, "k_max": 4,
        "recall@10": round(float(r), 4),
        "random_recall@10": round(10 / ni, 5),
    }


def run_dssm(users: int, items: int, models: list[str], batch_size: int,
             epochs: int, seed: int = 0) -> dict:
    """Two-tower retrieval (DSSM / SENet-DSSM / FM-match) with real side
    features at 100k-user scale: recall@10 over the full catalog via the
    brute-force engine — the reference's dssm_train faiss flow
    (/root/reference/src/match/dssm/dssm_train.py:63-96) with a real
    metric.  DSSM/SENet train with in-batch softmax + logQ (the framework
    default); FM-match trains the reference's BCE-on-rated-pairs protocol
    (label = rating>=3, /root/reference/src/match/utils/data_process.py:
    12-18)."""
    import jax.numpy as jnp

    from recsys_tpu.core.features import FeatureSchema, SparseFeature
    from recsys_tpu.data.realistic import realistic_ratings
    from recsys_tpu.models.match.fm_match import FMMatch
    from recsys_tpu.models.match.two_tower import TwoTower
    from recsys_tpu.train import losses
    from recsys_tpu.train.loop import Trainer
    from recsys_tpu.train.metrics import recall_at_k
    from recsys_tpu.train.retrieval import topk_scores

    t0 = time.time()
    ratings, meta = realistic_ratings(num_users=users, num_items=items,
                                      seed=seed, return_meta=True)
    df = ratings.sort_values(["user_id", "timestamp"], kind="mergesort")
    u = df["user_id"].to_numpy()
    i = df["item_id"].to_numpy().astype(np.int32)
    rat = df["rating"].to_numpy()
    uniq, starts, counts = np.unique(u, return_index=True,
                                     return_counts=True)
    ends = starts + counts
    last = ends - 1
    is_last = np.zeros(len(u), bool)
    is_last[last] = True
    label = (rat >= 3).astype(np.float32)  # reference get_label threshold

    def user_feats(user_ids):
        return np.stack([
            user_ids.astype(np.int32),
            meta["user_age_bin"][user_ids],
            meta["user_gender"][user_ids],
            meta["user_occupation"][user_ids],
        ], axis=1).astype(np.int32)

    def item_feats(item_ids):
        return np.stack([
            item_ids.astype(np.int32),
            meta["item_cate"][item_ids],
        ], axis=1).astype(np.int32)

    tr_mask = ~is_last
    test_ok = label[last] > 0  # held-out item must pass the threshold
    test_users, test_items = uniq[test_ok], i[last][test_ok]

    user_schema = FeatureSchema(sparse=[
        SparseFeature("user_id", int(u.max()) + 1, 16),
        SparseFeature("age_bin", 9, 16),
        SparseFeature("gender", 3, 16),
        SparseFeature("occupation", meta["num_occupations"], 16),
    ])
    item_schema = FeatureSchema(sparse=[
        SparseFeature("item_id", items + 1, 16),
        SparseFeature("cate", meta["num_cates"], 16),
    ])
    _log(f"built {int(tr_mask.sum())} train rows / "
         f"{len(test_users)} test users in {time.time() - t0:.1f}s")

    catalog = {"item_sparse": item_feats(np.arange(1, items + 1))}
    out = {"users": users, "items": items,
           "random_recall@10": round(10 / items, 5), "models": {}}
    for name in models:
        t0 = time.time()
        if name == "fm_match":
            model = FMMatch(user_schema, item_schema)
            train = {
                "user_sparse": user_feats(u[tr_mask]),
                "item_sparse": item_feats(i[tr_mask]),
                "label": label[tr_mask],
            }
            tr = Trainer(model, learning_rate=1e-3)
        else:
            model = TwoTower(user_schema, item_schema, out_dim=32,
                             use_senet=(name == "senet"),
                             output_mode="pair")
            pos = tr_mask & (label > 0)
            train = {
                "user_sparse": user_feats(u[pos]),
                "item_sparse": item_feats(i[pos]),
                "item_id": i[pos].astype(np.int32),
            }
            cnt = np.bincount(i[pos], minlength=items + 1)
            log_q = jnp.asarray(losses.popularity_log_q(cnt))

            def loss_fn(o, b, log_q=log_q):
                return losses.in_batch_sampled_softmax(
                    o["user"], o["item"], item_log_q=log_q[b["item_id"]])

            tr = Trainer(model, loss_fn=loss_fn, learning_rate=1e-3)
        tr.fit(train, batch_size=batch_size, epochs=epochs, verbose=False)

        variables = {"params": tr.state.params,
                     "batch_stats": tr.state.batch_stats}
        item_embs = np.concatenate([
            np.asarray(model.apply(
                variables,
                {"item_sparse": jnp.asarray(
                    catalog["item_sparse"][s:s + 8192])},
                method=model.item_embed,
            )) for s in range(0, items, 8192)
        ])
        hits = []
        for s in range(0, len(test_users), 8192):
            ue = model.apply(
                variables,
                {"user_sparse": jnp.asarray(
                    user_feats(test_users[s:s + 8192]))},
                method=model.user_embed,
            )
            _, I = topk_scores(ue, jnp.asarray(item_embs), k=10)
            hits.append(np.asarray(I) + 1)  # catalog row r = item id r+1
        r = recall_at_k(np.concatenate(hits), test_items)
        out["models"][name] = {
            "recall@10": round(float(r), 4),
            "seconds": round(time.time() - t0, 1),
        }
        _log(f"{name}: recall@10 {r:.4f}")
        del tr
    return out


_DEFAULT_CTR_MODELS = "fm,deepfm,widedeep,deepcrossing,dcn,dlrm,autoint"


def main(argv=None):
    _enable_compile_cache()
    p = argparse.ArgumentParser(prog="recsys_tpu.tools.protocol")
    p.add_argument("mode", choices=["ctr", "ncf", "sasrec", "seqret",
                                    "din", "multitask", "mind", "dssm",
                                    "census"])
    def _positive_int(s: str) -> int:
        v = int(s)
        if v <= 0:
            raise argparse.ArgumentTypeError(f"must be positive, got {v}")
        return v

    p.add_argument("--rows", type=_positive_int, default=None,
                   help="dataset rows (default: 1M for ctr/multitask, "
                   "200k for census)")
    p.add_argument("--users", type=int, default=100_000)
    p.add_argument("--items", type=int, default=20_000)
    p.add_argument("--models", default=_DEFAULT_CTR_MODELS)
    p.add_argument("--embed-dim", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=0)
    p.add_argument("--epochs", type=int, default=0)
    p.add_argument("--maxlen", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--patience", type=int, default=1,
                   help="early-stopping patience; 0 lifts early stopping "
                   "(fixed --epochs runs)")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--embedding-optimizer", default=None,
                   choices=[None, "lazy_adam", "rowwise_adagrad",
                            "fused_adam", "fused_rowwise_adagrad"])
    p.add_argument("--embedding-engine", default=None,
                   choices=[None, "psum", "dedup", "a2a", "a2a_pipelined"])
    p.add_argument("--drift-scale", type=float, default=6.0,
                   help="sasrec generator sequence-drift strength; 2.0 is "
                   "the non-saturated operating point (VERDICT r2 weak #5)")
    p.add_argument("--embedding-lr", type=float, default=None,
                   help="separate LR for the table optimizer (AdaGrad "
                   "variants typically want ~1e-2)")
    p.add_argument("--table-dtype", default="f32",
                   choices=["f32", "bf16"],
                   help="embedding master-table dtype (ctr mode): bf16 is "
                   "the byte-diet lever — AUC parity vs f32 is this "
                   "flag's validation purpose")
    p.add_argument("--teacher", default="fm", choices=["fm", "mlp"],
                   help="ctr generator teacher: 'fm' (FM-realizable; FM is "
                   "the Bayes form) or 'mlp' (non-multiplicative; the "
                   "deep-model discriminator)")
    p.add_argument("--out", default=None,
                   help="also write the JSON report here (verified "
                   "non-empty)")
    args = p.parse_args(argv)

    if args.mode == "ctr":
        rep = run_ctr(args.rows or 1_000_000, args.models.split(","),
                      args.embed_dim,
                      args.batch_size or 512, args.epochs or 10, args.seed,
                      patience=args.patience or None, lr=args.lr,
                      embedding_optimizer=args.embedding_optimizer,
                      embedding_engine=args.embedding_engine,
                      teacher=args.teacher, embedding_lr=args.embedding_lr,
                      table_dtype=args.table_dtype)
    elif args.mode == "ncf":
        rep = run_ncf(args.users, args.items, args.batch_size or 1024,
                      args.epochs or 8, args.seed)
    elif args.mode == "sasrec":
        rep = run_sasrec(args.users, args.items, args.maxlen,
                         args.batch_size or 256, args.epochs or 5, args.seed,
                         drift_scale=args.drift_scale)
    elif args.mode == "seqret":
        rep = run_seqret(args.users, args.items, args.maxlen,
                         args.batch_size or 1024, args.epochs or 5, args.seed)
    elif args.mode == "din":
        rep = run_din(args.users, args.items,
                      args.maxlen if args.maxlen != 50 else 40,
                      args.batch_size or 1024, args.epochs or 3, args.seed)
    elif args.mode == "multitask":
        models = (args.models if args.models != _DEFAULT_CTR_MODELS
                  else "esmm,mmoe,ple")
        rep = run_multitask(args.rows or 1_000_000, models.split(","),
                            args.batch_size or 512, args.epochs or 5,
                            args.seed)
    elif args.mode == "census":
        models = (args.models if args.models != _DEFAULT_CTR_MODELS
                  else "mmoe,ple")
        rep = run_census(args.rows or 200_000,
                         models.split(","), args.batch_size or 512,
                         args.epochs or 5, args.seed)
    elif args.mode == "mind":
        rep = run_mind(args.users, args.items, args.maxlen,
                       args.batch_size or 1024, args.epochs or 5, args.seed)
    else:
        models = (args.models if args.models != _DEFAULT_CTR_MODELS
                  else "dssm,senet,fm_match")
        rep = run_dssm(args.users, args.items, models.split(","),
                       args.batch_size or 2048, args.epochs or 4, args.seed)
    rep["mode"] = args.mode
    payload = json.dumps(rep)
    if args.out:
        import os

        with open(args.out, "w") as f:
            f.write(payload + "\n")
        if os.path.getsize(args.out) <= 2:
            raise RuntimeError(f"artifact write produced 0 bytes at "
                               f"{args.out!r}")
    print(payload)


if __name__ == "__main__":
    main()
