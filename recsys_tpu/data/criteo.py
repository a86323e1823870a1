"""Criteo CTR dataset pipeline.

Reproduces the reference protocol at /root/reference/src/ctr/utils/
data_process.py:39-91 — label-encode the 26 ``C*`` categoricals, min-max
scale the 13 ``I*`` dense columns, 80/20 train/test split — with bug §2.6.15
fixed: each dense column is scaled by ITS OWN min/max (the reference fits the
scaler on the whole frame and assigns column-0 statistics to every column).

Output batches are the framework's standard CTR layout:
``{'dense': (B, 13) f32, 'sparse': (B, 26) i32, 'label': (B,) f32}``.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from recsys_tpu.core.features import DenseFeature, FeatureSchema, SparseFeature

DENSE_COLS = [f"I{i}" for i in range(1, 14)]
SPARSE_COLS = [f"C{i}" for i in range(1, 27)]


def create_criteo_dataset(
    path: str,
    embed_dim: int = 8,
    test_size: float = 0.2,
    read_part: bool = False,
    sample_num: int = 100_000,
    seed: int = 2020,
    use_native: bool = False,
    hash_buckets: int = 1 << 20,
):
    """CSV -> (schema, train_dict, test_dict).

    Accepts the kaggle-style ``criteo_sampled_data.csv`` the reference uses
    (header: label, I1..I13, C1..C26).  ``use_native`` routes through the
    C++ parser (~800k rows/s) with FEATURE HASHING into ``hash_buckets``
    per field instead of the exact label-encode pass — the
    production-scale path for full-size criteo files.
    """
    if use_native:
        from recsys_tpu.data import native

        if native.available():
            # detect format: kaggle-style sample = comma + header line;
            # full-size criteo train.txt = tab-separated, headerless
            with open(path, "rb") as f:
                first = f.readline().decode(errors="replace")
            sep = "\t" if "\t" in first else ","
            skip_header = first.lower().lstrip().startswith("label")
            labels, dense, sparse = native.parse_criteo(
                path, sep=sep,
                max_rows=sample_num if read_part else 1 << 40,
                cat_buckets=hash_buckets, skip_header=skip_header,
            )
            if len(labels) == 0:
                raise ValueError(
                    f"native parser found no valid rows in {path} "
                    f"(sep={sep!r}, skip_header={skip_header}); expected "
                    "label + 13 dense + 26 categorical fields per line"
                )
            dense = _minmax(dense)
            schema = FeatureSchema(
                dense=[DenseFeature(c) for c in DENSE_COLS],
                sparse=[SparseFeature(c, hash_buckets, embed_dim)
                        for c in SPARSE_COLS],
            )
            return (schema,) + _split(dense, sparse, labels, test_size, seed)
        # no C++ toolchain: fall through to the pandas path
        import warnings

        warnings.warn("native library unavailable; using the pandas loader")

    if read_part:
        df = pd.read_csv(path, nrows=sample_num)
    else:
        df = pd.read_csv(path)
    return build_criteo_arrays(df, embed_dim, test_size, seed)


def _minmax(dense: np.ndarray) -> np.ndarray:
    """Per-column min-max scaling (the reference's intended semantics)."""
    mn, mx = dense.min(axis=0), dense.max(axis=0)
    return (dense - mn) / np.where(mx > mn, mx - mn, 1.0)


def _split(dense, sparse, label, test_size: float, seed: int):
    """Shuffled train/test split into the standard CTR batch layout."""
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(label))
    cut = int(len(label) * (1.0 - test_size))

    def take(sel):
        return {"dense": dense[sel], "sparse": sparse[sel],
                "label": label[sel]}

    return take(idx[:cut]), take(idx[cut:])


def build_criteo_arrays(
    df: pd.DataFrame, embed_dim: int = 8, test_size: float = 0.2, seed: int = 2020
):
    df = df.copy()
    df[SPARSE_COLS] = df[SPARSE_COLS].fillna("-1")
    df[DENSE_COLS] = df[DENSE_COLS].fillna(0.0)

    sparse = np.empty((len(df), len(SPARSE_COLS)), np.int32)
    vocab_sizes = []
    for j, col in enumerate(SPARSE_COLS):
        codes, uniques = pd.factorize(df[col], sort=True)
        sparse[:, j] = codes.astype(np.int32)
        vocab_sizes.append(len(uniques))

    dense = _minmax(df[DENSE_COLS].to_numpy(np.float32))
    label = df["label"].to_numpy(np.float32)

    schema = FeatureSchema(
        dense=[DenseFeature(c) for c in DENSE_COLS],
        sparse=[
            SparseFeature(c, int(v), embed_dim)
            for c, v in zip(SPARSE_COLS, vocab_sizes)
        ],
    )
    return (schema,) + _split(dense, sparse, label, test_size, seed)
