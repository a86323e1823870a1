"""Out-of-core streaming ingestion: larger-than-RAM datasets -> fit().

The reference reads whole CSVs into pandas before training
(/root/reference/src/ctr/utils/data_process.py:47-50) — its L1 caps the
dataset at host RAM.  This module streams criteo-format files through a
fixed-size chunk buffer using the native resumable parser
(native/recsys_native.cc parse_criteo_chunk), yielding ready numpy
batches that Trainer.fit consumes through its prefetch thread; peak host
memory is O(chunk_rows), never O(dataset).

Categoricals are FEATURE-HASHED (FNV-1a 64 into ``cat_buckets`` per
field) — the production fixed-vocab path, shared with
data.criteo(use_native=True).  Dense columns are min-max scaled with
streaming per-column stats gathered in one preliminary pass
(``normalize=True``), matching the reference's whole-file MinMaxScaler
protocol at one extra sequential read instead of a resident copy.
"""
from __future__ import annotations

import glob as globlib
import os

import numpy as np

from recsys_tpu.core.features import (
    DenseFeature,
    FeatureSchema,
    SparseFeature,
)

DENSE_COLS = [f"I{i}" for i in range(1, 14)]
SPARSE_COLS = [f"C{i}" for i in range(1, 27)]


def _detect_format(path: str) -> tuple[str, bool]:
    """(sep, skip_header) — kaggle sample is comma+header, full train.txt
    is tab/headerless (same sniff as data.criteo)."""
    with open(path, "rb") as f:
        first = f.readline().decode(errors="replace")
    sep = "\t" if "\t" in first else ","
    return sep, first.lower().lstrip().startswith("label")


class CriteoStream:
    """Iterable of training batch dicts over a criteo file glob.

    ``iter(ds)`` yields ``{"dense", "sparse", "label"}`` batches of exactly
    ``batch_size`` rows (remainder carried across chunk/file boundaries;
    the final partial batch is dropped, matching fit's drop_remainder).
    Pass the object directly to ``Trainer.fit`` — each epoch re-streams
    the files.  ``shuffle`` permutes rows WITHIN each chunk (window
    shuffle, the streaming analogue of the reference's full-dataset
    shuffle) with a per-epoch seed.
    """

    def __init__(
        self,
        paths: str | list[str],
        batch_size: int = 512,
        *,
        chunk_rows: int = 65536,
        cat_buckets: int = 1 << 20,
        embed_dim: int = 16,
        normalize: bool = True,
        shuffle: bool = True,
        seed: int = 0,
    ):
        self.files = (
            sorted(globlib.glob(paths)) if isinstance(paths, str)
            else list(paths)
        )
        if not self.files:
            raise ValueError(f"no files match {paths!r}")
        for p in self.files:
            if not os.path.exists(p):
                raise FileNotFoundError(p)
        self.batch_size = batch_size
        self.chunk_rows = max(batch_size, chunk_rows)
        self.cat_buckets = cat_buckets
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0
        self._fmt = {p: _detect_format(p) for p in self.files}
        self.schema = FeatureSchema(
            dense=[DenseFeature(c) for c in DENSE_COLS],
            sparse=[SparseFeature(c, cat_buckets, embed_dim)
                    for c in SPARSE_COLS],
        )
        self._mn = np.zeros(13, np.float32)
        self._scale = np.ones(13, np.float32)
        if normalize:
            self._compute_stats()

    # -- streaming chunk reader -------------------------------------------
    def _chunks(self):
        """Yield (labels, dense, sparse) VIEWS of two reusable buffers of
        chunk_rows capacity — constant memory however large the files."""
        from recsys_tpu.data import native

        out = (
            np.zeros(self.chunk_rows, np.float32),
            np.zeros((self.chunk_rows, 13), np.float32),
            np.zeros((self.chunk_rows, 26), np.int32),
        )
        for path in self.files:
            sep, skip = self._fmt[path]
            off = 0
            while True:
                (lab, den, spa), off = native.parse_criteo_chunk(
                    path, off, self.chunk_rows, sep=sep,
                    cat_buckets=self.cat_buckets, skip_header=skip,
                    out=out,
                )
                if lab.shape[0] == 0:
                    break
                yield lab, den, spa

    def _compute_stats(self):
        """One sequential pass for per-column dense min/max (the streaming
        MinMaxScaler; /root/reference/src/ctr/utils/data_process.py:76-78
        protocol without the resident frame)."""
        mn = np.full(13, np.inf, np.float32)
        mx = np.full(13, -np.inf, np.float32)
        n = 0
        for lab, den, _ in self._chunks():
            mn = np.minimum(mn, den.min(axis=0))
            mx = np.maximum(mx, den.max(axis=0))
            n += lab.shape[0]
        if n == 0:
            raise ValueError(f"no valid rows in {self.files}")
        self.num_rows = n
        self._mn = mn
        self._scale = 1.0 / np.where(mx > mn, mx - mn, 1.0)

    # -- batch iteration ---------------------------------------------------
    def __iter__(self):
        rng = np.random.default_rng(self.seed + self._epoch)
        self._epoch += 1
        bs = self.batch_size
        carry: list | None = None
        for lab, den, spa in self._chunks():
            den = (den - self._mn) * self._scale
            if self.shuffle:
                perm = rng.permutation(lab.shape[0])
                lab, den, spa = lab[perm], den[perm], spa[perm]
            if carry is not None:
                lab = np.concatenate([carry[0], lab])
                den = np.concatenate([carry[1], den])
                spa = np.concatenate([carry[2], spa])
                carry = None
            n_full = (lab.shape[0] // bs) * bs
            for s in range(0, n_full, bs):
                yield {
                    "label": lab[s:s + bs].copy(),
                    "dense": den[s:s + bs].copy(),
                    "sparse": spa[s:s + bs].copy(),
                }
            if n_full < lab.shape[0]:
                carry = [lab[n_full:].copy(), den[n_full:].copy(),
                         spa[n_full:].copy()]
        # final partial batch dropped (fit's drop_remainder semantics)
