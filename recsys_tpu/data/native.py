"""ctypes bindings for the native data-pipeline library (native/).

Auto-builds ``librecsys_native.so`` with make on first use; every entry
point has a pure-Python fallback so the framework works without a compiler.
``available()`` reports which path is active.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO = os.path.join(_NATIVE_DIR, "librecsys_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.parse_criteo.restype = ctypes.c_int64
    lib.parse_criteo.argtypes = [
        ctypes.c_char_p, ctypes.c_char, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.parse_criteo_chunk.restype = ctypes.c_int64
    lib.parse_criteo_chunk.argtypes = [
        ctypes.c_char_p, ctypes.c_char, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.sample_negatives.restype = None
    lib.sample_negatives.argtypes = [
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_uint64, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.shuffle_indices.restype = None
    lib.shuffle_indices.argtypes = [
        ctypes.c_int64, ctypes.c_uint64, ctypes.POINTER(ctypes.c_int64)
    ]
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.build_seq_leave_last2.restype = None
    lib.build_seq_leave_last2.argtypes = [
        i32p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64,
        ctypes.c_int,
        i32p, i32p, i32p, i32p, i32p, i32p, i32p, i32p, i32p,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.fused_prep.restype = None
    lib.fused_prep.argtypes = [
        i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p, i32p, i32p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def parse_criteo(
    path: str, sep: str = ",", max_rows: int = 1 << 40,
    cat_buckets: int = 1 << 20, skip_header: bool = True,
):
    """Parse a criteo csv/tsv into (labels, dense (N,13), hashed sparse
    (N,26)) numpy arrays using the native parser.

    Categoricals are FEATURE-HASHED into ``cat_buckets`` (production-style
    fixed vocab) instead of the reference's full LabelEncoder pass — the
    loader in data/criteo.py keeps exact label-encode parity; this is the
    high-throughput path.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable; use data.criteo")
    # upper bound rows by line count
    cap = min(max_rows, sum(1 for _ in open(path, "rb")))
    labels = np.zeros(cap, np.float32)
    dense = np.zeros((cap, 13), np.float32)
    sparse = np.zeros((cap, 26), np.int32)
    n = lib.parse_criteo(
        path.encode(), sep.encode(), cap, cat_buckets,
        1 if skip_header else 0,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dense.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sparse.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if n < 0:
        raise IOError(f"cannot open {path}")
    return labels[:n], dense[:n], sparse[:n]


def parse_criteo_chunk(
    path: str, offset: int, max_rows: int, *, sep: str = ",",
    cat_buckets: int = 1 << 20, skip_header: bool = True,
    out: tuple | None = None,
):
    """Parse up to ``max_rows`` criteo rows starting at byte ``offset``.

    Returns ((labels, dense, sparse) views of ``out`` truncated to the
    parsed row count, next_offset).  ``out`` — optional reusable buffers
    (labels (R,), dense (R,13), sparse (R,26)) so a streaming epoch
    allocates nothing per chunk; next_offset == offset and 0 rows at EOF.
    The out-of-core ingestion primitive behind data.streaming.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    if out is None:
        out = (
            np.zeros(max_rows, np.float32),
            np.zeros((max_rows, 13), np.float32),
            np.zeros((max_rows, 26), np.int32),
        )
    labels, dense, sparse = out
    next_off = ctypes.c_int64(0)
    n = lib.parse_criteo_chunk(
        path.encode(), sep.encode(), offset, max_rows, cat_buckets,
        1 if skip_header else 0,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dense.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sparse.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(next_off),
    )
    if n < 0:
        raise IOError(f"cannot open/seek {path} at {offset}")
    return (labels[:n], dense[:n], sparse[:n]), int(next_off.value)


def sample_negatives(
    exclusions: list, n_neg: int, lo: int, hi: int, seed: int = 0
) -> np.ndarray:
    """(len(exclusions), n_neg) uniform ints in [lo, hi), never in the
    corresponding exclusion list.  Native when available."""
    n = len(exclusions)
    off = np.zeros(n + 1, np.int64)
    for i, e in enumerate(exclusions):
        off[i + 1] = off[i] + len(e)
    flat = np.asarray(
        [x for e in exclusions for x in e], np.int32
    ) if off[-1] else np.zeros(1, np.int32)
    out = np.zeros((n, n_neg), np.int32)
    lib = _load()
    if lib is not None:
        lib.sample_negatives(
            n, n_neg, lo, hi,
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            seed,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out
    rng = np.random.default_rng(seed)
    for i, e in enumerate(exclusions):
        es = set(e)
        got = 0
        while got < n_neg:
            c = int(rng.integers(lo, hi))
            if c not in es:
                out[i, got] = c
                got += 1
    return out


def build_seq_leave_last2(
    items: np.ndarray,
    user_off: np.ndarray,
    maxlen: int,
    num_items: int,
    test_neg: int,
    seed: int = 0,
    all_positions: bool = False,
):
    """Native SASRec-protocol dataset fill (see native/recsys_native.cc).

    ``items``: 1-based remapped item ids sorted by (user, time); ``user_off``
    CSR offsets per user.  Returns (train, val, test) dicts shaped like
    data.movielens.build_sasrec_dataset's.  Raises if the library is
    unavailable — callers fall back to the Python builder.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    items = np.ascontiguousarray(items, np.int32)
    user_off = np.ascontiguousarray(user_off, np.int64)
    n_users = len(user_off) - 1
    cap_tr = len(items) if not all_positions else n_users
    cap_ev = n_users
    neg_w = maxlen if all_positions else 1
    pos_w = maxlen if all_positions else 1
    tr_hist = np.zeros((cap_tr, maxlen), np.int32)
    tr_pos = np.zeros((cap_tr, pos_w), np.int32)
    tr_neg = np.zeros((cap_tr, neg_w), np.int32)
    va_hist = np.zeros((cap_ev, maxlen), np.int32)
    va_pos = np.zeros(cap_ev, np.int32)
    va_neg = np.zeros((cap_ev, test_neg), np.int32)
    te_hist = np.zeros((cap_ev, maxlen), np.int32)
    te_pos = np.zeros(cap_ev, np.int32)
    te_neg = np.zeros((cap_ev, test_neg), np.int32)
    counts = np.zeros(2, np.int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.build_seq_leave_last2(
        items.ctypes.data_as(i32p),
        user_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_users, maxlen, num_items, test_neg, seed,
        1 if all_positions else 0,
        tr_hist.ctypes.data_as(i32p), tr_pos.ctypes.data_as(i32p),
        tr_neg.ctypes.data_as(i32p), va_hist.ctypes.data_as(i32p),
        va_pos.ctypes.data_as(i32p), va_neg.ctypes.data_as(i32p),
        te_hist.ctypes.data_as(i32p), te_pos.ctypes.data_as(i32p),
        te_neg.ctypes.data_as(i32p),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    nt, ne = int(counts[0]), int(counts[1])

    def pack(h, p, n, m):
        out = {"hist": h[:m], "pos": p[:m], "neg": n[:m]}
        if out["pos"].ndim == 2 and out["pos"].shape[1] == 1:
            out["pos"] = out["pos"][:, 0]
        return out

    return (
        pack(tr_hist, tr_pos, tr_neg, nt),
        pack(va_hist, va_pos, va_neg, ne),
        pack(te_hist, te_pos, te_neg, ne),
    )


def shuffle_indices(n: int, seed: int = 0) -> np.ndarray:
    out = np.zeros(n, np.int64)
    lib = _load()
    if lib is not None:
        lib.shuffle_indices(n, seed, out.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int64)))
        return out
    rng = np.random.default_rng(seed)
    return rng.permutation(n).astype(np.int64)


def fused_prep(ids: np.ndarray, pack: int, vp: int, block: int, ch: int,
               shards: int = 1):
    """Native sort/bucket for the fused embedding-update kernel.

    Bit-exact with train/streaming_embed.host_prep_group (stable counting
    sort; ``shards`` > 1 aligns block fences to model-axis shard
    boundaries); RuntimeError when the library is unavailable — callers
    fall back to the numpy builder.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    if shards < 1 or vp % shards:
        # the C++ builder truncates vs = vp/shards, and rows past
        # shards*vs would scatter past the output buffers — reject here,
        # not just in host_prep_group (this is a public API)
        raise ValueError(f"vp={vp} not divisible by shards={shards}")
    ids = np.ascontiguousarray(ids, np.int32)
    n = len(ids)
    vs = vp // shards
    nb = shards * (-(-vs // block))
    nc_max = max(n // ch + nb, 1)
    ids2d = np.empty((nc_max, ch), np.int32)
    idx = np.empty((nc_max * ch,), np.int32)
    cptr = np.empty((nb + 1,), np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.fused_prep(
        ids.ctypes.data_as(i32p), n, pack, vp, block, ch, shards,
        ids2d.ctypes.data_as(i32p), idx.ctypes.data_as(i32p),
        cptr.ctypes.data_as(i32p),
    )
    return ids2d, idx, cptr
