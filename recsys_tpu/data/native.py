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


def shuffle_indices(n: int, seed: int = 0) -> np.ndarray:
    out = np.zeros(n, np.int64)
    lib = _load()
    if lib is not None:
        lib.shuffle_indices(n, seed, out.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int64)))
        return out
    rng = np.random.default_rng(seed)
    return rng.permutation(n).astype(np.int64)
