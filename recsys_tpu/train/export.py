"""Serving export: item-embedding snapshots for the retrieval index.

The reference has no export path at all (SURVEY.md §5 serving row) — its
closest analog is extracting embedding submodels and feeding faiss at the
end of training (/root/reference/src/match/dssm/dssm_train.py:63-96).  Here
the catalog's item embeddings (and optional id remap) snapshot to one .npz
that a serving process loads straight into a BruteForceIndex.
"""
from __future__ import annotations

import json
import os

import jax
import numpy as np


def export_item_embeddings(
    path: str,
    item_embs,
    item_ids=None,
    metadata: dict | None = None,
) -> None:
    """Write (N, D) item embeddings (+ optional external ids) to ``path``."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    embs = np.asarray(jax.device_get(item_embs), np.float32)
    payload = {"embeddings": embs}
    if item_ids is not None:
        payload["item_ids"] = np.asarray(item_ids)
    payload["metadata"] = np.frombuffer(
        json.dumps(metadata or {}).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **payload)


def load_item_embeddings(path: str):
    """Returns (embeddings (N, D), item_ids or None, metadata dict)."""
    with np.load(path, allow_pickle=False) as z:
        embs = z["embeddings"]
        ids = z["item_ids"] if "item_ids" in z.files else None
        meta = json.loads(bytes(z["metadata"]).decode() or "{}")
    return embs, ids, meta


def build_index(path: str, normalize: bool = False):
    """Load an exported snapshot into a ready BruteForceIndex."""
    from recsys_tpu.train.retrieval import BruteForceIndex

    embs, ids, meta = load_item_embeddings(path)
    index = BruteForceIndex(embs.shape[1], normalize=normalize)
    index.add(embs)
    return index, ids, meta
