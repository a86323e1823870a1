"""Embedding gather / segment-sum lookup.

TPU-native replacement for the per-field ``tf.keras.layers.Embedding``
gathers of the reference (/root/reference/src/ctr/deep_fm/model.py:53-54).
The framework-level contract is two ops:

* ``gather(table, rows)`` — (V, D) table, int32 ``rows`` of any shape ->
  embeddings of shape ``rows.shape + (D,)``.
* ``segment_sum_gather(table, rows, mask)`` — pooled lookup for padded
  variable-length fields: gathers (B, L) rows and mean/sum-pools the unmasked
  positions (reference's PoolingLayer, /root/reference/src/match/layers/
  modules.py:187-211).

Default implementation is XLA's native fused gather (``table[rows]``), which
on TPU compiles to an efficient dynamic-gather; a Pallas double-buffered
gather for the sharded engine lives alongside and is selected on TPU for the
large-table path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gather(table: jnp.ndarray, rows: jnp.ndarray) -> jnp.ndarray:
    """Embed ``rows`` (int32, any shape) from ``table`` (V, D)."""
    return jnp.take(table, rows, axis=0)


def segment_sum_gather(
    table: jnp.ndarray,
    rows: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    mode: str = "mean",
) -> jnp.ndarray:
    """Pooled embedding of padded sequences.

    rows: (B, L) int32; mask: (B, L) bool/float (1 = real token).
    Returns (B, D).  ``mode`` in {'mean', 'sum', 'sqrtn'}.
    """
    emb = gather(table, rows)  # (B, L, D)
    m = mask.astype(emb.dtype)[..., None]
    summed = jnp.sum(emb * m, axis=1)
    if mode == "sum":
        return summed
    count = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    if mode == "mean":
        return summed / count
    if mode == "sqrtn":
        return summed / jnp.sqrt(count)
    raise ValueError(f"unknown pooling mode {mode!r}")
