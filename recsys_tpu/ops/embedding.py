"""Stacked-vocabulary embedding engine.

TPU-first replacement for the reference's per-field ``Embedding`` dicts
(/root/reference/src/ctr/deep_fm/model.py:31-38,
/root/reference/src/match/dssm/model.py:24-34): all sparse fields share ONE
``(total_vocab, embed_dim)`` table and a batch's (B, F) field-local IDs are
shifted by per-field offsets into one fused (B*F)-row gather.  One big gather

* keeps the lookup a single XLA `gather` the compiler can tile,
* gives the backward pass one scatter-add instead of F small ones,
* is the unit that the sharded engine (recsys_tpu/parallel) row-shards
  across the `model` mesh axis.

The actual gather routes through :mod:`recsys_tpu.kernels.embedding` so a
Pallas kernel can service it on TPU with a jnp fallback elsewhere.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from recsys_tpu.core.features import FeatureSchema
from recsys_tpu.kernels import embedding as embedding_kernels


class StackedEmbedding(nn.Module):
    """One table for all sparse fields of a schema.

    ``__call__`` takes field-local IDs shaped (B, F) ordered like
    ``schema.sparse`` and returns (B, F, D) embeddings.  ``lookup`` embeds an
    arbitrary ID tensor for a single named field (used for varlen history /
    item towers).
    """

    schema: FeatureSchema
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = self.schema.embed_dim
        # Keras Embedding default init is uniform(-0.05, 0.05); models in the
        # zoo that set embed_reg use l2 — regularisation is applied by the
        # train loop (decoupled weight decay), not stored here.
        self.table = self.param(
            "table",
            nn.initializers.uniform(scale=0.05),
            (max(self.schema.total_vocab, 1), d),
            self.param_dtype,
        )

    def __call__(self, sparse_ids: jnp.ndarray) -> jnp.ndarray:
        offsets = jnp.asarray(self.schema.sparse_offsets)
        rows = sparse_ids.astype(jnp.int32) + offsets[None, :]
        return embedding_kernels.gather(self.table, rows)

    def lookup(self, field_name: str, ids: jnp.ndarray) -> jnp.ndarray:
        """Embed `ids` (any shape) using `field_name`'s slice of the table."""
        rows = ids.astype(jnp.int32) + self.schema.offset(field_name)
        return embedding_kernels.gather(self.table, rows)


class SparseLinear(nn.Module):
    """Per-ID first-order weights: sum_f w[id_f] over a batch's sparse IDs.

    The exact-FM first-order term for one-hot categorical inputs: a stacked
    (total_vocab,) weight vector gathered and summed per example — replacing
    the reference's dense ``w @ one_hot`` (/root/reference/src/ctr/fm/
    model.py:44-47) without materialising the one-hot.
    """

    schema: FeatureSchema

    @nn.compact
    def __call__(self, sparse_ids: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "w",
            nn.initializers.zeros,
            (max(self.schema.total_vocab, 1), 1),
        )
        offsets = jnp.asarray(self.schema.sparse_offsets)
        rows = sparse_ids.astype(jnp.int32) + offsets[None, :]
        return jnp.sum(embedding_kernels.gather(w, rows)[..., 0], axis=-1)
