"""DLRM: bottom MLP over dense, pairwise dot-interaction, top MLP.

The reference's DLRM is broken (undefined attributes, missing the paper's
dot-interaction — /root/reference/src/ctr/dlrm/model.py:42-54, bug ledger
SURVEY.md §2.6.1).  This is the *published* DLRM (Naumov et al. 2019):
  z = bottom_mlp(dense)                      (B, D)
  E = field embeddings                       (B, F, D)
  I = pairwise dots of [z, E]                (B, (F+1)F/2)
  logit = top_mlp([z, I])
The dot-interaction routes through the fused interaction kernel.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from recsys_tpu.core.features import FeatureSchema
from recsys_tpu.kernels import dispatch as ikernels
from recsys_tpu.ops.embedding import StackedEmbedding
from recsys_tpu.ops.mlp import MLP


class DLRM(nn.Module):
    schema: FeatureSchema
    bottom_units: Sequence[int] = (256, 64)
    top_units: Sequence[int] = (256, 128, 64)
    self_interaction: bool = False
    dropout_rate: float = 0.0
    # bfloat16 runs MLPs + interaction on the MXU's native precision
    # (params and loss stay float32); None = full float32
    compute_dtype: jnp.dtype | None = None
    # enables the StackedEmbedding perturbation tap so the Trainer's
    # sparse (touched-rows-only) embedding optimizer can be used --
    # see recsys_tpu/train/sparse_embed.py
    sparse_embed_grads: bool = False
    # route both MLP towers through the fused Pallas forward/backward
    # kernels (ops.mlp.FusedMLP — VMEM-resident weights, no hidden-state
    # HBM round trips); requires dropout_rate == 0
    fused_mlps: bool = False
    # run the dense tail (bottom MLP + interaction + top MLP) as N
    # per-slice computations over the batch while the embedding gather
    # stays WHOLE-batch (small gathers pipeline worse — dedup_probe).
    # Mathematically identical at dropout 0 (per-slice dropout draws
    # fresh masks); tools/dense_probe.py measured the sliced tail ~10%
    # faster at bench shapes (smaller live activations).  1 = off.
    dense_microbatch: int = 1

    # passthrough construction kwargs for StackedEmbedding (engine/mesh/
    # capacity_factor/num_groups ... ) -- how the Trainer/CLI select the
    # explicit sharded-lookup engines (see ops/embedding.py ENGINES)
    embed_kw: dict | None = None

    @nn.compact
    def __call__(self, batch: dict, *, training: bool = False) -> jnp.ndarray:
        sparse, dense = batch["sparse"], batch.get("dense")
        d = self.schema.embed_dim
        field_embs = StackedEmbedding(
            self.schema, perturb_out=self.sparse_embed_grads,
            **(self.embed_kw or {}),
        )(sparse)  # (B, F, D)
        if self.compute_dtype is not None:
            field_embs = field_embs.astype(self.compute_dtype)

        if self.fused_mlps and self.dropout_rate > 0:
            raise ValueError("fused_mlps requires dropout_rate == 0")

        def make_mlp(units, out_dim, dropout=0.0):
            if self.fused_mlps:
                from recsys_tpu.ops.mlp import FusedMLP

                return FusedMLP(units, out_dim=out_dim,
                                mm_bf16=self.compute_dtype is not None)
            return MLP(units, out_dim=out_dim, dropout_rate=dropout,
                       dtype=self.compute_dtype)

        has_dense = dense is not None and dense.shape[-1] > 0
        bottom_mlp = make_mlp(self.bottom_units, d) if has_dense else None
        top_mlp = make_mlp(self.top_units, 1, dropout=self.dropout_rate)

        def tail(dense_s, fe_s):
            feats = fe_s
            bottom = None
            if has_dense:
                bottom = bottom_mlp(dense_s, training=training)
                feats = jnp.concatenate(
                    [bottom[:, None, :].astype(fe_s.dtype), fe_s], axis=1
                )
            inter = ikernels.dot_interaction(
                feats, self_interaction=self.self_interaction
            )
            top_in = inter if bottom is None else jnp.concatenate(
                [bottom.astype(inter.dtype), inter], axis=-1
            )
            return top_mlp(top_in, training=training)[..., 0]

        nm = self.dense_microbatch
        b = sparse.shape[0]
        if nm <= 1 or b % nm:
            logits = tail(dense, field_embs)
        else:
            # unrolled slices share the module instances (= one param set);
            # the gather above stays whole-batch
            bs = b // nm
            logits = jnp.concatenate([
                tail(
                    dense[i * bs:(i + 1) * bs] if has_dense else None,
                    field_embs[i * bs:(i + 1) * bs],
                )
                for i in range(nm)
            ])
        return logits.astype(jnp.float32)
