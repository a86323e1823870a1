"""SASRec: self-attentive sequential recommendation.

Parity target: /root/reference/src/match/sasrec/model.py:60-97 (item-id
sequence -> N transformer encoder blocks with pad masking -> last-position
state as the user vector -> dot scores against pos/neg items, pairwise BCE)
plus the published model's positional embeddings the reference omits
(model.py:74 acknowledges the omission; parity rule SURVEY.md §2.6).

Sequences are padded *in front* (keras ``pad_sequences`` default used by the
reference pipeline), so the last position always holds the most recent item.

``__call__`` returns {'pos_logits': (B,), 'neg_logits': (B, N)}; training
uses :func:`recsys_tpu.train.losses.pairwise_bce`; eval ranks the positive
among ``test_neg_num`` negatives (HR@K/NDCG@K).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from recsys_tpu.core.features import FeatureSchema
from recsys_tpu.kernels import embedding as ekernels
from recsys_tpu.ops.attention import PositionalEmbedding, TransformerBlock


class SASRec(nn.Module):
    num_items: int  # vocabulary incl. pad id 0
    embed_dim: int = 64
    num_blocks: int = 2
    num_heads: int = 1
    ffn_dim: int | None = None
    max_len: int = 50
    dropout_rate: float = 0.2
    pad_id: int = 0
    # the published SASRec is unidirectional; the reference omitted the
    # causal mask along with positional embeddings (model.py:74)
    causal: bool = True

    def setup(self):
        self.item_table = self.param(
            "item_table",
            nn.initializers.normal(0.05),
            (self.num_items, self.embed_dim),
        )
        self.pos_emb = PositionalEmbedding(self.max_len)
        self.blocks = [
            TransformerBlock(
                num_heads=self.num_heads,
                ffn_dim=self.ffn_dim,
                dropout_rate=self.dropout_rate,
                causal=self.causal,
            )
            for _ in range(self.num_blocks)
        ]

    def encode(self, hist: jnp.ndarray, *, training: bool = False) -> jnp.ndarray:
        """(B, L) int32 -> user vector (B, D): last-position encoder state."""
        mask = hist != self.pad_id  # (B, L) key-padding mask
        x = ekernels.gather(self.item_table, hist.astype(jnp.int32))
        x = x * jnp.sqrt(jnp.asarray(self.embed_dim, x.dtype))
        x = self.pos_emb(x)
        x = x * mask[..., None].astype(x.dtype)
        for block in self.blocks:
            x = block(x, mask, training=training)
            x = x * mask[..., None].astype(x.dtype)
        return x[:, -1, :]  # front-padded: last position = newest item

    def item_embed(self, item_ids: jnp.ndarray) -> jnp.ndarray:
        return ekernels.gather(self.item_table, item_ids.astype(jnp.int32))

    def all_item_embeddings(self) -> jnp.ndarray:
        return self.item_table

    def encode_all(self, hist: jnp.ndarray, *, training: bool = False):
        """(B, L) -> all encoder states (B, L, D) (causal)."""
        mask = hist != self.pad_id
        x = ekernels.gather(self.item_table, hist.astype(jnp.int32))
        x = x * jnp.sqrt(jnp.asarray(self.embed_dim, x.dtype))
        x = self.pos_emb(x)
        x = x * mask[..., None].astype(x.dtype)
        for block in self.blocks:
            x = block(x, mask, training=training)
            x = x * mask[..., None].astype(x.dtype)
        return x

    def __call__(self, batch: dict, *, training: bool = False) -> dict:
        """Two training schemes, selected by the shape of ``pos``:

        * pos (B,): last-position prediction over an exploded-prefix
          dataset (one example per prefix) — neg (B, N).
        * pos (B, L): the published all-position scheme — every non-pad
          position t predicts pos[t] (the next item) with neg[t] as its
          sampled negative; requires ``causal=True``.  Returns an extra
          'mask' (B, L) for the loss.
        """
        if batch["pos"].ndim == 2:
            states = self.encode_all(batch["hist"], training=training)
            pos = self.item_embed(batch["pos"])  # (B, L, D)
            neg = self.item_embed(batch["neg"])  # (B, L, D)
            return {
                "pos_logits": jnp.sum(states * pos, axis=-1),
                "neg_logits": jnp.sum(states * neg, axis=-1)[..., None],
                "mask": batch["pos"] != self.pad_id,
            }
        user = self.encode(batch["hist"], training=training)  # (B, D)
        pos = self.item_embed(batch["pos"])  # (B, D)
        neg = self.item_embed(batch["neg"])  # (B, N, D)
        pos_logits = jnp.sum(user * pos, axis=-1)
        neg_logits = jnp.einsum("bd,bnd->bn", user, neg)
        return {"pos_logits": pos_logits, "neg_logits": neg_logits}
