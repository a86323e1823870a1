"""Pallas TPU kernel: fused retrieval scoring + top-k.

Computes ``top_k(q @ items.T, k)`` without ever materialising the (Q, N)
score matrix in HBM: the item catalog streams through VMEM in tiles, each
program keeps a running (blk_q, k) candidate set in scratch, and the merge
uses an argmax-free selection loop (Mosaic has no native argmax/gather along
lanes):

    for j in 0..k:  m = rowmax(cand); pos = rowmin(where(cand==m, iota, BIG))
                    record (m, ids[pos]); cand[pos] = -inf

Grid: (q_blocks, n_tiles), n innermost so scratch carries across the
catalog sweep.  This is the kernel form of
recsys_tpu/train/retrieval.py::topk_scores_streaming (its jnp ground truth).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.4e38


def _topk_kernel(
    q_ref, items_ref, out_v_ref, out_i_ref, best_v, best_i,
    *, k: int, tile_n: int, n_items: int,
):
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(t == 0)
    def _init():
        best_v[:] = jnp.full_like(best_v, NEG_INF)
        best_i[:] = jnp.zeros_like(best_i)

    q = q_ref[:].astype(jnp.float32)        # (blk_q, D)
    items = items_ref[:].astype(jnp.float32)  # (tile_n, D)
    scores = jax.lax.dot_general(
        q, items, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (blk_q, tile_n)

    blk_q = scores.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (blk_q, tile_n), 1) + t * tile_n
    valid = ids < n_items
    scores = jnp.where(valid, scores, NEG_INF)

    cand_v = jnp.concatenate([best_v[:], scores], axis=1)   # (blk_q, k+tile_n)
    cand_i = jnp.concatenate([best_i[:], ids], axis=1)
    w = cand_v.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (blk_q, w), 1)

    new_v = []
    new_i = []
    for _ in range(k):
        m = jnp.max(cand_v, axis=1, keepdims=True)          # (blk_q, 1)
        at_max = cand_v == m
        first = jnp.min(jnp.where(at_max, pos, w), axis=1, keepdims=True)
        sel = pos == first                                   # one-hot row
        idx = jnp.sum(jnp.where(sel, cand_i, 0), axis=1, keepdims=True)
        new_v.append(m)
        new_i.append(idx)
        cand_v = jnp.where(sel, NEG_INF, cand_v)
    best_v[:] = jnp.concatenate(new_v, axis=1)
    best_i[:] = jnp.concatenate(new_i, axis=1)

    @pl.when(t == nt - 1)
    def _emit():
        out_v_ref[:] = best_v[:]
        out_i_ref[:] = best_i[:]


@functools.partial(jax.jit, static_argnames=("k", "blk_q", "tile_n",
                                             "interpret"))
def topk_scores_pallas(
    query_embs: jnp.ndarray,
    item_embs: jnp.ndarray,
    k: int = 10,
    *,
    blk_q: int = 128,
    tile_n: int = 2048,  # retuned round 2: 512 lost to lax.top_k, 2048 wins
    interpret: bool = False,
):
    """(Q, D) x (N, D) -> (values (Q, k), indices (Q, k)), descending."""
    qn, d = query_embs.shape
    n = item_embs.shape[0]
    blk_q = min(blk_q, qn)
    tile_n = min(tile_n, n)
    grid = (pl.cdiv(qn, blk_q), pl.cdiv(n, tile_n))
    out_v, out_i = pl.pallas_call(
        functools.partial(_topk_kernel, k=k, tile_n=tile_n, n_items=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk_q, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((blk_q, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_q, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qn, k), jnp.float32),
            jax.ShapeDtypeStruct((qn, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((blk_q, k), jnp.float32),
            pltpu.VMEM((blk_q, k), jnp.int32),
        ],
        interpret=interpret,
    )(query_embs, item_embs)
    return out_v, out_i
