"""Row-sharded embedding lookup over the `model` mesh axis.

The centerpiece the reference lacks (SURVEY.md §2.5: every reference table
is replicated per device).  Two complementary paths:

1. **Compiler-partitioned** (default): shard the stacked table with
   ``PartitionSpec('model', None)`` (parallel.mesh.table_sharding) and let
   XLA's SPMD partitioner turn ``jnp.take`` into the masked-local-gather +
   all-reduce pattern.  Zero custom code in the model; this is what
   `__graft_entry__.dryrun_multichip` exercises.

2. **Explicit shard_map engine** (this module): the same computation written
   out — each shard masks the IDs that fall in its row range, gathers
   locally, zeroes the misses, and ``psum``s partial embeddings over the
   `model` axis (each global row lives on exactly one shard, so the sum IS
   the lookup).  The backward pass through this code is the local
   scatter-add each shard needs — no gradient all-to-all for table rows.
   This form is the substrate for the Pallas lookup kernel and for
   dedup/capacity optimisations.

Also provides ``unique_with_counts_static`` — the static-shape dedup step
for the ID exchange (SURVEY.md §7.3 "duplicate-ID dedup before all-to-all").
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recsys_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def shard_table(table: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Place a (V, D) table row-sharded over the model axis (V padded by
    caller to a multiple of the axis size if needed)."""
    return jax.device_put(table, NamedSharding(mesh, P(MODEL_AXIS, None)))


def sharded_gather(
    table: jnp.ndarray, rows: jnp.ndarray, mesh: Mesh,
    data_sharded_rows: bool = True,
) -> jnp.ndarray:
    """Lookup ``rows`` (int32, any shape) in a row-sharded ``table``.

    table: (V, D) with V divisible by mesh model-axis size; rows hold global
    row ids.  Returns rows.shape + (D,), sharded over `data` on the leading
    axis when ``data_sharded_rows``.
    """
    n_model = mesh.shape[MODEL_AXIS]
    rows_spec = P(DATA_AXIS) if data_sharded_rows else P()

    def local_lookup(table_shard, rows_local):
        # table_shard: (V/S, D) — this shard's contiguous row block
        shard = jax.lax.axis_index(MODEL_AXIS)
        v_local = table_shard.shape[0]
        lo = shard * v_local
        local = rows_local - lo
        hit = (local >= 0) & (local < v_local)
        safe = jnp.where(hit, local, 0)
        emb = jnp.take(table_shard, safe, axis=0)
        emb = emb * hit[..., None].astype(emb.dtype)
        # each global row id exists on exactly one shard -> sum == lookup
        return jax.lax.psum(emb, MODEL_AXIS)

    fn = shard_map(
        local_lookup,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), rows_spec),
        out_specs=rows_spec,
        check_vma=False,
    )
    return fn(table, rows.astype(jnp.int32))


def sharded_gather_dedup(
    table: jnp.ndarray, rows: jnp.ndarray, mesh: Mesh,
) -> jnp.ndarray:
    """Like :func:`sharded_gather` but dedups IDs per data shard first.

    CTR batches repeat hot IDs heavily; deduping before the cross-shard
    exchange cuts the psum payload's effective information (XLA still moves
    the same padded buffer, but the local gather + backward scatter-add
    touch each unique row once — the win the Pallas kernel exploits).
    """
    n_model = mesh.shape[MODEL_AXIS]

    def local_fn(table_shard, rows_local):
        shape = rows_local.shape
        flat = rows_local.reshape(-1)
        uniq, inv = unique_with_counts_static(flat)
        shard = jax.lax.axis_index(MODEL_AXIS)
        v_local = table_shard.shape[0]
        lo = shard * v_local
        local = uniq - lo
        hit = (local >= 0) & (local < v_local)
        emb = jnp.take(table_shard, jnp.where(hit, local, 0), axis=0)
        emb = emb * hit[:, None].astype(emb.dtype)
        emb = jax.lax.psum(emb, MODEL_AXIS)
        return jnp.take(emb, inv, axis=0).reshape(*shape, emb.shape[-1])

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return fn(table, rows.astype(jnp.int32))


def unique_with_counts_static(ids: jnp.ndarray):
    """Static-shape dedup: returns (uniq, inverse) with uniq padded to
    ids.shape (duplicates replaced by the first occurrence's value).

    jit-safe replacement for jnp.unique (whose output shape is dynamic):
    sorts ids, marks first occurrences, and builds an inverse map such that
    ``uniq[inverse] == ids``.  Padding slots repeat a real id, so gathers
    through them are harmless (their results are never selected).
    """
    n = ids.shape[0]
    order = jnp.argsort(ids)
    sorted_ids = ids[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]]
    )
    # group index of each sorted position = cumsum(first) - 1
    group = jnp.cumsum(first) - 1
    # uniq[g] = value of group g (scatter; padded tail repeats last value)
    uniq = jnp.zeros_like(ids).at[group].set(sorted_ids)
    n_uniq = group[-1] + 1
    fill = uniq[0]
    slot = jnp.arange(n)
    uniq = jnp.where(slot < n_uniq, uniq, fill)
    inverse = jnp.zeros_like(ids).at[order].set(group)
    return uniq, inverse
