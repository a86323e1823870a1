"""Parameter sharding rules for the (data, model) mesh.

Maps a model's param pytree to NamedShardings: embedding-engine tables
(StackedEmbedding / SparseLinear leaves) row-shard over the `model` axis,
everything else replicates.  This is the compiler-partitioned path of the
sharded embedding engine (see parallel/embedding_sharding.py for the
explicit shard_map form): with tables placed P('model', None) and the batch
P('data'), jit's SPMD partitioner emits the masked-local-gather +
all-reduce lookup and the local scatter-add backward on its own.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recsys_tpu.parallel.mesh import MODEL_AXIS

_TABLE_MODULES = ("StackedEmbedding", "SparseLinear")


def is_table_path(path) -> bool:
    key = jax.tree_util.keystr(path)
    return any(m in key for m in _TABLE_MODULES)


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings: tables P(model, None), rest replicated.

    A table leaf only shards when its row count divides the model-axis size
    (XLA would otherwise pad; keeping it replicated is cheaper for the tiny
    remainder tables in this zoo).
    """
    n_model = mesh.shape[MODEL_AXIS]

    def rule(path, leaf):
        if (
            n_model > 1
            and is_table_path(path)
            and getattr(leaf, "ndim", 0) == 2
            and leaf.shape[0] % n_model == 0
        ):
            return NamedSharding(mesh, P(MODEL_AXIS, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def apply_param_shardings(params, mesh: Mesh):
    """device_put the params according to :func:`param_shardings`."""
    return jax.tree_util.tree_map(
        jax.device_put, params, param_shardings(params, mesh)
    )
