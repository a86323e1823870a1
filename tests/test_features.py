import numpy as np
import pytest

from recsys_tpu.core.features import (
    DenseFeature,
    FeatureSchema,
    SparseFeature,
    VarLenSparseFeature,
)


def test_stacked_offsets():
    schema = FeatureSchema(
        dense=[DenseFeature("d0")],
        sparse=[SparseFeature("a", 10, 4), SparseFeature("b", 20, 4)],
        varlen=[
            VarLenSparseFeature("hist", 10, 4, max_len=5, shared_with="a"),
            VarLenSparseFeature("own", 7, 4, max_len=5),
        ],
    )
    assert schema.offset("a") == 0
    assert schema.offset("b") == 10
    assert schema.offset("own") == 30
    assert schema.offset("hist") == 0  # shares a's table
    assert schema.total_vocab == 37
    assert schema.embed_dim == 4
    np.testing.assert_array_equal(schema.sparse_offsets, [0, 10])


def test_mixed_embed_dim_rejected():
    with pytest.raises(ValueError):
        FeatureSchema(sparse=[SparseFeature("a", 10, 4), SparseFeature("b", 5, 8)])


def test_duplicate_names_rejected():
    with pytest.raises(ValueError):
        FeatureSchema(sparse=[SparseFeature("a", 10), SparseFeature("a", 5)])
