"""Shard-parallel checkpoint: save/restore without full-array host buffers
(VERDICT round-1 next-step #5)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from recsys_tpu.data.synthetic import synthetic_ctr
from recsys_tpu.models.ctr.dlrm import DLRM
from recsys_tpu.parallel.mesh import MODEL_AXIS, make_mesh
from recsys_tpu.train.checkpoint import restore_sharded, save_sharded
from recsys_tpu.train.loop import Trainer


def _trained_trainer(mesh, seed=3):
    schema, data = synthetic_ctr(num_examples=512, num_dense=2, num_sparse=4,
                                 vocab_size=64, embed_dim=4, seed=11)
    tr = Trainer(DLRM(schema, bottom_units=(16, 4), top_units=(16,)),
                 learning_rate=1e-2, mesh=mesh, seed=seed)
    tr.fit(data, batch_size=128, epochs=1, verbose=False)
    return schema, data, tr


def test_sharded_checkpoint_roundtrip_preserves_layout(tmp_path):
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(data=4, model=2)
    schema, data, tr = _trained_trainer(mesh)
    path = str(tmp_path / "ckpt")
    save_sharded(path, tr.state)

    # every saved block is shard-sized: no file entry may hold a full
    # model-sharded table (the no-host-gather property, checked on disk)
    tables = {
        id(l): l for p_, l in
        jax.tree_util.tree_leaves_with_path(tr.state.params)
        if "StackedEmbedding" in jax.tree_util.keystr(p_)
        and l.sharding.spec == P(MODEL_AXIS, None)
    }
    assert tables, "fixture must produce model-sharded tables"
    blocks = [np.load(os.path.join(path, f))
              for f in os.listdir(path) if f.endswith(".npy")]
    assert blocks, "block-per-file checkpoint produced no .npy shards"
    for t in tables.values():
        matching = [b for b in blocks
                    if b.ndim == 2 and b.shape[1] == t.shape[1]
                    and b.shape[0] in (t.shape[0], t.shape[0] // 2)]
        assert matching
        assert all(m.shape[0] <= t.shape[0] // 2 for m in matching), \
            "a full table landed in the checkpoint"

    # restore into a FRESH trainer (different seed -> different params)
    _, _, tr2 = _trained_trainer(mesh, seed=99)
    before = jax.tree_util.tree_leaves(tr2.state.params)[0]
    restored = restore_sharded(path, tr2.state)
    # values match the saved state exactly
    for a, b in zip(jax.tree_util.tree_leaves(tr.state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                                   atol=0)
    # and the sharded layout survived (tables still model-sharded)
    flat = jax.tree_util.tree_leaves_with_path(restored.params)
    sharded = [l for p_, l in flat
               if "StackedEmbedding" in jax.tree_util.keystr(p_)
               and isinstance(l, jax.Array)
               and l.sharding.spec == P(MODEL_AXIS, None)]
    assert sharded, "restore lost the model-axis sharding"
    # restored state actually trains on
    tr2.state = restored
    h = tr2.fit(data, batch_size=128, epochs=1, verbose=False)
    assert np.isfinite(h["loss"][0])


def test_fit_defaults_to_sharded_checkpoint_under_model_axis(tmp_path):
    """Trainer.fit(checkpoint_path=...) on a model-axis mesh must write the
    shard-parallel format (per-shard .npy files, no full-state msgpack) and
    the checkpoint must restore + resume training (VERDICT r2 weak #2)."""
    mesh = make_mesh(data=4, model=2)
    schema, data, _ = _trained_trainer(mesh)
    tr = Trainer(DLRM(schema, bottom_units=(16, 4), top_units=(16,)),
                 learning_rate=1e-2, mesh=mesh, seed=5)
    path = str(tmp_path / "best")
    tr.fit(data, batch_size=128, epochs=1, verbose=False,
           val_data=data, checkpoint_path=path)
    assert os.path.isdir(path), "sharded default should make a directory"
    files = os.listdir(path)
    assert any(f.endswith(".npy") for f in files)
    assert any(f.startswith("manifest_p") for f in files)

    restored = restore_sharded(path, tr.state)
    tr.state = restored
    h = tr.fit(data, batch_size=128, epochs=1, verbose=False)
    assert np.isfinite(h["loss"][0])


def test_sharded_checkpoint_detects_structure_mismatch(tmp_path):
    mesh = make_mesh(data=4, model=2)
    _, _, tr = _trained_trainer(mesh)
    path = str(tmp_path / "ckpt")
    save_sharded(path, tr.state)
    try:
        restore_sharded(path, {"not": jnp.zeros((3, 3))})
    except ValueError as e:
        assert "leaf" in str(e) or "block" in str(e) or "index" in str(e)
    else:
        raise AssertionError("expected ValueError on structure mismatch")
