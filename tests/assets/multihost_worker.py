"""Two-process worker: one Trainer epoch on a hybrid DCN/ICI mesh.

Engines covered: the compiler-partitioned gather engine, the explicit a2a
engine, and the fused streaming embedding update (fused_adam) — the latter
under the Trainer's standing multihost data contract (every process passes
the GLOBAL arrays to fit; host prep sorts the same global batch identically
on each process, and the cotangent all-gather crosses DCN like any data-axis
collective)."""
import sys

import jax

jax.distributed.initialize(
    coordinator_address=f"localhost:{sys.argv[2]}",
    num_processes=2,
    process_id=int(sys.argv[1]),
)
from recsys_tpu.data.synthetic import synthetic_ctr
from recsys_tpu.models.ctr.dlrm import DLRM
from recsys_tpu.parallel.mesh import make_multihost_mesh
from recsys_tpu.train.loop import Trainer

mesh = make_multihost_mesh(model=2)
assert mesh.shape == {"data": 4, "model": 2}, mesh.shape
assert jax.process_count() == 2

schema, data = synthetic_ctr(num_examples=256, num_dense=2, num_sparse=4,
                             vocab_size=64, embed_dim=4, seed=11)
cases = [
    ("gather", {}, {}),
    ("a2a", {"embed_kw": {"engine": "a2a", "mesh": mesh, "num_groups": 1,
                          "capacity_factor": None}}, {}),
    ("fused", {"sparse_embed_grads": True},
     {"embedding_optimizer": "fused_adam", "embedding_fused_bf16": False}),
]
for engine, model_kw, train_kw in cases:
    tr = Trainer(DLRM(schema, bottom_units=(16, 4), top_units=(16,),
                      **model_kw),
                 learning_rate=1e-2, mesh=mesh, seed=3, **train_kw)
    h = tr.fit(data, batch_size=64, epochs=1, verbose=False)
    # full repr precision: the parent parses this and asserts cross-mesh
    # parity at atol=1e-6 — a .6f rounding would eat most of that margin
    print(f"RESULT proc={jax.process_index()} "
          f"engine={engine} "
          f"loss={float(h['loss'][0])!r}", flush=True)
