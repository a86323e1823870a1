"""Two-process worker: one Trainer epoch on a hybrid DCN/ICI mesh."""
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
for engine_kw in ({}, {"embed_kw": {"engine": "a2a", "mesh": mesh,
                                    "num_groups": 1,
                                    "capacity_factor": None}}):
    tr = Trainer(DLRM(schema, bottom_units=(16, 4), top_units=(16,),
                      **engine_kw),
                 learning_rate=1e-2, mesh=mesh, seed=3)
    h = tr.fit(data, batch_size=64, epochs=1, verbose=False)
    print(f"RESULT proc={jax.process_index()} "
          f"engine={'a2a' if engine_kw else 'gather'} "
          f"loss={h['loss'][0]:.6f}", flush=True)
