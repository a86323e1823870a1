"""FusedMLP (ops/mlp.py + kernels/pallas/mlp_tpu.py): forward and gradient
parity with the plain flax MLP stack, and the DLRM fused_mlps route."""
import numpy as np

import jax
import jax.numpy as jnp

from recsys_tpu.ops.mlp import MLP, FusedMLP


def _ref_apply(x, ws, bs):
    h = x
    for i, (w, b) in enumerate(zip(ws, bs)):
        h = h @ w + b[0]
        if i < len(ws) - 1:
            h = jnp.maximum(h, 0.0)
    return h


def _make(dims, seed=0):
    rng = np.random.default_rng(seed)
    ws = [jnp.asarray(rng.standard_normal((a, b)) * (1 / np.sqrt(a)),
                      jnp.float32) for a, b in zip(dims, dims[1:])]
    bs = [jnp.asarray(rng.standard_normal((1, b)) * 0.1, jnp.float32)
          for b in dims[1:]]
    return ws, bs


def test_fused_mlp_forward_and_grads_match_reference():
    from recsys_tpu.ops.mlp import _fused_mlp

    dims = [13, 64, 32, 16]
    ws, bs = _make(dims)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((96, dims[0])), jnp.float32)
    g = jnp.asarray(rng.standard_normal((96, dims[-1])), jnp.float32)

    y = _fused_mlp(x, ws, bs, False, True)  # f32 matmuls, interpret
    np.testing.assert_allclose(np.asarray(y), np.asarray(_ref_apply(x, ws, bs)),
                               rtol=1e-5, atol=1e-6)

    def loss(args):
        x, ws, bs = args
        return jnp.sum(_fused_mlp(x, ws, bs, False, True) * g)

    def loss_ref(args):
        x, ws, bs = args
        return jnp.sum(_ref_apply(x, ws, bs) * g)

    got = jax.grad(loss)((x, ws, bs))
    want = jax.grad(loss_ref)((x, ws, bs))
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-4)


def test_fused_mlp_module_matches_plain_mlp():
    """Copy params across: FusedMLP(x) == MLP(x) for relu/no-BN/no-dropout."""
    dims_hidden, out_dim = (32, 24), 8
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((64, 12)), jnp.float32)

    plain = MLP(dims_hidden, out_dim=out_dim)
    fused = FusedMLP(dims_hidden, out_dim=out_dim, mm_bf16=False)
    pv = plain.init(jax.random.PRNGKey(0), x)["params"]
    fv = {"params": {}}
    for i, name in enumerate(sorted(pv, key=lambda k: int(k.split("_")[1]))):
        fv["params"][f"kernel_{i}"] = pv[name]["kernel"]
        fv["params"][f"bias_{i}"] = pv[name]["bias"][None, :]
    y_plain = plain.apply({"params": pv}, x)
    y_fused = fused.apply(fv, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain),
                               rtol=1e-5, atol=1e-6)


def test_dlrm_fused_mlps_trains():
    from recsys_tpu.data.synthetic import synthetic_ctr
    from recsys_tpu.models.ctr.dlrm import DLRM
    from recsys_tpu.train.loop import Trainer

    schema, data = synthetic_ctr(num_examples=512, num_dense=4, num_sparse=4,
                                 vocab_size=32, embed_dim=8, seed=3)
    tr = Trainer(DLRM(schema, bottom_units=(16, 8), top_units=(16,),
                      fused_mlps=True),
                 learning_rate=1e-2, seed=5)
    hist = tr.fit(data, batch_size=128, epochs=3, verbose=False)
    assert hist["loss"][-1] < hist["loss"][0]
