"""Regression: every Pallas-dispatch op must survive TWO grad traces in one
process under two DIFFERENT jits.

Round 3 shipped a live crash here: ``dispatch._dot_sel_matrix`` was an
``lru_cache`` returning a ``jnp`` array, so the constant created inside the
first grad trace leaked into the second trace of the same (F,
self_interaction) key and died with ``UnexpectedTracerError`` — crashing
``bench.py --breakdown`` at HEAD (any process that grad-traces a
DotInteraction model twice).  The cache now stores numpy; these tests pin
re-traceability for the WHOLE kernel dispatch surface so no future cache
can regress it.

Each op is traced via two distinct Python functions (distinct jit cache
entries → two real traces), with identical shapes/dtypes so any trace-local
cached value WOULD be reused across traces if one existed.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_tpu.kernels import dispatch


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _two_grad_traces(make_loss, *args):
    """Trace make_loss's op under jax.grad twice via two different jits and
    check the results agree (same math, fresh trace each time)."""

    def loss_a(*a):
        return make_loss(*a)

    def loss_b(*a):
        return make_loss(*a)

    g1 = jax.jit(jax.grad(loss_a))(*args)
    g2 = jax.jit(jax.grad(loss_b))(*args)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)
    return g1


def test_dot_interaction_retrace(rng):
    # F=27 matches the DLRM bench shape whose cached (f, self_interaction)
    # key triggered the round-3 crash
    x = jnp.asarray(rng.normal(size=(4, 27, 8)), jnp.float32)

    def loss(x):
        return jnp.sum(dispatch.dot_interaction(x, interpret=True) ** 2)

    _two_grad_traces(loss, x)


def test_dot_interaction_self_retrace(rng):
    x = jnp.asarray(rng.normal(size=(4, 11, 8)), jnp.float32)

    def loss(x):
        return jnp.sum(
            dispatch.dot_interaction(x, self_interaction=True, interpret=True)
        )

    _two_grad_traces(loss, x)


def test_fm_pairwise_retrace(rng):
    x = jnp.asarray(rng.normal(size=(4, 9, 16)), jnp.float32)

    def loss(x):
        return jnp.sum(dispatch.fm_pairwise_vector(x, interpret=True))

    _two_grad_traces(loss, x)


def test_sdpa_retrace(rng):
    q, k, v = (jnp.asarray(rng.normal(size=(2, 2, 16, 8)), jnp.float32)
               for _ in range(3))
    mask = jnp.asarray(rng.random((2, 16)) > 0.25)

    def loss(q, k, v):
        return jnp.sum(dispatch.sdpa(q, k, v, mask, interpret=True) ** 2)

    def loss2(q, k, v):
        return jnp.sum(dispatch.sdpa(q, k, v, mask, interpret=True) ** 2)

    g1 = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.jit(jax.grad(loss2, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_pooled_gather_retrace(rng):
    table = jnp.asarray(rng.normal(size=(32, 128)), jnp.float32)
    rows = jnp.asarray(rng.integers(0, 32, size=(4, 6)), jnp.int32)
    mask = jnp.asarray(rng.random((4, 6)) > 0.3)

    def loss(t):
        return jnp.sum(
            dispatch.segment_sum_gather(t, rows, mask, interpret=True) ** 2
        )

    _two_grad_traces(loss, table)


def test_fused_topk_retrace(rng):
    # eval-only op: two full jit traces (no grad) must both compile + agree
    from recsys_tpu.kernels.pallas.topk_tpu import topk_scores_pallas

    q = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    items = jnp.asarray(rng.normal(size=(64, 16)), jnp.float32)

    v1, i1 = jax.jit(lambda a, b: topk_scores_pallas(a, b, k=4,
                                                     interpret=True))(q, items)
    v2, i2 = jax.jit(lambda a, b: topk_scores_pallas(a, b, k=4,
                                                     interpret=True))(q, items)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_fused_mlp_retrace(rng):
    from recsys_tpu.ops.mlp import FusedMLP

    x = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    m = FusedMLP(hidden_units=(32,), out_dim=8, mm_bf16=False)
    params = m.init(jax.random.PRNGKey(0), x)

    def loss(p, x):
        return jnp.sum(m.apply(p, x) ** 2)

    def loss2(p, x):
        return jnp.sum(m.apply(p, x) ** 2)

    g1 = jax.jit(jax.grad(loss))(params, x)
    g2 = jax.jit(jax.grad(loss2))(params, x)
    l1, l2 = jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_dot_interaction_retrace_unjitted_then_jitted(rng):
    """The exact round-3 repro shape: an eager grad call (populates any
    trace-local cache) followed by a fresh jitted grad trace."""
    x = jnp.asarray(rng.normal(size=(2, 27, 4)), jnp.float32)

    def loss(x):
        return jnp.sum(dispatch.dot_interaction(x, interpret=True))

    g_eager = jax.grad(loss)(x)
    g_jit = jax.jit(jax.grad(loss))(x)
    np.testing.assert_allclose(np.asarray(g_eager), np.asarray(g_jit),
                               rtol=1e-6)
