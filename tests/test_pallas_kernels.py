"""Pallas kernel path (interpret mode on CPU) vs jnp references: forward AND
gradients (the dispatch layer's closed-form VJPs must match autodiff)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_tpu.kernels import attention as attn_ref
from recsys_tpu.kernels import dispatch
from recsys_tpu.kernels import embedding as emb_ref
from recsys_tpu.kernels import interactions as int_ref


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_fm_vector_forward_and_grad(rng):
    x = jnp.asarray(rng.normal(size=(12, 9, 16)), jnp.float32)
    got = dispatch.fm_pairwise_vector(x, interpret=True)
    np.testing.assert_allclose(got, int_ref.fm_pairwise_vector(x),
                               rtol=1e-4, atol=1e-4)

    def loss_kernel(x):
        return jnp.sum(jnp.sin(dispatch.fm_pairwise_vector(x, interpret=True)))

    def loss_ref(x):
        return jnp.sum(jnp.sin(int_ref.fm_pairwise_vector(x)))

    np.testing.assert_allclose(
        jax.grad(loss_kernel)(x), jax.grad(loss_ref)(x), rtol=1e-3, atol=1e-4
    )


def test_dot_interaction_forward_and_grad(rng):
    x = jnp.asarray(rng.normal(size=(8, 11, 8)), jnp.float32)
    got = dispatch.dot_interaction(x, interpret=True)
    np.testing.assert_allclose(got, int_ref.dot_interaction(x),
                               rtol=1e-4, atol=1e-4)

    g = jnp.asarray(rng.normal(size=got.shape), jnp.float32)

    def loss_kernel(x):
        return jnp.sum(dispatch.dot_interaction(x, interpret=True) * g)

    def loss_ref(x):
        return jnp.sum(int_ref.dot_interaction(x) * g)

    np.testing.assert_allclose(
        jax.grad(loss_kernel)(x), jax.grad(loss_ref)(x), rtol=1e-3, atol=1e-4
    )
    # self-interaction variant
    got_s = dispatch.dot_interaction(x, self_interaction=True, interpret=True)
    np.testing.assert_allclose(
        got_s, int_ref.dot_interaction(x, self_interaction=True),
        rtol=1e-4, atol=1e-4,
    )


def test_sdpa_forward_and_grad(rng):
    B, H, S, D = 2, 2, 40, 16
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
               for _ in range(3))
    mask = jnp.asarray(rng.random((B, S)) > 0.25)
    got = dispatch.sdpa(q, k, v, mask, interpret=True)
    ref = attn_ref.sdpa(q, k, v, mask[:, None, None, :])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def loss_kernel(q, k, v):
        return jnp.sum(dispatch.sdpa(q, k, v, mask, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attn_ref.sdpa(q, k, v, mask[:, None, None, :]) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_sdpa_precision_knob(rng):
    """precision=HIGHEST threads through both paths (the on-chip contract:
    tools/flash_numerics pins the round-1 0.5% gradient gap to DEFAULT MXU
    input rounding; HIGHEST makes flash and XLA agree to ~1e-6)."""
    B, H, S, D = 2, 2, 40, 16
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
               for _ in range(3))
    mask = jnp.asarray(rng.random((B, S)) > 0.25)
    hi = jax.lax.Precision.HIGHEST

    def loss_kernel(q, k, v):
        out = dispatch.sdpa(q, k, v, mask, interpret=True, precision=hi)
        return jnp.sum(out ** 2)

    def loss_ref(q, k, v):
        out = attn_ref.sdpa(q, k, v, mask[:, None, None, :], precision=hi)
        return jnp.sum(out ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_sdpa_causal(rng):
    B, H, S, D = 1, 1, 24, 8
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
               for _ in range(3))
    causal = jnp.arange(S)[:, None] >= jnp.arange(S)[None, :]
    ref = attn_ref.sdpa(q, k, v, causal[None, None])
    got = dispatch.sdpa(q, k, v, None, causal=True, interpret=True)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", ["sum", "mean", "sqrtn"])
def test_segment_sum_gather_forward_and_grad(rng, mode):
    table = jnp.asarray(rng.normal(size=(50, 8)), jnp.float32)
    rows = jnp.asarray(rng.integers(0, 50, (13, 7)), jnp.int32)
    mask = jnp.asarray(rng.random((13, 7)) > 0.4)
    got = dispatch.segment_sum_gather(table, rows, mask, mode=mode,
                                      interpret=True)
    ref = emb_ref.segment_sum_gather(table, rows, mask, mode=mode)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    g = jnp.asarray(rng.normal(size=got.shape), jnp.float32)

    def loss_kernel(t):
        return jnp.sum(
            dispatch.segment_sum_gather(t, rows, mask, mode=mode,
                                        interpret=True) * g
        )

    def loss_ref(t):
        return jnp.sum(emb_ref.segment_sum_gather(t, rows, mask, mode=mode) * g)

    np.testing.assert_allclose(
        jax.grad(loss_kernel)(table), jax.grad(loss_ref)(table),
        rtol=1e-3, atol=1e-4,
    )


def test_fused_topk_matches_dense(rng):
    from recsys_tpu.kernels.pallas.topk_tpu import topk_scores_pallas
    from recsys_tpu.train.retrieval import topk_scores

    q = jnp.asarray(rng.normal(size=(24, 8)), jnp.float32)
    items = jnp.asarray(rng.normal(size=(130, 8)), jnp.float32)
    pv, pi = topk_scores_pallas(q, items, k=7, blk_q=8, tile_n=32,
                                interpret=True)
    dv, di = topk_scores(q, items, k=7)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(dv), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(di))


def test_dlrm_bf16_compute_close_to_f32(rng):
    import jax

    from recsys_tpu.data.synthetic import synthetic_ctr
    from recsys_tpu.models.ctr.dlrm import DLRM

    schema, data = synthetic_ctr(num_examples=16, num_dense=4, num_sparse=5,
                                 vocab_size=11, embed_dim=8)
    batch = {"dense": jnp.asarray(data["dense"]),
             "sparse": jnp.asarray(data["sparse"])}
    m32 = DLRM(schema, bottom_units=(16,), top_units=(16, 8))
    m16 = DLRM(schema, bottom_units=(16,), top_units=(16, 8),
               compute_dtype=jnp.bfloat16)
    v = m32.init(jax.random.PRNGKey(0), batch, training=False)
    o32 = m32.apply(v, batch, training=False)
    o16 = m16.apply(v, batch, training=False)  # same params, bf16 compute
    assert o16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(o32), np.asarray(o16),
                               rtol=0.1, atol=0.1)


def test_sdpa_causal_backward(rng):
    B, H, S, D = 2, 2, 48, 16
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
               for _ in range(3))
    # keep key 0 visible: with causal masking a fully-masked query row is
    # degenerate (the jnp reference softmaxes uniformly over -inf logits
    # while flash emits zeros — both arbitrary, gradients differ)
    mask = jnp.asarray(rng.random((B, S)) > 0.2).at[:, 0].set(True)
    cm = mask[:, None, None, :] & (
        jnp.arange(S)[:, None] >= jnp.arange(S)[None, :]
    )

    def loss_kernel(q, k, v):
        return jnp.sum(
            dispatch.sdpa(q, k, v, mask, causal=True, interpret=True) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(attn_ref.sdpa(q, k, v, cm) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_hot_gather_pallas_matches_packed_gather(rng):
    """The Zipf-split probe's hot-path kernel (one-hot matmul gather from a
    VMEM hot buffer + lane-compress) must reproduce the XLA packed gather
    on the hot subset, with sentinel slots producing zeros."""
    from recsys_tpu.kernels.embedding import packed_gather
    from recsys_tpu.tools.gather_split_probe import (
        CH, hot_gather_pallas, host_split,
    )
    from recsys_tpu.tools import gather_split_probe as gsp

    ids = gsp._zipf_ids(np.random.default_rng(3), 1.1, 2048)
    hot_rows, hot_idx2d, inv, cold_ids, n_hot, n_cold = host_split(ids, 128)
    vp = -(-gsp.VOCAB // gsp.PACK)
    vp += (-vp) % 8
    table = jnp.asarray(
        np.random.default_rng(0).uniform(-0.05, 0.05, (vp, gsp.WIDE)),
        jnp.float32,
    )
    hot_buf = jnp.take(table, jnp.asarray(hot_rows), axis=0)
    # exact f32 path: bit-parity with the XLA gather
    hot_out = hot_gather_pallas(hot_buf, jnp.asarray(hot_idx2d),
                                pack=gsp.PACK, d=gsp.D, mm_bf16=False,
                                interpret=True)
    both = jnp.concatenate(
        [hot_out[:n_hot], packed_gather(table, jnp.asarray(cold_ids),
                                        gsp.PACK, gsp.D)], axis=0)
    got = np.asarray(jnp.take(both, jnp.asarray(inv), axis=0))
    want = np.asarray(packed_gather(table, jnp.asarray(ids), gsp.PACK,
                                    gsp.D))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
    # sentinel padding rows emit zeros
    if n_hot % CH:
        pad = np.asarray(hot_out[n_hot:])
        np.testing.assert_array_equal(pad, np.zeros_like(pad))
