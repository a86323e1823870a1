"""Kernel ops vs brute-force references."""
import jax
import jax.numpy as jnp
import numpy as np

from recsys_tpu.kernels import attention as akernels
from recsys_tpu.kernels import embedding as ekernels
from recsys_tpu.kernels import interactions as ikernels


def test_fm_pairwise_matches_bruteforce():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 6, 8)), jnp.float32)
    got = ikernels.fm_pairwise(x)
    # brute force: sum over pairs i<j of <v_i, v_j>
    want = np.zeros(4)
    xn = np.asarray(x)
    for b in range(4):
        for i in range(6):
            for j in range(i + 1, 6):
                want[b] += xn[b, i] @ xn[b, j]
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_dot_interaction_matches_bruteforce():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 5, 4)), jnp.float32)
    got = ikernels.dot_interaction(x)
    assert got.shape == (3, 10)
    xn = np.asarray(x)
    want = []
    for b in range(3):
        row = []
        for i in range(5):
            for j in range(i):
                row.append(xn[b, i] @ xn[b, j])
        want.append(row)
    np.testing.assert_allclose(np.sort(got, axis=1), np.sort(want, axis=1), rtol=1e-4)


def test_sdpa_masking_and_scale():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(2, 3, 4, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 3, 5, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 3, 5, 8)), jnp.float32)
    mask = jnp.asarray(rng.random((2, 1, 4, 5)) > 0.3)
    got = akernels.sdpa(q, k, v, mask)
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(8)
    logits = np.where(np.asarray(mask), logits, -1e9)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", w, v)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # None mask attends everywhere (ref bug §2.6.9 masked everything)
    got_none = akernels.sdpa(q, k, v, None)
    assert np.all(np.isfinite(np.asarray(got_none)))


def test_segment_sum_gather_modes():
    table = jnp.arange(20, dtype=jnp.float32).reshape(10, 2)
    rows = jnp.asarray([[1, 2, 0], [3, 0, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 0], [1, 0, 0]], jnp.float32)
    mean = ekernels.segment_sum_gather(table, rows, mask, mode="mean")
    np.testing.assert_allclose(mean[0], (table[1] + table[2]) / 2)
    np.testing.assert_allclose(mean[1], table[3])
    s = ekernels.segment_sum_gather(table, rows, mask, mode="sum")
    np.testing.assert_allclose(s[0], table[1] + table[2])


def test_gather_grad_is_scatter_add():
    table = jnp.ones((6, 3), jnp.float32)
    rows = jnp.asarray([[0, 0], [2, 3]], jnp.int32)

    def f(t):
        return jnp.sum(ekernels.gather(t, rows))

    g = jax.grad(f)(table)
    np.testing.assert_allclose(np.asarray(g)[:, 0], [2, 0, 1, 1, 0, 0])
