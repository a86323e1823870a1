"""Match/retrieval models: shapes, per-example scoring, loss wiring."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_tpu.core.features import FeatureSchema, SparseFeature
from recsys_tpu.models.match.fm_match import FMMatch
from recsys_tpu.models.match.mind import MIND, squash
from recsys_tpu.models.match.ncf import NCF
from recsys_tpu.models.match.sasrec import SASRec
from recsys_tpu.models.match.two_tower import DSSM, SENetDSSM, cosine
from recsys_tpu.models.match.youtube_dnn import YoutubeDNN
from recsys_tpu.core.features import VarLenSparseFeature
from recsys_tpu.train import losses

B = 8


def _tower_schemas():
    user = FeatureSchema(sparse=[
        SparseFeature("user_id", 50, 8), SparseFeature("age", 7, 8)])
    item = FeatureSchema(sparse=[SparseFeature("item_id", 40, 8)])
    return user, item


def _tower_batch(rng):
    return {
        "user_sparse": jnp.asarray(rng.integers(0, 7, (B, 2)), jnp.int32),
        "item_sparse": jnp.asarray(rng.integers(0, 30, (B, 1)), jnp.int32),
    }


@pytest.mark.parametrize("maker", [DSSM, SENetDSSM])
def test_two_tower_per_example_scores(maker):
    rng = np.random.default_rng(0)
    user, item = _tower_schemas()
    model = maker(user, item, user_units=(16,), item_units=(16,), out_dim=8)
    batch = _tower_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch, training=False)
    out = model.apply(variables, batch, training=False)
    # bug §2.6.8 regression: one score PER EXAMPLE, not per batch
    assert out.shape == (B,)
    u = model.apply(variables, batch, training=False, method=model.user_embed)
    v = model.apply(variables, batch, training=False, method=model.item_embed)
    assert u.shape == (B, 8) and v.shape == (B, 8)
    sims = np.asarray(cosine(u, v))
    assert np.all(np.abs(sims) <= 1.0 + 1e-5)


def test_fm_match_towers():
    rng = np.random.default_rng(1)
    user, item = _tower_schemas()
    model = FMMatch(user, item)
    batch = _tower_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch, training=False)
    out = model.apply(variables, batch, training=False)
    assert out.shape == (B,)
    u = model.apply(variables, batch, method=model.user_embed)
    assert u.shape == (B, 8)


def test_youtube_dnn_in_batch_softmax():
    user = FeatureSchema(
        sparse=[SparseFeature("gender", 3, 8)],
        varlen=[VarLenSparseFeature("hist_item", 40, 8, max_len=6)],
    )
    rng = np.random.default_rng(2)
    model = YoutubeDNN(user, num_items=40, embed_dim=16, hidden_units=(16,))
    batch = {
        "user_sparse": jnp.asarray(rng.integers(0, 3, (B, 1)), jnp.int32),
        "hist": jnp.asarray(rng.integers(0, 40, (B, 6)), jnp.int32),
        "item_id": jnp.asarray(rng.integers(0, 40, (B,)), jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch, training=True)
    out = model.apply(variables, batch, training=False)
    assert out["user"].shape == (B, 16) and out["item"].shape == (B, 16)
    # embeddings are L2-normalised
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["user"]), axis=-1), 1.0, rtol=1e-4
    )
    loss = losses.in_batch_sampled_softmax(out["user"], out["item"])
    assert np.isfinite(float(loss))


def test_sasrec_shapes_and_padding_insensitivity():
    rng = np.random.default_rng(3)
    model = SASRec(num_items=30, embed_dim=16, num_blocks=2, max_len=10,
                   dropout_rate=0.0)
    hist = rng.integers(1, 30, (B, 10)).astype(np.int32)
    hist[:, :4] = 0  # front padding
    batch = {
        "hist": jnp.asarray(hist),
        "pos": jnp.asarray(rng.integers(1, 30, (B,)), jnp.int32),
        "neg": jnp.asarray(rng.integers(1, 30, (B, 5)), jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch, training=True)
    out = model.apply(variables, batch, training=False)
    assert out["pos_logits"].shape == (B,)
    assert out["neg_logits"].shape == (B, 5)
    loss = losses.pairwise_bce(out["pos_logits"], out["neg_logits"])
    assert np.isfinite(float(loss))
    # changing the CONTENT of a padded slot must not change outputs
    hist2 = hist.copy()
    user1 = model.apply(variables, jnp.asarray(hist), training=False,
                        method=model.encode)
    # pad ids are 0; replacing one real item does change it
    hist2[:, -1] = np.where(hist2[:, -1] == 1, 2, 1)
    user2 = model.apply(variables, jnp.asarray(hist2), training=False,
                        method=model.encode)
    assert not np.allclose(np.asarray(user1), np.asarray(user2))


def test_mind_capsules():
    rng = np.random.default_rng(4)
    model = MIND(num_items=30, embed_dim=8, k_max=3, user_units=(16,))
    batch = {
        "hist": jnp.asarray(rng.integers(1, 30, (B, 6)), jnp.int32),
        "item_id": jnp.asarray(rng.integers(1, 30, (B,)), jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch, training=False)
    out = model.apply(variables, batch, training=False)
    assert out["interests"].shape == (B, 3, 8)
    assert out["user"].shape == (B, 8)
    # squash maps norms into [0, 1)
    s = squash(jnp.asarray(rng.normal(size=(4, 8)) * 10))
    assert np.all(np.linalg.norm(np.asarray(s), axis=-1) < 1.0)
    # routing is per-example: permuting the batch permutes the outputs
    perm = np.asarray([1, 0] + list(range(2, B)))
    out2 = model.apply(
        variables,
        {"hist": batch["hist"][perm], "item_id": batch["item_id"][perm]},
        training=False,
    )
    np.testing.assert_allclose(
        np.asarray(out["user"])[perm], np.asarray(out2["user"]), atol=1e-5
    )


def test_mind_routing_semantics():
    """The fori_loop body is logit-updates only (always consuming
    stop-gradient behaviours); the one gradient-carrying capsule
    computation happens after the loop.  Pin that by matching an explicit
    unrolled reference."""
    from recsys_tpu.models.match.mind import CapsuleRouting

    rng = np.random.default_rng(7)
    L, D, K, iters = 6, 8, 3, 3
    hist = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, (B, L)), jnp.float32)
    mod = CapsuleRouting(k_max=K, iterations=iters)
    variables = mod.init(jax.random.PRNGKey(0), hist, mask)
    got = mod.apply(variables, hist, mask)

    # unrolled reference with the same fixed pseudo-random logits
    S = variables["params"]["S"]
    u_hat = jnp.einsum("bld,de->ble", hist, S)
    neg = jnp.asarray(-1e9, jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(0), (1, K, L)) * jnp.ones(
        (B, 1, 1), jnp.float32)
    for _ in range(iters - 1):
        logits = jnp.where(mask[:, None, :] > 0, b, neg)
        w = jax.nn.softmax(logits, axis=1)
        caps = squash(jnp.einsum("bkl,bld->bkd", w, u_hat))
        b = b + jnp.einsum("bkd,bld->bkl", caps, u_hat)
    logits = jnp.where(mask[:, None, :] > 0, b, neg)
    w = jax.nn.softmax(logits, axis=1)
    want = squash(jnp.einsum("bkl,bld->bkd", w, u_hat))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    # gradient flows into S only through the final capsule computation —
    # in particular it exists and is finite (the stop_gradient in the loop
    # must not sever it entirely)
    g = jax.grad(lambda v: jnp.sum(mod.apply(v, hist, mask) ** 2))(variables)
    gS = np.asarray(g["params"]["S"])
    assert np.all(np.isfinite(gS)) and np.any(gS != 0)


def test_ncf_scoring():
    rng = np.random.default_rng(5)
    model = NCF(num_users=20, num_items=30, gmf_dim=8, mlp_dim=8,
                mlp_units=(16, 8))
    batch = {
        "user": jnp.asarray(rng.integers(0, 20, (B,)), jnp.int32),
        "pos_item": jnp.asarray(rng.integers(0, 30, (B,)), jnp.int32),
        "neg_item": jnp.asarray(rng.integers(0, 30, (B, 4)), jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch, training=False)
    out = model.apply(variables, batch, training=False)
    assert out["pos_logits"].shape == (B,)
    assert out["neg_logits"].shape == (B, 4)
    # score() on (B,) items equals column scoring consistency
    s1 = model.apply(variables, batch["user"], batch["pos_item"],
                     method=model.score)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(out["pos_logits"]),
                               rtol=1e-5)


def test_two_tower_pair_mode_for_softmax_training():
    rng = np.random.default_rng(6)
    user, item = _tower_schemas()
    model = DSSM(user, item, user_units=(16,), item_units=(16,), out_dim=8,
                 output_mode="pair")
    batch = _tower_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch, training=False)
    out = model.apply(variables, batch, training=False)
    assert set(out) == {"user", "item"}
    assert out["user"].shape == (B, 8)
    loss = losses.in_batch_sampled_softmax(out["user"], out["item"])
    assert np.isfinite(float(loss))
