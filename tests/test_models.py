"""Model-zoo unit tests: shapes, pairwise/pointwise consistency, and
score_all agreement with the training-path forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfrec_tpu.configs import ModelConfig
from tfrec_tpu.models import DataSpec, build_model

NU, NI, B = 11, 17, 8
INTERACTION_MODELS = [
    ModelConfig(name="mf", embed_dim=6),
    ModelConfig(name="gmf", gmf_dim=6),
    ModelConfig(name="mlp", mlp_embed_dim=6, mlp_dims=(12, 6)),
    ModelConfig(name="neumf", gmf_dim=4, mlp_embed_dim=6, mlp_dims=(8, 4)),
    ModelConfig(name="convncf", embed_dim=8, convncf_channels=4),
]
CTR_MODELS = [
    ModelConfig(name="fm", embed_dim=4),
    ModelConfig(name="dcn", embed_dim=4, num_cross_layers=2, mlp_dims=(8,)),
    ModelConfig(name="dcnv2", embed_dim=4, num_cross_layers=2, mlp_dims=(8,)),
    ModelConfig(name="dcnv2", embed_dim=4, num_cross_layers=2, cross_rank=2, mlp_dims=(8,)),
    ModelConfig(name="deepfm", embed_dim=4, mlp_dims=(8,)),
    ModelConfig(name="nfm", embed_dim=4, mlp_dims=(8,)),
    ModelConfig(name="widedeep", embed_dim=4, mlp_dims=(8,)),
    ModelConfig(name="dlrm", embed_dim=4, mlp_dims=(8,)),
]


def _gathered(model, params, batch):
    ids = model.lookup_ids(batch)
    return {k: jnp.take(params["tables"][k], v, axis=0) for k, v in ids.items()}


def _point_batch(rng):
    return {
        "user": jnp.asarray(rng.integers(0, NU, B, dtype=np.int32)),
        "item": jnp.asarray(rng.integers(0, NI, B, dtype=np.int32)),
        "label": jnp.asarray(rng.integers(0, 2, B).astype(np.float32)),
    }


@pytest.mark.parametrize("cfg", INTERACTION_MODELS, ids=lambda c: c.name)
def test_interaction_model_shapes_and_consistency(cfg):
    rng = np.random.default_rng(0)
    model = build_model(cfg, DataSpec.interaction(NU, NI))
    params = model.init(jax.random.PRNGKey(0))
    batch = _point_batch(rng)
    logits = model.forward(params["dense"], _gathered(model, params, batch), batch)
    assert logits.shape == (B,)

    pair = {
        "user": batch["user"],
        "pos": batch["item"],
        "neg": jnp.asarray(rng.integers(0, NI, B, dtype=np.int32)),
    }
    diff = model.forward(params["dense"], _gathered(model, params, pair), pair)
    # pairwise output == pointwise(pos) - pointwise(neg)
    pos_b = {"user": pair["user"], "item": pair["pos"], "label": batch["label"]}
    neg_b = {"user": pair["user"], "item": pair["neg"], "label": batch["label"]}
    s_pos = model.forward(params["dense"], _gathered(model, params, pos_b), pos_b)
    s_neg = model.forward(params["dense"], _gathered(model, params, neg_b), neg_b)
    np.testing.assert_allclose(np.asarray(diff), np.asarray(s_pos - s_neg), rtol=2e-4, atol=1e-5)

    # score_all[u, i] == pointwise logit for (u, i)
    scores = model.score_all(params, batch["user"])
    assert scores.shape == (B, NI)
    picked = np.asarray(scores)[np.arange(B), np.asarray(batch["item"])]
    np.testing.assert_allclose(picked, np.asarray(s_pos), rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("cfg", CTR_MODELS,
                         ids=lambda c: f"{c.name}-r{c.cross_rank}")
def test_ctr_model_shapes_and_grads(cfg):
    rng = np.random.default_rng(1)
    vocabs, nd = (9, 13, 7), 5
    model = build_model(cfg, DataSpec.ctr(vocabs, nd))
    params = model.init(jax.random.PRNGKey(1))
    batch = {
        "dense": jnp.asarray(rng.normal(size=(B, nd)).astype(np.float32)),
        "cat": jnp.asarray(
            np.stack([rng.integers(0, v, B) for v in vocabs], 1).astype(np.int32)
        ),
        "label": jnp.asarray(rng.integers(0, 2, B).astype(np.float32)),
    }
    g = _gathered(model, params, batch)
    logits = model.forward(params["dense"], g, batch)
    assert logits.shape == (B,)
    assert np.all(np.isfinite(np.asarray(logits)))

    # grads flow to every gathered table and dense leaf
    def loss(dense, gath):
        return jnp.sum(model.forward(dense, gath, batch) ** 2)

    dg, gg = jax.grad(loss, argnums=(0, 1))(params["dense"], g)
    for leaf in jax.tree_util.tree_leaves((dg, gg)):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_fm_two_field_score_all_matches_forward():
    model = build_model(ModelConfig(name="fm", embed_dim=4), DataSpec.ctr((NU, NI), 0))
    params = model.init(jax.random.PRNGKey(2))
    rng = np.random.default_rng(2)
    users = jnp.asarray(rng.integers(0, NU, B, dtype=np.int32))
    items = jnp.asarray(rng.integers(0, NI, B, dtype=np.int32))
    batch = {
        "dense": jnp.zeros((B, 0)),
        "cat": jnp.stack([users, items], axis=1),
        "label": jnp.zeros(B),
    }
    g = _gathered(model, params, batch)
    logits = model.forward(params["dense"], g, batch)
    scores = model.score_all(params, users)
    picked = np.asarray(scores)[np.arange(B), np.asarray(items)]
    np.testing.assert_allclose(picked, np.asarray(logits), rtol=1e-5, atol=1e-6)


def test_dcn_cross_stack_reference_semantics():
    """cross_stack xla path == hand-rolled per-layer recurrence."""
    from tfrec_tpu.kernels.cross import cross_stack_xla

    rng = np.random.default_rng(3)
    d, L = 6, 3
    x0 = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(L, d)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(L, d)).astype(np.float32))
    got = cross_stack_xla(x0, {"w": w, "b": b})
    x = np.asarray(x0)
    for l in range(L):
        xw = x @ np.asarray(w)[l]
        x = np.asarray(x0) * xw[:, None] + np.asarray(b)[l] + x
    np.testing.assert_allclose(np.asarray(got), x, rtol=1e-5)


def test_nfm_bi_interaction_matches_fm_identity():
    """Summing NFM's bi-interaction vector over D must equal FM's scalar
    second-order term (same O(F*D) identity before/after the D-reduce)."""
    from tfrec_tpu.models.ctr_base import fm_second_order
    from tfrec_tpu.models.nfm import bi_interaction

    rng = np.random.default_rng(3)
    fields = jnp.asarray(rng.normal(size=(5, 7, 4)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(jnp.sum(bi_interaction(fields), axis=-1)),
        np.asarray(fm_second_order(fields)),
        rtol=1e-5,
    )
