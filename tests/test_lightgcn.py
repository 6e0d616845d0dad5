"""LightGCN: edge-list propagation must equal the dense normalized-
adjacency oracle, and the model must learn end to end."""

import jax
import jax.numpy as jnp
import numpy as np

from tfrec_tpu.configs import Config, DataConfig, ModelConfig, OptimConfig, TrainConfig
from tfrec_tpu.models import DataSpec, build_model
from tfrec_tpu.train.trainer import run


def test_propagation_matches_dense_adjacency_oracle():
    rng = np.random.default_rng(0)
    nu, ni, d, k = 7, 9, 4, 3
    users = rng.integers(0, nu, 30).astype(np.int32)
    items = rng.integers(0, ni, 30).astype(np.int32)
    # dedupe edges (the oracle adjacency is 0/1; duplicate interactions
    # would double-count in the edge list but not in A)
    pairs = sorted(set(zip(users.tolist(), items.tolist())))
    users = np.array([p[0] for p in pairs], np.int32)
    items = np.array([p[1] for p in pairs], np.int32)

    m = build_model(
        ModelConfig(name="lightgcn", embed_dim=d, lightgcn_layers=k),
        DataSpec.interaction(nu, ni),
    )
    m.attach_graph(users, items)
    params = m.init(jax.random.PRNGKey(0))
    pu, qi = jax.jit(m.propagate)(params["dense"])

    # Dense oracle: E^(l+1) = A_hat @ E^(l) over the bipartite graph.
    a = np.zeros((nu + ni, nu + ni), np.float32)
    for u, i in zip(users, items):
        a[u, nu + i] = a[nu + i, u] = 1.0
    deg = np.maximum(a.sum(1), 1.0)
    a_hat = a / np.sqrt(deg[:, None] * deg[None, :])
    e = np.concatenate(
        [np.asarray(params["dense"]["user_emb"]),
         np.asarray(params["dense"]["item_emb"])]
    )
    acc = e.copy()
    for _ in range(k):
        e = a_hat @ e
        acc += e
    acc /= k + 1
    np.testing.assert_allclose(np.asarray(pu), acc[:nu], rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(qi), acc[nu:], rtol=2e-5, atol=1e-6)


def test_lightgcn_learns_above_random():
    cfg = Config(
        data=DataConfig(source="synthetic_implicit", num_users=256,
                        num_items=512, interactions_per_user=24, seed=1),
        model=ModelConfig(name="lightgcn", embed_dim=32, lightgcn_layers=2),
        optim=OptimConfig(learning_rate=0.05, dense_optimizer="adam"),
        train=TrainConfig(batch_size=256, epochs=8, eval_every_epochs=8,
                          eval_topk=(20,), loss="bpr"),
    )
    t, hist = run(cfg, quiet=True)
    # random recall@20 on 512 items ~ 0.039
    assert hist[-1]["recall@20"] > 0.12, hist[-1]


def test_propagate_without_graph_raises():
    import pytest

    m = build_model(
        ModelConfig(name="lightgcn", embed_dim=4), DataSpec.interaction(4, 8)
    )
    params = m.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="attach_graph"):
        m.propagate(params["dense"])


def test_ngcf_propagation_matches_dense_oracle():
    """NGCF layer (factored bi-interaction, edge-list segsum) must equal
    the explicit dense formulation LeakyReLU(W1(e+Ae) + W2(Ae .* e))
    with layer-concat output."""
    rng = np.random.default_rng(1)
    nu, ni, d, k = 6, 8, 4, 2
    pairs = sorted(set(zip(rng.integers(0, nu, 24).tolist(),
                           rng.integers(0, ni, 24).tolist())))
    users = np.array([p[0] for p in pairs], np.int32)
    items = np.array([p[1] for p in pairs], np.int32)

    m = build_model(
        ModelConfig(name="ngcf", embed_dim=d, lightgcn_layers=k, dropout=0.0),
        DataSpec.interaction(nu, ni),
    )
    m.attach_graph(users, items)
    params = m.init(jax.random.PRNGKey(0))
    pu, qi = jax.jit(m.propagate)(params["dense"])
    assert pu.shape == (nu, d * (k + 1)) and qi.shape == (ni, d * (k + 1))

    a = np.zeros((nu + ni, nu + ni), np.float64)
    for u, i in zip(users, items):
        a[u, nu + i] = a[nu + i, u] = 1.0
    deg = np.maximum(a.sum(1), 1.0)
    a_hat = a / np.sqrt(deg[:, None] * deg[None, :])
    e = np.concatenate(
        [np.asarray(params["dense"]["user_emb"]),
         np.asarray(params["dense"]["item_emb"])]
    ).astype(np.float64)
    outs = [e]
    for layer in range(k):
        w1 = np.asarray(params["dense"][f"w1_{layer}"], np.float64)
        w2 = np.asarray(params["dense"][f"w2_{layer}"], np.float64)
        b1 = np.asarray(params["dense"][f"b1_{layer}"], np.float64)
        b2 = np.asarray(params["dense"][f"b2_{layer}"], np.float64)
        agg = a_hat @ e
        pre = (e + agg) @ w1 + b1 + (agg * e) @ w2 + b2
        e = np.where(pre > 0, pre, 0.2 * pre)
        outs.append(e)
    acc = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(np.asarray(pu), acc[:nu], rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(qi), acc[nu:], rtol=2e-4, atol=1e-6)


def test_ngcf_learns_above_random():
    cfg = Config(
        data=DataConfig(source="synthetic_implicit", num_users=256,
                        num_items=512, interactions_per_user=24, seed=1),
        model=ModelConfig(name="ngcf", embed_dim=32, lightgcn_layers=2,
                          dropout=0.1),
        optim=OptimConfig(learning_rate=0.01, dense_optimizer="adam"),
        train=TrainConfig(batch_size=256, epochs=8, eval_every_epochs=8,
                          eval_topk=(20,), loss="bpr"),
    )
    t, hist = run(cfg, quiet=True)
    # random recall@20 on 512 items ~ 0.039
    assert hist[-1]["recall@20"] > 0.12, hist[-1]
