"""Sampled-softmax, multi-negative batches, and dropout behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from tfrec_tpu.configs import (
    Config, DataConfig, ModelConfig, OptimConfig, TrainConfig,
)
from tfrec_tpu.data.dataset import build_dataset
from tfrec_tpu.data.samplers import PairwiseSampler
from tfrec_tpu.models import DataSpec, build_model
from tfrec_tpu.train.losses import sampled_softmax
from tfrec_tpu.train.trainer import run


def test_multi_neg_sampler_shapes_and_exclusion():
    ds = build_dataset(DataConfig(
        source="synthetic_implicit", num_users=32, num_items=64,
        interactions_per_user=8,
    ))
    s = PairwiseSampler(ds, batch_size=16, num_negatives=4, seed=0, multi_neg=True)
    batch = next(iter(s.epoch(0)))
    assert batch["negs"].shape == (16, 4)
    assert batch["pos"].shape == (16,)
    # negatives exclude train positives
    train_pairs = set(zip(ds.train.users.tolist(), ds.train.items.tolist()))
    for u, negs in zip(batch["user"], batch["negs"]):
        for n in negs:
            assert (int(u), int(n)) not in train_pairs


def test_sampled_softmax_loss_oracle():
    scores = jnp.asarray([[2.0, 0.0, -1.0], [0.0, 0.0, 0.0]])
    got = float(sampled_softmax(scores, {}))
    want = -np.mean([
        np.log(np.exp(2) / (np.exp(2) + 1 + np.exp(-1))),
        np.log(1 / 3),
    ])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_mf_trains_with_sampled_softmax():
    cfg = Config(
        data=DataConfig(source="synthetic_implicit", num_users=96, num_items=192,
                        interactions_per_user=12),
        model=ModelConfig(name="mf", embed_dim=16),
        optim=OptimConfig(learning_rate=0.1, sparse_optimizer="rowwise_adagrad"),
        train=TrainConfig(batch_size=128, epochs=6, eval_every_epochs=6,
                          eval_topk=(20,), loss="sampled_softmax", num_negatives=8),
    )
    _, hist = run(cfg, quiet=True)
    assert hist[-1]["recall@20"] > 0.15, hist[-1]


def test_dropout_train_vs_eval_paths():
    model = build_model(
        ModelConfig(name="mlp", mlp_embed_dim=8, mlp_dims=(16, 8), dropout=0.5),
        DataSpec.interaction(10, 20),
    )
    params = model.init(jax.random.PRNGKey(0))
    batch = {
        "user": jnp.arange(6, dtype=jnp.int32),
        "item": jnp.arange(6, dtype=jnp.int32),
        "label": jnp.ones(6),
    }
    ids = model.lookup_ids(batch)
    g = {k: jnp.take(params["tables"][k], v, axis=0) for k, v in ids.items()}
    eval_logits = model.forward(params["dense"], g, batch)  # no rng: deterministic
    eval_logits2 = model.forward(params["dense"], g, batch)
    np.testing.assert_array_equal(np.asarray(eval_logits), np.asarray(eval_logits2))
    r1 = model.forward(params["dense"], g, batch, rng=jax.random.PRNGKey(1))
    r2 = model.forward(params["dense"], g, batch, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(r1), np.asarray(r2))  # masks differ
