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


def test_lr_schedule_warmup_cosine():
    from tfrec_tpu.configs import OptimConfig
    from tfrec_tpu.train.step import make_schedule

    cfg = OptimConfig(learning_rate=1.0, lr_schedule="cosine",
                      warmup_steps=10, decay_steps=100, end_lr_factor=0.1)
    sched = make_schedule(cfg, 1.0)
    lrs = [float(sched(s)) for s in [0, 4, 9, 50, 100, 1000]]
    assert lrs[0] < lrs[1] < lrs[2]           # warming up
    assert abs(lrs[2] - 1.0) < 0.05           # warmup done ~ base lr (cosine already ticking)
    assert 0.1 < lrs[3] < 1.0                 # mid-decay
    assert abs(lrs[4] - 0.1) < 0.01           # decayed to end
    assert abs(lrs[5] - 0.1) < 0.01           # clamped


def test_schedule_trains_end_to_end():
    import numpy as np

    from tfrec_tpu.configs import (
        Config, DataConfig, MeshConfig, ModelConfig, OptimConfig, TrainConfig,
    )
    from tfrec_tpu.train.trainer import run

    cfg = Config(
        data=DataConfig(source="synthetic_implicit", num_users=64, num_items=128,
                        interactions_per_user=10),
        model=ModelConfig(name="mf", embed_dim=8),
        optim=OptimConfig(learning_rate=0.1, lr_schedule="cosine",
                          warmup_steps=5, decay_steps=50),
        train=TrainConfig(batch_size=128, epochs=3, eval_every_epochs=0, loss="bpr"),
        mesh=MeshConfig(data_axis_size=0),
    )
    _, hist = run(cfg, quiet=True)
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["loss"] < hist[0]["loss"]


def test_in_batch_softmax_oracle():
    from tfrec_tpu.train.losses import in_batch_softmax

    scores = jnp.asarray([[3.0, 0.0], [0.0, 2.0]])
    got = float(in_batch_softmax(scores, {}))
    want = -np.mean([
        np.log(np.exp(3) / (np.exp(3) + 1)),
        np.log(np.exp(2) / (np.exp(2) + 1)),
    ])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_mf_trains_with_in_batch_softmax():
    import numpy as _np

    from tfrec_tpu.configs import (
        Config, DataConfig, ModelConfig, OptimConfig, TrainConfig,
    )
    from tfrec_tpu.train.trainer import run

    cfg = Config(
        data=DataConfig(source="synthetic_implicit", num_users=96, num_items=192,
                        interactions_per_user=12),
        model=ModelConfig(name="mf", embed_dim=16),
        optim=OptimConfig(learning_rate=0.1, sparse_optimizer="rowwise_adagrad"),
        train=TrainConfig(batch_size=128, epochs=6, eval_every_epochs=6,
                          eval_topk=(20,), loss="in_batch_softmax"),
    )
    _, hist = run(cfg, quiet=True)
    # In-batch negatives carry popularity bias; convergence is slower on
    # this tiny setup — the gate is "well above random" (random ~ 0.078).
    assert hist[-1]["recall@20"] > 0.10, hist[-1]
    assert hist[-1]["loss"] < 4.2  # started near ln(128) ~ 4.85


def test_gmf_in_batch_and_mlp_raises():
    from tfrec_tpu.configs import ModelConfig
    from tfrec_tpu.models import DataSpec, build_model

    spec = DataSpec.interaction(10, 20)
    gmf = build_model(ModelConfig(name="gmf", gmf_dim=8), spec)
    params = gmf.init(jax.random.PRNGKey(0))
    batch = {"user": jnp.arange(4, dtype=jnp.int32),
             "pos": jnp.arange(4, dtype=jnp.int32)}
    ids = gmf.lookup_ids(batch)
    g = {k: jnp.take(params["tables"][k], v, axis=0) for k, v in ids.items()}
    scores = gmf.forward(params["dense"], g, batch)
    assert scores.shape == (4, 4)
    # consistency: diagonal == pointwise logits
    point = {"user": batch["user"], "item": batch["pos"],
             "label": jnp.zeros(4)}
    pids = gmf.lookup_ids(point)
    pg = {k: jnp.take(params["tables"][k], v, axis=0) for k, v in pids.items()}
    logits = gmf.forward(params["dense"], pg, point)
    np.testing.assert_allclose(np.asarray(jnp.diag(scores)), np.asarray(logits),
                               rtol=1e-5, atol=1e-6)

    mlp = build_model(ModelConfig(name="mlp", mlp_embed_dim=8, mlp_dims=(8,)), spec)
    mp = mlp.init(jax.random.PRNGKey(1))
    mids = mlp.lookup_ids(batch)
    mg = {k: jnp.take(mp["tables"][k], v, axis=0) for k, v in mids.items()}
    import pytest as _pytest
    with _pytest.raises(NotImplementedError, match="in_batch"):
        mlp.forward(mp["dense"], mg, batch)
