"""Multi-hot (embedding-bag) field support through the CTR stack."""

import jax
import jax.numpy as jnp
import numpy as np

from tfrec_tpu.configs import (
    Config, DataConfig, MeshConfig, ModelConfig, OptimConfig, TrainConfig,
)
from tfrec_tpu.models import DataSpec, build_model
from tfrec_tpu.train.trainer import run

VOCABS, WIDTHS, ND, B = (13, 7), (3, 1), 2, 6


def _model_and_batch(seed=0):
    rng = np.random.default_rng(seed)
    # lane_pack=False: these unit tests inspect the per-field table
    # layout by name (the default is auto-packing; test_lane_pack covers
    # the packed layout's bag/sentinel behavior).
    model = build_model(
        ModelConfig(name="fm", embed_dim=4, lane_pack=False),
        DataSpec.ctr(VOCABS, ND, field_widths=WIDTHS),
    )
    params = model.init(jax.random.PRNGKey(0))
    # field 0 bags: 2 valid ids + 1 sentinel pad per row
    bag = np.stack([
        rng.integers(0, VOCABS[0], B),
        rng.integers(0, VOCABS[0], B),
        np.full(B, VOCABS[0]),
    ], axis=1)
    single = rng.integers(0, VOCABS[1], B)[:, None]
    batch = {
        "dense": jnp.asarray(rng.normal(size=(B, ND)).astype(np.float32)),
        "cat": jnp.asarray(np.concatenate([bag, single], 1).astype(np.int32)),
        "label": jnp.asarray(rng.integers(0, 2, B).astype(np.float32)),
    }
    return model, params, batch


def test_bag_mean_combiner_matches_manual():
    model, params, batch = _model_and_batch()
    ids = model.lookup_ids(batch)
    assert ids["field_0"].shape == (B * 3,)
    g = {k: jnp.take(params["tables"][k], v, axis=0) for k, v in ids.items()}
    stack = model.field_stack(g, batch)
    assert stack.shape == (B, 2, 4)
    table0 = np.asarray(params["tables"]["field_0"])
    cat = np.asarray(batch["cat"])
    for b in range(B):
        valid = [i for i in cat[b, :3] if i < VOCABS[0]]
        want = table0[valid].mean(0)
        np.testing.assert_allclose(np.asarray(stack[b, 0]), want, rtol=1e-5)


def test_bag_sentinel_rows_get_no_gradient():
    model, params, batch = _model_and_batch()
    ids = model.lookup_ids(batch)
    g = {k: jnp.take(params["tables"][k], v, axis=0) for k, v in ids.items()}

    def loss(gath):
        return jnp.sum(model.forward(params["dense"], gath, batch) ** 2)

    grads = jax.grad(loss)(g)
    # rows that came from sentinel positions must have zero grad
    flat_ids = np.asarray(ids["field_0"])
    gnorm = np.abs(np.asarray(grads["field_0"])).sum(axis=1)
    assert np.all(gnorm[flat_ids >= VOCABS[0]] == 0.0)
    assert gnorm[flat_ids < VOCABS[0]].sum() > 0


def test_multihot_trains_end_to_end():
    cfg = Config(
        data=DataConfig(
            source="synthetic_ctr", num_examples=20_000, num_dense_features=4,
            categorical_vocab_sizes=(60, 40), categorical_field_widths=(4, 1),
            test_fraction=0.2, seed=3,
        ),
        model=ModelConfig(name="deepfm", embed_dim=8, mlp_dims=(16,)),
        optim=OptimConfig(learning_rate=0.02, dense_optimizer="adagrad"),
        train=TrainConfig(batch_size=500, epochs=5, eval_every_epochs=5,
                          loss="logloss"),
        mesh=MeshConfig(data_axis_size=0),
    )
    _, hist = run(cfg, quiet=True)
    assert hist[-1]["auc"] > 0.6, hist[-1]


def test_multihot_sharded_path():
    """Bag lookups ride the all-to-all path unchanged (flat sentinel ids)."""
    cfg = Config(
        data=DataConfig(
            source="synthetic_ctr", num_examples=4_000, num_dense_features=2,
            categorical_vocab_sizes=(64, 32), categorical_field_widths=(3, 1),
            test_fraction=0.25, seed=4,
        ),
        model=ModelConfig(name="fm", embed_dim=8),
        optim=OptimConfig(learning_rate=0.05),
        train=TrainConfig(batch_size=256, epochs=2, eval_every_epochs=2,
                          loss="logloss"),
    )
    trainer, hist = run(cfg, quiet=True)
    assert trainer.mesh is not None  # 8 virtual devices -> sharded
    assert np.isfinite(hist[-1]["loss"])

def test_mixed_field_dims_dcn_trains_and_fm_rejects():
    """Per-field embedding dims: concat towers accept them; stacked
    interactions reject with a clear error."""
    import pytest

    cfg = Config(
        data=DataConfig(source="synthetic_ctr", num_examples=6000,
                        num_dense_features=3, categorical_vocab_sizes=(100, 40, 10),
                        test_fraction=0.2, seed=6),
        model=ModelConfig(name="dcn", embed_dim=8, field_dims=(16, 8, 4),
                          num_cross_layers=2, mlp_dims=(16,)),
        optim=OptimConfig(learning_rate=0.01),
        train=TrainConfig(batch_size=256, epochs=2, eval_every_epochs=2,
                          loss="logloss"),
        mesh=MeshConfig(data_axis_size=0),
    )
    trainer, hist = run(cfg, quiet=True)
    assert np.isfinite(hist[-1]["loss"])
    # tables really have per-field dims
    shapes = {k: v.shape for k, v in trainer.state["tables"].items()}
    assert shapes["field_0"][1] == 16 and shapes["field_2"][1] == 4

    with pytest.raises(ValueError, match="equal field dims"):
        run(cfg.replace(model=ModelConfig(name="fm", embed_dim=8,
                                          field_dims=(16, 8, 4))), quiet=True)


def test_mixed_dims_sharded_path():
    """Mixed per-field dims ride the row-sharded a2a path (per-table plans)."""
    cfg = Config(
        data=DataConfig(source="synthetic_ctr", num_examples=4000,
                        num_dense_features=2, categorical_vocab_sizes=(64, 16),
                        test_fraction=0.25, seed=7),
        model=ModelConfig(name="widedeep", embed_dim=8, field_dims=(16, 4),
                          mlp_dims=(16,)),
        optim=OptimConfig(learning_rate=0.02),
        train=TrainConfig(batch_size=256, epochs=2, eval_every_epochs=2,
                          loss="logloss"),
    )
    trainer, hist = run(cfg, quiet=True)
    assert trainer.mesh is not None
    assert np.isfinite(hist[-1]["loss"])
