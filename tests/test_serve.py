"""Serving surface (predict / recommend), Pop baseline, explicit-rating MSE."""

import numpy as np
import pytest

from tfrec_tpu.configs import (
    Config, DataConfig, MeshConfig, ModelConfig, OptimConfig, TrainConfig,
)
from tfrec_tpu.serve import Recommender
from tfrec_tpu.train.trainer import Trainer


def _trained_trainer(model_cfg=None, loss="bpr", epochs=4, **train_kw):
    cfg = Config(
        data=DataConfig(source="synthetic_implicit", num_users=96, num_items=200,
                        interactions_per_user=12, seed=0),
        model=model_cfg or ModelConfig(name="mf", embed_dim=16),
        optim=OptimConfig(learning_rate=0.05),
        train=TrainConfig(batch_size=256, epochs=epochs, eval_every_epochs=0,
                          loss=loss, **train_kw),
        mesh=MeshConfig(data_axis_size=0),
    )
    t = Trainer(cfg, quiet=True)
    t.train()
    return t


def test_predict_matches_score_catalog():
    t = _trained_trainer()
    rec = Recommender.from_trainer(t)
    users = np.array([1, 5, 9], np.int32)
    items = np.array([3, 7, 100], np.int32)
    point = rec.predict(users, items)
    catalog = rec.score_catalog(users)
    np.testing.assert_allclose(
        point, catalog[np.arange(3), items], rtol=1e-5, atol=1e-6
    )


def test_recommend_excludes_train_items():
    t = _trained_trainer()
    rec = Recommender.from_trainer(t)
    users = np.arange(16, dtype=np.int32)
    ids, vals = rec.recommend(users, k=20, exclude_train=True)
    assert ids.shape == (16, 20) and vals.shape == (16, 20)
    csr = t.dataset.train_csr
    for r, u in enumerate(users):
        train_items = set(csr.indices[csr.indptr[u]:csr.indptr[u + 1]].tolist())
        assert not train_items & set(ids[r].tolist())
    # scores sorted descending
    assert np.all(np.diff(vals, axis=1) <= 1e-6)


def test_pop_baseline_learns_popularity():
    t = _trained_trainer(ModelConfig(name="pop"), epochs=6)
    rec = Recommender.from_trainer(t)
    scores = rec.score_catalog(np.array([0], np.int32))[0]
    # learned score should correlate with empirical train popularity
    pop = np.asarray(t.dataset.train_csr.sum(axis=0)).ravel()
    corr = np.corrcoef(scores, pop)[0, 1]
    assert corr > 0.5, corr


def test_explicit_rating_mse_training():
    cfg = Config(
        data=DataConfig(source="synthetic_implicit", num_users=64, num_items=128,
                        interactions_per_user=10, seed=1),
        model=ModelConfig(name="mf", embed_dim=8),
        optim=OptimConfig(learning_rate=0.05),
        train=TrainConfig(batch_size=128, epochs=3, eval_every_epochs=0,
                          loss="mse", num_negatives=1),
        mesh=MeshConfig(data_axis_size=0),
    )
    t = Trainer(cfg, quiet=True)
    hist = t.train()
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["loss"] < hist[0]["loss"]

def test_quantized_serving_preserves_topk():
    import jax.numpy as jnp

    from tfrec_tpu.ops.quantize import dequantize_rows, quantize_table

    t = _trained_trainer(epochs=6)
    rec_fp = Recommender.from_trainer(t)
    rec_q = Recommender(t.model, t.params, dataset=t.dataset, quantize=True)
    users = np.arange(24, dtype=np.int32)
    ids_fp, _ = rec_fp.recommend(users, k=10)
    ids_q, _ = rec_q.recommend(users, k=10)
    # rounding may permute near-ties; require strong top-10 overlap
    overlap = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10.0
        for a, b in zip(ids_fp, ids_q)
    ])
    assert overlap > 0.85, overlap

    # quantization round-trip error bounded by the per-row step size
    table = t.params["tables"]["item_emb"]
    qt = quantize_table(table)
    assert qt.values.dtype == jnp.int8
    back = dequantize_rows(qt, jnp.arange(table.shape[0]))
    err = np.abs(np.asarray(back) - np.asarray(table))
    step = np.asarray(qt.scales)[:, None]
    assert np.all(err <= step * 0.5 + 1e-6)


def test_predict_ctr_matches_training_forward():
    from tfrec_tpu.configs import DataConfig
    from tfrec_tpu.train.trainer import run as _run

    cfg = Config(
        data=DataConfig(source="synthetic_ctr", num_examples=4000,
                        num_dense_features=3, categorical_vocab_sizes=(40, 30),
                        test_fraction=0.25, seed=5),
        model=ModelConfig(name="dcn", embed_dim=8, num_cross_layers=2,
                          mlp_dims=(16,)),
        optim=OptimConfig(learning_rate=0.01),
        train=TrainConfig(batch_size=256, epochs=1, eval_every_epochs=0,
                          loss="logloss"),
        mesh=MeshConfig(data_axis_size=0),
    )
    t, _ = _run(cfg, quiet=True)
    rec = Recommender.from_trainer(t)
    dense, cat, label = t.ctr_arrays["test"]
    got = rec.predict_ctr(dense[:64], cat[:64])
    assert got.shape == (64,)
    # agrees with the trainer's own forward path
    want = np.asarray(
        t._forward_fn()(t.state, {
            "dense": dense[:64], "cat": cat[:64],
            "label": np.zeros(64, np.float32),
        })[0]
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_quantize_rejects_non_mf_models():
    import pytest

    t = _trained_trainer(ModelConfig(name="gmf", gmf_dim=8), loss="bpr", epochs=1)
    with pytest.raises(ValueError, match="MF dot-product"):
        Recommender(t.model, t.params, dataset=t.dataset, quantize=True)


@pytest.mark.parametrize(
    "name,extra",
    [
        ("sasrec", dict(max_history=12, sasrec_blocks=1)),
        ("gru4rec", dict(max_history=12, gru_hidden=20)),
        ("caser", dict(max_history=12, caser_h_filters=4,
                       caser_heights=(2,), caser_v_filters=2)),
        ("fpmc", dict(max_history=12)),
        ("lightgcn", dict(lightgcn_layers=2)),
        ("ngcf", dict(lightgcn_layers=2, dropout=0.0)),
        ("sbpr", {}),
        ("irgan", {}),
        ("wrmf", {}),
    ],
)
def test_new_families_serve_pointwise_matches_catalog(name, extra):
    """serve.Recommender's predict() (the reference predict(u, i)
    surface) must agree with score_catalog cells for the sequential /
    graph / social families — the sequential base encodes the attached
    ordered history for pointwise scoring."""
    from tfrec_tpu.train.trainer import run

    cfg = Config(
        data=DataConfig(source="synthetic_implicit", num_users=96,
                        num_items=200, interactions_per_user=10, seed=3,
                        social_degree=(5 if name == "sbpr" else 0)),
        model=ModelConfig(name=name, embed_dim=16, **extra),
        optim=OptimConfig(learning_rate=0.03),
        train=TrainConfig(batch_size=64, epochs=2, eval_every_epochs=0),
        mesh=MeshConfig(data_axis_size=0),
    )
    t, _ = run(cfg, quiet=True)
    r = Recommender(t.model, t.params, dataset=t.dataset)
    ids, scores = r.recommend(np.asarray([0, 5, 9], np.int32), k=5)
    assert ids.shape == (3, 5)
    pt = r.predict(np.asarray([0, 5], np.int32), np.asarray([3, 7], np.int32))
    cat = r.score_catalog(np.asarray([0, 5], np.int32))
    np.testing.assert_allclose(
        np.asarray(pt), np.asarray(cat)[np.arange(2), [3, 7]],
        rtol=2e-4, atol=1e-5,
    )


def test_from_checkpoint_cold_start_serving(tmp_path):
    """Deploy path: rebuild + restore from disk with no training run;
    recommendations must match the live trainer's, and missing
    checkpoints must refuse loudly (never serve random tables)."""
    import dataclasses

    from tfrec_tpu.train.trainer import run

    cfg = Config(
        data=DataConfig(source="synthetic_implicit", num_users=96,
                        num_items=200, interactions_per_user=10, seed=3),
        model=ModelConfig(name="mf", embed_dim=16),
        optim=OptimConfig(learning_rate=0.05),
        train=TrainConfig(batch_size=64, epochs=3, eval_every_epochs=0,
                          checkpoint_dir=str(tmp_path / "ckpt"),
                          checkpoint_every_epochs=1),
        mesh=MeshConfig(data_axis_size=0),
    )
    t, _ = run(cfg, quiet=True)
    live = Recommender.from_trainer(t)
    cold = Recommender.from_checkpoint(cfg)
    # Deploy constructions must not append to the training run's metric
    # stream (a second run_config would corrupt it for log consumers).
    import json as _json

    stream = [
        _json.loads(l)
        for l in open(f"{cfg.train.checkpoint_dir}/{cfg.run_name}.metrics.jsonl")
    ]
    assert sum(r.get("event") == "run_config" for r in stream) == 1
    users = np.asarray([0, 5, 9], np.int32)
    ids_live, sc_live = live.recommend(users, k=5)
    ids_cold, sc_cold = cold.recommend(users, k=5)
    np.testing.assert_array_equal(ids_cold, ids_live)
    np.testing.assert_allclose(sc_cold, sc_live, rtol=1e-6)

    with pytest.raises(ValueError, match="no checkpoint found"):
        Recommender.from_checkpoint(cfg, checkpoint_dir=str(tmp_path / "empty"))
    with pytest.raises(ValueError, match="needs a checkpoint_dir"):
        Recommender.from_checkpoint(
            dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train, checkpoint_dir=None)
            )
        )

    # Closed-form family roundtrip (solver.load path): EASE.
    cfg_e = dataclasses.replace(
        cfg,
        model=ModelConfig(name="ease", ease_reg=20.0),
        train=TrainConfig(batch_size=64, epochs=1, eval_every_epochs=0,
                          checkpoint_dir=str(tmp_path / "ckpt_ease"),
                          checkpoint_every_epochs=1),
    )
    te, _ = run(cfg_e, quiet=True)
    live_e = Recommender.from_trainer(te)
    cold_e = Recommender.from_checkpoint(cfg_e)
    np.testing.assert_allclose(
        cold_e.score_catalog(users), live_e.score_catalog(users), rtol=1e-6
    )


def test_serve_ctr_from_row_permuted_trainer_matches_unpermuted():
    """mesh.row_permute stores tables physically permuted; serving must
    still score with LOGICAL ids — predict_ctr from a permuted trainer
    equals the unpermuted run bitwise (identical seeds/layout-invariant
    init/training)."""
    import numpy as np

    from tfrec_tpu.configs import (
        Config, DataConfig, MeshConfig, ModelConfig, OptimConfig, TrainConfig,
    )
    from tfrec_tpu.serve import Recommender
    from tfrec_tpu.train.trainer import run

    outs = {}
    for permute in (False, True):
        cfg = Config(
            data=DataConfig(source="synthetic_ctr", num_examples=4000,
                            num_dense_features=2,
                            categorical_vocab_sizes=(60, 40),
                            test_fraction=0.1, seed=5),
            model=ModelConfig(name="dcn", embed_dim=8, num_cross_layers=1,
                              mlp_dims=(8,), lane_pack=False),
            optim=OptimConfig(learning_rate=0.01),
            train=TrainConfig(batch_size=128, epochs=1, eval_every_epochs=0,
                              loss="logloss", log_every_steps=0),
            mesh=MeshConfig(table_sharding="row", a2a_dtype="float32",
                            row_permute=permute),
        )
        trainer, _ = run(cfg, quiet=True)
        rec = Recommender.from_trainer(trainer)
        rng = np.random.default_rng(0)
        dense = rng.normal(size=(16, 2)).astype(np.float32)
        cat = np.stack([rng.integers(0, 60, 16), rng.integers(0, 40, 16)],
                       axis=1).astype(np.int32)
        outs[permute] = rec.predict_ctr(dense, cat)
    np.testing.assert_array_equal(outs[False], outs[True])
