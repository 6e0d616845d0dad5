"""EASE: the one-shot closed-form solve must equal the textbook
B = I - P/diag(P) computed densely in numpy (zero diagonal included),
and the solved model must be a strong retrieval baseline end to end."""

import numpy as np
import pytest

from tfrec_tpu.configs import Config, DataConfig, MeshConfig, ModelConfig, TrainConfig
from tfrec_tpu.models import DataSpec, build_model
from tfrec_tpu.train.trainer import run

REG = 10.0


def test_solve_matches_numpy_oracle_and_zero_diagonal():
    from types import SimpleNamespace

    from tfrec_tpu.models.ease import EASETrainer

    rng = np.random.default_rng(0)
    nu, ni = 12, 9
    pairs = sorted(set(zip(rng.integers(0, nu, 40).tolist(),
                           rng.integers(0, ni, 40).tolist())))
    ds = SimpleNamespace(
        num_users=nu, num_items=ni,
        train=SimpleNamespace(
            users=np.array([p[0] for p in pairs], np.int32),
            items=np.array([p[1] for p in pairs], np.int32),
        ),
    )
    m = build_model(ModelConfig(name="ease", ease_reg=REG),
                    DataSpec.interaction(nu, ni))
    solver = EASETrainer(ds, m, REG)
    out = solver.epoch()

    x = np.zeros((nu, ni), np.float64)
    x[ds.train.users, ds.train.items] = 1.0
    p = np.linalg.inv(x.T @ x + REG * np.eye(ni))
    b_ref = np.eye(ni) - p / np.diag(p)[None, :]
    b = np.asarray(solver.b, np.float64)
    np.testing.assert_allclose(b, b_ref, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.diag(b), 0.0, atol=1e-6)
    loss_ref = np.sum((x - x @ b_ref) ** 2) + REG * np.sum(b_ref**2)
    np.testing.assert_allclose(out["loss"], loss_ref, rtol=1e-4)

    # score_all is exactly X @ B for the requested users.
    scores = np.asarray(
        m.score_all({"tables": dict(solver.tables()), "dense": {}},
                    np.arange(5, dtype=np.int32))
    )
    np.testing.assert_allclose(scores, (x @ b_ref)[:5], rtol=2e-4, atol=1e-5)


def test_ease_learns_above_random_and_coerces_loss():
    cfg = Config(
        data=DataConfig(source="synthetic_implicit", num_users=256,
                        num_items=512, interactions_per_user=24, seed=1),
        model=ModelConfig(name="ease", ease_reg=50.0),
        train=TrainConfig(batch_size=256, epochs=1, eval_every_epochs=1,
                          eval_topk=(20,), loss="bpr"),
        mesh=MeshConfig(data_axis_size=0),
    )
    t, hist = run(cfg, quiet=True)
    assert t.loss_name == "ease"
    # random recall@20 on 512 items ~ 0.039; item-item closed form is a
    # strong baseline on this co-occurrence-structured generator.
    assert hist[-1]["recall@20"] > 0.12, hist[-1]


def test_ease_refuses_large_catalogs():
    with pytest.raises(ValueError, match="max_items"):
        build_model(ModelConfig(name="ease"),
                    DataSpec.interaction(10, 50_000))


def test_ease_serve_predict_matches_catalog():
    from tfrec_tpu.serve import Recommender

    cfg = Config(
        data=DataConfig(source="synthetic_implicit", num_users=96,
                        num_items=200, interactions_per_user=10, seed=3),
        model=ModelConfig(name="ease", ease_reg=20.0),
        train=TrainConfig(batch_size=64, epochs=1, eval_every_epochs=0),
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


def test_ease_sampled_eval_protocol_works():
    """The sampled NCF protocol must work for EASE through the
    score_user_items fast path (review finding: the generic pointwise
    fallback cannot supply hist_x inside the evaluator's jit)."""
    cfg = Config(
        data=DataConfig(source="synthetic_implicit", num_users=96,
                        num_items=200, interactions_per_user=10, seed=3),
        model=ModelConfig(name="ease", ease_reg=20.0),
        train=TrainConfig(batch_size=64, epochs=1, eval_every_epochs=1,
                          eval_protocol="sampled", eval_num_candidates=50,
                          eval_topk=(10,)),
        mesh=MeshConfig(data_axis_size=0),
    )
    _, hist = run(cfg, quiet=True)
    assert "hr@10" in hist[-1], hist[-1]
    # random HR@10 over 51 candidates = 10/51 ~ 0.196; measured 0.41
    assert hist[-1]["hr@10"] > 0.30, hist[-1]
