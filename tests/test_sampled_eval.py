"""Sampled-candidate (NCF leave-one-out) evaluation protocol."""

import numpy as np

from tfrec_tpu.configs import (
    Config, DataConfig, MeshConfig, ModelConfig, OptimConfig, TrainConfig,
)
from tfrec_tpu.eval.sampled import SampledEvaluator, build_candidates
from tfrec_tpu.train.trainer import Trainer, run


def _trainer(**train_kw):
    kw = dict(batch_size=128, epochs=6, eval_every_epochs=0, loss="bpr")
    kw.update(train_kw)
    cfg = Config(
        data=DataConfig(source="synthetic_implicit", num_users=64, num_items=256,
                        interactions_per_user=12, splitter="leave_one_out", seed=0),
        model=ModelConfig(name="mf", embed_dim=16),
        optim=OptimConfig(learning_rate=0.05),
        train=TrainConfig(**kw),
        mesh=MeshConfig(data_axis_size=0),
    )
    t = Trainer(cfg, quiet=True)
    t.train()
    return t


def test_candidates_exclude_train_and_test():
    t = _trainer(epochs=1)
    data = build_candidates(t.dataset, num_candidates=50, seed=0)
    train_csr, test_csr = t.dataset.train_csr, t.dataset.test_csr
    for u, cands in zip(data["user"][:20], data["candidates"][:20]):
        tr = set(train_csr.indices[train_csr.indptr[u]:train_csr.indptr[u+1]].tolist())
        te = set(test_csr.indices[test_csr.indptr[u]:test_csr.indptr[u+1]].tolist())
        negs = set(cands[1:].tolist())
        assert not negs & (tr | te)
        assert cands[0] in te  # column 0 is the positive


def test_sampled_eval_matches_manual_ranks():
    t = _trainer()
    ev = SampledEvaluator(t.model, t.dataset, ks=(5, 10), num_candidates=20,
                          seed=1, user_batch=16)
    got = ev(t.params)
    # manual: score candidates with score_all and rank column 0
    scores_all = t.model.score_all(t.params, np.asarray(ev.users))
    scores_all = np.asarray(scores_all)
    cand_scores = np.take_along_axis(scores_all, ev.candidates, axis=1)
    rank = (cand_scores[:, 1:] > cand_scores[:, :1]).sum(axis=1)
    for k in (5, 10):
        hr = float((rank < k).mean())
        np.testing.assert_allclose(got[f"hr@{k}"], hr, atol=1e-6)
    # a trained model beats random (random hr@5 = 5/21)
    assert got["hr@5"] > 0.33, got  # random = 5/21 ~ 0.24


def test_trainer_sampled_protocol_end_to_end():
    cfg = Config(
        data=DataConfig(source="synthetic_implicit", num_users=64, num_items=256,
                        interactions_per_user=12, splitter="leave_one_out"),
        model=ModelConfig(name="neumf", gmf_dim=8, mlp_embed_dim=8, mlp_dims=(16, 8)),
        optim=OptimConfig(learning_rate=0.002, dense_optimizer="adam",
                          sparse_optimizer="rowwise_adam"),
        train=TrainConfig(batch_size=128, epochs=4, eval_every_epochs=4,
                          loss="logloss", num_negatives=4,
                          eval_protocol="sampled", eval_num_candidates=50,
                          eval_topk=(10,)),
        mesh=MeshConfig(data_axis_size=0),
    )
    _, hist = run(cfg, quiet=True)
    final = hist[-1]
    assert "hr@10" in final and "ndcg_sampled@10" in final
    assert final["hr@10"] > 10 / 51  # beats random