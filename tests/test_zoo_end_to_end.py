"""Every zoo model trains end-to-end and learns (loss decreases) — the
breadth gate complementing the focused integration tests."""

import numpy as np
import pytest

from tfrec_tpu.configs import (
    Config, DataConfig, MeshConfig, ModelConfig, OptimConfig, TrainConfig,
)
from tfrec_tpu.train.trainer import run

INTERACTION = [
    ModelConfig(name="pop"),
    ModelConfig(name="gmf", gmf_dim=8),
    ModelConfig(name="mlp", mlp_embed_dim=8, mlp_dims=(16, 8), dropout=0.2),
    ModelConfig(name="convncf", embed_dim=8, convncf_channels=8, dropout=0.1),
]
CTR = [
    ModelConfig(name="dcnv2", embed_dim=8, num_cross_layers=2, mlp_dims=(16,)),
    ModelConfig(name="dcnv2", embed_dim=8, num_cross_layers=2, cross_rank=4,
                mlp_dims=(16,)),
    ModelConfig(name="widedeep", embed_dim=8, mlp_dims=(16,)),
    ModelConfig(name="dlrm", embed_dim=8, mlp_dims=(16,)),
    ModelConfig(name="nfm", embed_dim=8, mlp_dims=(16,), dropout=0.1),
]


@pytest.mark.parametrize("mcfg", INTERACTION, ids=lambda m: m.name)
def test_interaction_zoo_trains(mcfg):
    cfg = Config(
        data=DataConfig(source="synthetic_implicit", num_users=64, num_items=128,
                        interactions_per_user=10, seed=0),
        model=mcfg,
        optim=OptimConfig(learning_rate=0.05),
        train=TrainConfig(batch_size=128, epochs=3, eval_every_epochs=0,
                          loss="bpr"),
        mesh=MeshConfig(data_axis_size=0),
    )
    _, hist = run(cfg, quiet=True)
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["loss"] < hist[0]["loss"], [h["loss"] for h in hist]


@pytest.mark.parametrize(
    "mcfg", CTR, ids=lambda m: f"{m.name}-r{m.cross_rank}" if m.name == "dcnv2" else m.name
)
def test_ctr_zoo_trains(mcfg):
    cfg = Config(
        data=DataConfig(source="synthetic_ctr", num_examples=8_000,
                        num_dense_features=4, categorical_vocab_sizes=(60, 40),
                        test_fraction=0.2, seed=1),
        model=mcfg,
        optim=OptimConfig(learning_rate=0.01, dense_optimizer="adam"),
        train=TrainConfig(batch_size=256, epochs=3, eval_every_epochs=0,
                          loss="logloss"),
        mesh=MeshConfig(data_axis_size=0),
    )
    _, hist = run(cfg, quiet=True)
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["loss"] < hist[0]["loss"], [h["loss"] for h in hist]