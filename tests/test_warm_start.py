"""Warm start (train.init_from): the reference family's pretraining
protocol — NeuMF seeds both towers from a factorization run, IRGAN/APR
seed from BPR-MF. Copies must be exact, mismatches loud, resume wins,
and an all-skip warm start must refuse."""

import dataclasses

import numpy as np
import pytest

from tfrec_tpu.configs import (
    Config, DataConfig, MeshConfig, ModelConfig, OptimConfig, TrainConfig,
)
from tfrec_tpu.train.trainer import Trainer, run

DATA = DataConfig(source="synthetic_implicit", num_users=96, num_items=200,
                  interactions_per_user=10, seed=3)


def _pretrain_mf(tmp_path, embed_dim=16, epochs=3):
    cfg = Config(
        data=DATA,
        model=ModelConfig(name="mf", embed_dim=embed_dim),
        optim=OptimConfig(learning_rate=0.05),
        train=TrainConfig(batch_size=64, epochs=epochs, eval_every_epochs=0,
                          checkpoint_dir=str(tmp_path / "mf_ckpt"),
                          checkpoint_every_epochs=epochs),
        mesh=MeshConfig(data_axis_size=0),
    )
    t, _ = run(cfg, quiet=True)
    return t, str(tmp_path / "mf_ckpt")


def test_warm_start_same_model_copies_exactly(tmp_path):
    t_src, ckpt = _pretrain_mf(tmp_path)
    cfg = Config(
        data=DATA,
        model=ModelConfig(name="mf", embed_dim=16),
        optim=OptimConfig(learning_rate=0.05),
        train=TrainConfig(batch_size=64, epochs=1, eval_every_epochs=0,
                          init_from=ckpt),
        mesh=MeshConfig(data_axis_size=0),
    )
    t = Trainer(cfg, quiet=True)
    for name in ("user_emb", "item_emb", "item_bias"):
        np.testing.assert_array_equal(
            np.asarray(t.state["tables"][name]),
            np.asarray(t_src.state["tables"][name]), err_msg=name,
        )


def test_irgan_warm_starts_both_players_from_mf(tmp_path):
    t_src, ckpt = _pretrain_mf(tmp_path)
    cfg = Config(
        data=DATA,
        model=ModelConfig(name="irgan", embed_dim=16),
        optim=OptimConfig(learning_rate=0.05),
        train=TrainConfig(batch_size=64, epochs=2, eval_every_epochs=2,
                          eval_topk=(20,), num_negatives=8,
                          init_from=ckpt, loss="irgan"),
        mesh=MeshConfig(data_axis_size=0),
    )
    t = Trainer(cfg, quiet=True)
    src = np.asarray(t_src.state["tables"]["user_emb"])
    for name in ("user_g", "user_d"):
        np.testing.assert_array_equal(np.asarray(t.state["tables"][name]), src)
    for name in ("bias_g", "bias_d"):
        np.testing.assert_array_equal(
            np.asarray(t.state["tables"][name]),
            np.asarray(t_src.state["tables"]["item_bias"]),
        )
    hist = t.train()  # the warm-started game still trains end to end
    assert np.isfinite(hist[-1]["loss"])


def test_neumf_warm_start_copies_matching_tower_dims(tmp_path):
    _, ckpt = _pretrain_mf(tmp_path, embed_dim=16)
    cfg = Config(
        data=DATA,
        # gmf_dim matches the pretrained d=16; mlp tower (d=8) must skip.
        model=ModelConfig(name="neumf", gmf_dim=16, mlp_embed_dim=8,
                          mlp_dims=(16,)),
        optim=OptimConfig(learning_rate=0.01),
        train=TrainConfig(batch_size=64, epochs=1, eval_every_epochs=0,
                          init_from=ckpt, loss="logloss"),
        mesh=MeshConfig(data_axis_size=0),
    )
    t = Trainer(cfg, quiet=True)
    from tfrec_tpu.utils.checkpoint import load_table_arrays

    src = load_table_arrays(ckpt)
    np.testing.assert_array_equal(
        np.asarray(t.state["tables"]["user_gmf"]), src["user_emb"]
    )
    # mlp tower dims differ -> kept at fresh init (not the source values)
    assert t.state["tables"]["user_mlp"].shape == (96, 8)


def test_warm_start_refuses_when_nothing_matches(tmp_path):
    _, ckpt = _pretrain_mf(tmp_path, embed_dim=16)
    cfg = Config(
        data=DATA,
        model=ModelConfig(name="gmf", gmf_dim=8),  # d mismatch; bias absent
        optim=OptimConfig(learning_rate=0.05),
        train=TrainConfig(batch_size=64, epochs=1, eval_every_epochs=0,
                          init_from=ckpt),
        mesh=MeshConfig(data_axis_size=0),
    )
    with pytest.raises(ValueError, match="copied no tables"):
        Trainer(cfg, quiet=True)


def test_resume_wins_over_init_from(tmp_path):
    t_src, ckpt = _pretrain_mf(tmp_path)
    own_dir = str(tmp_path / "own")
    cfg = Config(
        data=DATA,
        model=ModelConfig(name="mf", embed_dim=16),
        optim=OptimConfig(learning_rate=0.05),
        train=TrainConfig(batch_size=64, epochs=2, eval_every_epochs=0,
                          checkpoint_dir=own_dir, checkpoint_every_epochs=1),
        mesh=MeshConfig(data_axis_size=0),
    )
    t1, _ = run(cfg, quiet=True)
    resumed = Trainer(
        dataclasses.replace(
            cfg,
            train=dataclasses.replace(cfg.train, resume=True, init_from=ckpt),
        ),
        quiet=True,
    )
    assert resumed.start_epoch == 2
    np.testing.assert_array_equal(  # own checkpoint, NOT the mf source
        np.asarray(resumed.state["tables"]["user_emb"]),
        np.asarray(t1.state["tables"]["user_emb"]),
    )


def _pretrain_ctr(tmp_path, permute=False, epochs=2):
    cfg = Config(
        data=DataConfig(source="synthetic_ctr", num_examples=4000,
                        num_dense_features=2,
                        categorical_vocab_sizes=(60, 40), test_fraction=0.1,
                        seed=5),
        model=ModelConfig(name="dcn", embed_dim=8, num_cross_layers=1,
                          mlp_dims=(8,), lane_pack=False),
        optim=OptimConfig(learning_rate=0.01),
        train=TrainConfig(batch_size=128, epochs=epochs, eval_every_epochs=0,
                          loss="logloss", log_every_steps=0,
                          checkpoint_dir=str(tmp_path / "src_ckpt"),
                          checkpoint_every_epochs=epochs),
        mesh=MeshConfig(table_sharding="row", row_permute=permute),
    )
    t, _ = run(cfg, quiet=True)
    return t, str(tmp_path / "src_ckpt")


def test_warm_start_into_row_permuted_run_maps_logical_rows(tmp_path):
    """Destination run uses mesh.row_permute: the copied source rows must
    land at their PHYSICAL homes so the logical view equals the source."""
    t_src, ckpt = _pretrain_ctr(tmp_path, permute=False)
    cfg = Config(
        data=dataclasses.replace(DATA),
        model=ModelConfig(name="dcn", embed_dim=8, num_cross_layers=1,
                          mlp_dims=(8,), lane_pack=False),
        optim=OptimConfig(learning_rate=0.01),
        train=TrainConfig(batch_size=128, epochs=1, eval_every_epochs=0,
                          loss="logloss", log_every_steps=0, init_from=ckpt),
        mesh=MeshConfig(table_sharding="row", row_permute=True),
    )
    cfg = dataclasses.replace(
        cfg,
        data=DataConfig(source="synthetic_ctr", num_examples=4000,
                        num_dense_features=2,
                        categorical_vocab_sizes=(60, 40), test_fraction=0.1,
                        seed=5),
    )
    t = Trainer(cfg, quiet=True)
    src_logical = t_src.builder.unpadded_tables(t_src.state)
    dst_logical = t.builder.unpadded_tables(t.state)
    for name in ("field_0", "field_1"):
        np.testing.assert_array_equal(
            np.asarray(dst_logical[name]), np.asarray(src_logical[name]),
            err_msg=name,
        )


def test_warm_start_refuses_row_permuted_source(tmp_path):
    _, ckpt = _pretrain_ctr(tmp_path, permute=True)
    cfg = Config(
        data=DataConfig(source="synthetic_ctr", num_examples=4000,
                        num_dense_features=2,
                        categorical_vocab_sizes=(60, 40), test_fraction=0.1,
                        seed=5),
        model=ModelConfig(name="dcn", embed_dim=8, num_cross_layers=1,
                          mlp_dims=(8,), lane_pack=False),
        optim=OptimConfig(learning_rate=0.01),
        train=TrainConfig(batch_size=128, epochs=1, eval_every_epochs=0,
                          loss="logloss", log_every_steps=0, init_from=ckpt),
        mesh=MeshConfig(table_sharding="row"),
    )
    with pytest.raises(ValueError, match="row_permute"):
        Trainer(cfg, quiet=True)
