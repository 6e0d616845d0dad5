"""Integration tests — the CI gate (SURVEY.md §4 "Integration" row).

Config-1 stand-in: MF+BPR on seeded synthetic implicit feedback must reach
recall@20 well above the random baseline in under a minute on CPU. Plus a
tiny-FM separable-CTR AUC gate and a checkpoint/resume roundtrip.
"""

import dataclasses
import os

import jax
import numpy as np
import pytest

from tfrec_tpu.configs import Config, DataConfig, ModelConfig, OptimConfig, TrainConfig
from tfrec_tpu.train.trainer import Trainer, run
from tfrec_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint


def _mf_config(**train_kw):
    defaults = dict(
        batch_size=256, epochs=8, eval_every_epochs=8, eval_topk=(20,), loss="bpr",
        log_every_steps=10,
    )
    defaults.update(train_kw)
    return Config(
        data=DataConfig(
            source="synthetic_implicit", num_users=128, num_items=256,
            interactions_per_user=16, seed=0,
        ),
        model=ModelConfig(name="mf", embed_dim=16),
        optim=OptimConfig(learning_rate=0.05, sparse_optimizer="rowwise_adagrad"),
        train=TrainConfig(**defaults),
    )


def test_mf_bpr_learns_above_random():
    _, hist = run(_mf_config(), quiet=True)
    final = hist[-1]
    # Random ranking on 256 items with ~3 test items/user: recall@20 ~ 0.078.
    assert final["recall@20"] > 0.18, final
    assert final["loss"] < 0.6, final


def test_fm_ctr_auc_on_separable_data():
    cfg = Config(
        data=DataConfig(
            source="synthetic_ctr", num_examples=20_000, num_dense_features=4,
            categorical_vocab_sizes=(50, 50), test_fraction=0.2, seed=1,
        ),
        model=ModelConfig(name="fm", embed_dim=8),
        optim=OptimConfig(learning_rate=0.02, dense_optimizer="adagrad",
                          sparse_optimizer="rowwise_adagrad"),
        train=TrainConfig(batch_size=512, epochs=6, eval_every_epochs=6, loss="logloss"),
    )
    _, hist = run(cfg, quiet=True)
    assert hist[-1]["auc"] > 0.62, hist[-1]


def test_checkpoint_roundtrip(tmp_path):
    trainer = Trainer(_mf_config(epochs=1, eval_every_epochs=0), quiet=True)
    trainer.train()
    save_checkpoint(str(tmp_path), 1, trainer.state)
    restored = restore_checkpoint(str(tmp_path), trainer.state)
    for a, b in zip(
        jax.tree_util.tree_leaves(trainer.state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert os.path.isdir(tmp_path / "step_0000000001")


def test_resume_continues_from_checkpoint(tmp_path):
    cfg = _mf_config(epochs=2, eval_every_epochs=0, checkpoint_dir=str(tmp_path),
                     checkpoint_every_epochs=1)
    t1 = Trainer(cfg, quiet=True)
    t1.train()
    cfg_resume = cfg.replace(train=dataclasses.replace(cfg.train, resume=True))
    t3 = Trainer(cfg_resume, quiet=True)
    assert t3.start_epoch == 2
    for a, b in zip(
        jax.tree_util.tree_leaves(t1.state), jax.tree_util.tree_leaves(t3.state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multi_step_dispatch_matches_single_step():
    """steps_per_dispatch=3 (lax.scan on device) == 3 single steps.

    This config yields 6 batches/epoch; K must divide it (the grouper
    drops trailing partial groups), hence K=3."""
    base = _mf_config(epochs=2, eval_every_epochs=2)
    t1 = Trainer(base, quiet=True)
    h1 = t1.train()
    multi = base.replace(
        train=dataclasses.replace(base.train, steps_per_dispatch=3)
    )
    t2 = Trainer(multi, quiet=True)
    h2 = t2.train()
    # identical data order + rng -> identical final tables
    import jax as _jax

    for a, b in zip(
        _jax.tree_util.tree_leaves(t1.state["tables"]),
        _jax.tree_util.tree_leaves(t2.state["tables"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)
    assert abs(h1[-1]["recall@20"] - h2[-1]["recall@20"]) < 0.05


def test_checkpoint_overwrite_same_step(tmp_path):
    """Saving the same step twice must replace, not silently keep stale."""
    trainer = Trainer(_mf_config(epochs=1, eval_every_epochs=0), quiet=True)
    trainer.train()
    save_checkpoint(str(tmp_path), 7, trainer.state)
    # mutate and save again at the SAME step
    trainer.state["tables"]["user_emb"] = trainer.state["tables"]["user_emb"] + 1.0
    save_checkpoint(str(tmp_path), 7, trainer.state)
    restored = restore_checkpoint(str(tmp_path), trainer.state)
    np.testing.assert_array_equal(
        np.asarray(restored["tables"]["user_emb"]),
        np.asarray(trainer.state["tables"]["user_emb"]),
    )
    # no stranded .tmp dirs
    assert not [d for d in os.listdir(tmp_path) if d.endswith(".tmp")]


def test_device_negative_sampling_learns():
    """device_negatives=True: host pipeline ships (user, pos) only; the
    jitted step draws negatives — learning must still be well above random."""
    cfg = _mf_config(epochs=8, eval_every_epochs=8)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, device_negatives=True))
    trainer = Trainer(cfg, quiet=True)
    hist = trainer.train()
    assert hist[-1]["recall@20"] > 0.18, hist[-1]
    # the host sampler really did skip negative generation
    batch = next(iter(trainer.sampler.epoch(0)))
    assert "neg" not in batch and "negs" not in batch


def test_orbax_checkpoint_backend(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from tfrec_tpu.utils.checkpoint import (
        restore_checkpoint_orbax, save_checkpoint_orbax,
    )

    trainer = Trainer(_mf_config(epochs=1, eval_every_epochs=0), quiet=True)
    trainer.train()
    save_checkpoint_orbax(str(tmp_path), 3, trainer.state)
    restored = restore_checkpoint_orbax(str(tmp_path), trainer.state, 3)
    for a, b in zip(
        jax.tree_util.tree_leaves(trainer.state),
        jax.tree_util.tree_leaves(restored),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_final_epoch_always_evaluated():
    """epochs=3 with eval_every_epochs=2: the last epoch still gets eval
    metrics (a final state without metrics surprised users)."""
    cfg = _mf_config(epochs=3, eval_every_epochs=2)
    _, hist = run(cfg)
    assert "recall@20" in hist[-1], hist[-1]
    assert "recall@20" in hist[1]      # the regular cadence point
    assert "recall@20" not in hist[0]  # off-cadence epoch stays cheap


def test_early_stopping_stops_on_plateau_and_not_on_progress():
    """lr=0 makes every eval identical: the monitor never improves after
    the first eval, so training stops after `patience` more evals. A
    normally-improving run with the same patience reaches full length."""
    from tfrec_tpu.configs import (
        Config, DataConfig, MeshConfig, ModelConfig, OptimConfig, TrainConfig,
    )
    from tfrec_tpu.train.trainer import run

    base = dict(
        data=DataConfig(source="synthetic_implicit", num_users=96,
                        num_items=200, interactions_per_user=10, seed=3),
        model=ModelConfig(name="mf", embed_dim=16),
        mesh=MeshConfig(data_axis_size=0),
    )
    frozen = Config(
        optim=OptimConfig(learning_rate=0.0,
                          sparse_learning_rate=0.0),
        train=TrainConfig(batch_size=64, epochs=12, eval_every_epochs=1,
                          eval_topk=(10, 20), early_stop_patience=2),
        **base,
    )
    t, hist = run(frozen, quiet=True)
    # eval 0 sets best; evals 1..2 stall -> stop after epoch 2 of 12.
    assert len(hist) == 3, [h["epoch"] for h in hist]
    assert t._es_stall == 2

    improving = Config(
        optim=OptimConfig(learning_rate=0.05),
        train=TrainConfig(batch_size=64, epochs=6, eval_every_epochs=1,
                          eval_topk=(10, 20), early_stop_patience=3),
        **base,
    )
    _, hist2 = run(improving, quiet=True)
    assert len(hist2) == 6, [h["epoch"] for h in hist2]

    # Explicit minimize-metric monitor: logloss on a CTR run.
    ctr = Config(
        data=DataConfig(source="synthetic_ctr", num_examples=6000,
                        num_dense_features=3, categorical_vocab_sizes=(40, 30),
                        test_fraction=0.25, seed=5),
        model=ModelConfig(name="dcn", embed_dim=8, num_cross_layers=2,
                          mlp_dims=(16,)),
        optim=OptimConfig(learning_rate=0.0),
        train=TrainConfig(batch_size=256, epochs=8, eval_every_epochs=1,
                          loss="logloss", early_stop_patience=2,
                          early_stop_metric="logloss"),
        mesh=MeshConfig(data_axis_size=0),
    )
    _, hist3 = run(ctr, quiet=True)
    assert len(hist3) == 3, [h["epoch"] for h in hist3]


def test_early_stopping_refuses_unknown_monitor():
    """A misspelled early_stop_metric must raise at the first eval, not
    silently disable the patience knob (review finding)."""
    import pytest

    from tfrec_tpu.configs import (
        Config, DataConfig, MeshConfig, ModelConfig, OptimConfig, TrainConfig,
    )
    from tfrec_tpu.train.trainer import run

    cfg = Config(
        data=DataConfig(source="synthetic_implicit", num_users=64,
                        num_items=128, interactions_per_user=8, seed=0),
        model=ModelConfig(name="mf", embed_dim=8),
        optim=OptimConfig(learning_rate=0.05),
        train=TrainConfig(batch_size=64, epochs=2, eval_every_epochs=1,
                          eval_topk=(10,), early_stop_patience=1,
                          early_stop_metric="recal@10"),  # typo on purpose
        mesh=MeshConfig(data_axis_size=0),
    )
    with pytest.raises(ValueError, match="recal@10"):
        run(cfg, quiet=True)


def test_save_checkpoint_cleans_stale_tmp(tmp_path):
    """A crashed prior save leaves step_N.tmp with foreign block files; a
    fresh save of the same step must NOT publish them (review finding,
    round 4: stale per-process blocks from a different topology were
    merged into the final checkpoint and silently corrupted
    cross-topology restores)."""
    import os

    import jax.numpy as jnp

    from tfrec_tpu.utils.checkpoint import save_checkpoint

    state = {"tables": {"t": jnp.zeros((4, 2))}, "step": jnp.zeros((), jnp.int32)}
    tmp = tmp_path / "ck" / "step_0000000007.tmp"
    tmp.mkdir(parents=True)
    (tmp / "tables__t.p5.npy").write_bytes(b"stale")
    (tmp / "blocks.p5.json").write_text("{}")
    save_checkpoint(str(tmp_path / "ck"), 7, state)
    out = tmp_path / "ck" / "step_0000000007"
    assert out.is_dir()
    names = {p.name for p in out.iterdir()}
    assert "tables__t.p5.npy" not in names, names
    assert "blocks.p5.json" not in names, names
    assert "tables__t.p0.npy" in names, names
