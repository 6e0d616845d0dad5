"""Zoo configs construct, override, and reach the Trainer constructor."""

import dataclasses

import pytest

from tfrec_tpu.configs import with_overrides
from tfrec_tpu.zoo_configs import ZOO


@pytest.mark.parametrize("name", sorted(ZOO))
def test_zoo_config_constructs_and_overrides(name):
    cfg = ZOO[name]()
    assert cfg.run_name
    assert dataclasses.is_dataclass(cfg)
    cfg2 = with_overrides(cfg, {"train.batch_size": 64, "model.embed_dim": 8})
    assert cfg2.train.batch_size == 64 and cfg2.model.embed_dim == 8
    # original untouched (frozen dataclasses)
    assert cfg.train.batch_size != 64 or name == "_"


def test_config5_preset_is_per_field_tables():
    """Round-5 measured decision (docs/PERF.md "Round-5 on-chip results"):
    stack_tables on the mesh path is 0.33x — the config-5 preset must
    stay per-field unless a new on-chip A/B overturns it."""
    from tfrec_tpu.zoo_configs import ZOO

    cfg = ZOO["dcn_multihost"]()
    assert cfg.model.stack_tables is False
    assert cfg.mesh.table_sharding == "row"


def test_zoo_configs_have_synthetic_fallbacks():
    """Without dataset paths every config must be runnable on synthetic
    stand-ins (SURVEY.md §0: no datasets ship in this environment)."""
    for name, ctor in ZOO.items():
        cfg = ctor()
        assert cfg.data.source in (
            "synthetic_implicit", "synthetic_ctr",
        ), (name, cfg.data.source)


SMALL = {
    "mf_bpr_ml100k": {"data.num_users": 64, "data.num_items": 128,
                      "data.interactions_per_user": 8},
    "fm_ctr_ml1m": {"data.num_users": 64, "data.num_items": 128,
                    "data.interactions_per_user": 8},
    "neumf_ml20m": {"data.num_users": 64, "data.num_items": 128,
                    "data.interactions_per_user": 8,
                    "model.mlp_dims": (16, 8)},
    "dcn_criteo": {"data.num_examples": 4000,
                   "data.categorical_vocab_sizes": (100, 50),
                   "data.test_fraction": 0.2,
                   "model.embed_dim": 8, "model.mlp_dims": (16,),
                   "train.steps_per_dispatch": 1},
    "dcn_multihost": {"data.num_examples": 4000,
                      "data.categorical_vocab_sizes": (100, 50),
                      "data.test_fraction": 0.2,
                      "model.embed_dim": 8, "model.mlp_dims": (16,),
                      "train.steps_per_dispatch": 1},
    "fism_ml100k": {"data.num_users": 64, "data.num_items": 128,
                    "data.interactions_per_user": 8,
                    "model.max_history": 8},
    "multvae_ml100k": {"data.num_users": 64, "data.num_items": 128,
                       "data.interactions_per_user": 8,
                       "model.max_history": 8,
                       "model.vae_hidden": 16, "model.vae_latent": 4,
                       # per-USER batches: only 64 users exist
                       "train.batch_size": 32},
}


@pytest.mark.parametrize("name", sorted(SMALL))
def test_every_milestone_config_runs_end_to_end(name):
    """BASELINE.json configs 1-5 (synthetic stand-ins, shrunk): every
    milestone trains one epoch and evaluates — the capstone CI gate."""
    import numpy as np

    from tfrec_tpu.train.trainer import run

    cfg = with_overrides(ZOO[name](), {
        "train.epochs": 1, "train.batch_size": 128,
        "train.eval_every_epochs": 1, "train.eval_topk": (10,),
        **SMALL[name],  # per-config overrides win (e.g. multvae's
    })                  # per-user batches need batch_size <= num_users
    _, hist = run(cfg, quiet=True)
    final = hist[-1]
    assert np.isfinite(final["loss"]), (name, final)
    assert any(k.startswith(("recall@", "hr@", "auc")) for k in final), (name, final)
