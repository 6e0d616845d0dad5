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


def test_zoo_configs_have_synthetic_fallbacks():
    """Without dataset paths every config must be runnable on synthetic
    stand-ins (SURVEY.md §0: no datasets ship in this environment)."""
    for name, ctor in ZOO.items():
        cfg = ctor()
        assert cfg.data.source in (
            "synthetic_implicit", "synthetic_ctr",
        ), (name, cfg.data.source)
