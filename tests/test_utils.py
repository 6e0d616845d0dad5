"""Unit tests for utility modules: prefetch, logger, profile timers."""

import json
import time

import pytest

from tfrec_tpu.utils.logging import MetricLogger
from tfrec_tpu.utils.prefetch import prefetch


def test_prefetch_preserves_order_and_values():
    out = list(prefetch(range(20), lambda x: x * x, depth=3))
    assert out == [x * x for x in range(20)]


def test_prefetch_early_exit_releases_worker():
    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = prefetch(gen(), lambda x: x, depth=2)
    got = [next(it) for _ in range(3)]
    it.close()  # consumer stops early
    time.sleep(0.3)
    n_after = len(produced)
    time.sleep(0.3)
    assert len(produced) == n_after  # worker stopped producing
    assert got == [0, 1, 2]


def test_prefetch_propagates_worker_exception():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = prefetch(gen(), lambda x: x)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_metric_logger_jsonl(tmp_path):
    logger = MetricLogger("t", out_dir=str(tmp_path), quiet=True, tensorboard=False)
    logger.log({"epoch": 0, "loss": 1.5})
    logger.log({"epoch": 1, "loss": 1.2, "recall@20": 0.3})
    logger.close()
    lines = [json.loads(l) for l in open(tmp_path / "t.metrics.jsonl")]
    assert lines[0]["loss"] == 1.5 and "wall_s" in lines[0]
    assert lines[1]["recall@20"] == 0.3


def test_cli_overrides_parse():
    from tfrec_tpu.cli import parse_overrides

    got = parse_overrides(["train.batch_size=512", "model.name='fm'",
                           "train.eval_topk=(5,10)", "data.path=/x/y.tsv"])
    assert got == {"train.batch_size": 512, "model.name": "fm",
                   "train.eval_topk": (5, 10), "data.path": "/x/y.tsv"}
    with pytest.raises(SystemExit):
        parse_overrides(["noequals"])
    # Lowercase true/false coerce to bools — ast.literal_eval rejects
    # them, and the fall-through string "false" is TRUTHY: before round
    # 5 `mesh.route_reuse=false` silently ENABLED the flag.
    got = parse_overrides(["mesh.route_reuse=false", "train.host_dedup=TRUE",
                           "mesh.fused_tables=True"])
    assert got == {"mesh.route_reuse": False, "train.host_dedup": True,
                   "mesh.fused_tables": True}


def test_overrides_refuse_string_into_bool_field():
    """The dataclass layer refuses a str landing on a bool field (library
    callers bypass the CLI coercion)."""
    from tfrec_tpu.configs import Config, with_overrides

    with pytest.raises(ValueError, match="bool"):
        with_overrides(Config(), {"mesh.route_reuse": "false"})
    cfg = with_overrides(Config(), {"mesh.route_reuse": False})
    assert cfg.mesh.route_reuse is False
    # Tri-state bool | None fields are covered too (the DECLARED type is
    # checked, not the current value — model.lane_pack defaults to None,
    # where an isinstance-on-value guard let 'false' through truthy).
    with pytest.raises(ValueError, match="bool"):
        with_overrides(Config(), {"model.lane_pack": "false"})
    cfg = with_overrides(Config(), {"model.lane_pack": False})
    assert cfg.model.lane_pack is False

def test_step_profiler_window_with_strides(tmp_path, monkeypatch):
    from tfrec_tpu.utils import profile as prof

    calls = []
    monkeypatch.setattr(prof.jax.profiler, "start_trace",
                        lambda d: calls.append(("start", d)))
    monkeypatch.setattr(prof.jax.profiler, "stop_trace",
                        lambda: calls.append(("stop", None)))
    p = prof.StepProfiler((100, 120), out_dir=str(tmp_path))
    # strides of 8 skip the exact start step — window must still fire
    for step in range(0, 200, 8):
        p.step(step)
    p.close()
    kinds = [k for k, _ in calls]
    assert kinds == ["start", "stop"]


def test_cli_as_real_process():
    """python -m tfrec_tpu.cli in a real subprocess (argv + exit codes)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "tfrec_tpu.cli", "--list_configs"],
        capture_output=True, text=True, timeout=120, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0
    assert "mf_bpr_ml100k" in out.stdout and "dcn_criteo" in out.stdout
    bad = subprocess.run(
        [sys.executable, "-m", "tfrec_tpu.cli", "--config", "nope"],
        capture_output=True, text=True, timeout=120, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert bad.returncode != 0
    assert "unknown config" in bad.stderr + bad.stdout


def test_run_config_is_first_log_record(tmp_path):
    """SURVEY §5: the full run config opens every metric stream, so a run
    is reproducible from its own logs."""
    import json

    from tfrec_tpu.configs import (
        Config, DataConfig, MeshConfig, ModelConfig, TrainConfig,
    )
    from tfrec_tpu.train.trainer import Trainer

    cfg = Config(
        data=DataConfig(source="synthetic_implicit", num_users=32,
                        num_items=64, interactions_per_user=6, seed=0),
        model=ModelConfig(name="mf", embed_dim=8),
        train=TrainConfig(batch_size=32, epochs=1, eval_every_epochs=0,
                          checkpoint_dir=str(tmp_path)),
        mesh=MeshConfig(data_axis_size=0),
    )
    Trainer(cfg, quiet=True)
    lines = [
        json.loads(l)
        for l in open(tmp_path / f"{cfg.run_name}.metrics.jsonl")
    ]
    first = lines[0]
    assert first["event"] == "run_config"
    assert first["config"]["model"]["name"] == "mf"
    assert first["config"]["train"]["batch_size"] == 32


def test_top_device_ops_parses_perfetto_trace(tmp_path):
    """utils/profile.top_device_ops: device tracks aggregated by duration
    (the round-4 forensics tool — docs/PERF.md); host tracks ignored."""
    import gzip
    import json

    from tfrec_tpu.utils.profile import top_device_ops

    events = [
        {"ph": "M", "name": "process_name", "pid": 1,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "process_name", "pid": 2,
         "args": {"name": "python host"}},
        {"ph": "X", "pid": 1, "name": "while.7", "dur": 800.0, "ts": 0},
        {"ph": "X", "pid": 1, "name": "while.9", "dur": 700.0, "ts": 1},
        {"ph": "X", "pid": 1, "name": "fusion.1", "dur": 100.0, "ts": 2},
        {"ph": "X", "pid": 2, "name": "host_thing", "dur": 9999.0, "ts": 3},
    ]
    d = tmp_path / "plugins" / "profile" / "run"
    d.mkdir(parents=True)
    with gzip.open(d / "x.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    rows = top_device_ops(str(tmp_path))
    assert rows[0] == ("while.7", 800.0, 1)
    assert all(n != "host_thing" for n, _, _ in rows)
    grouped = top_device_ops(str(tmp_path), group=True)
    assert grouped[0] == ("while", 1500.0, 2)

    import pytest

    with pytest.raises(FileNotFoundError):
        top_device_ops(str(tmp_path / "nope"))
