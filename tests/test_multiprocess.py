"""Multi-controller smoke test: 2 processes x 4 virtual devices run the
sharded Trainer end-to-end with per-process data shards and a sharded
checkpoint roundtrip (SURVEY.md §4 "Multi-host")."""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_training(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    out_json = str(tmp_path / "result.json")
    worker = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(i), out_json],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multiprocess workers timed out")
        outs.append((p.returncode, out, err))
    for code, out, err in outs:
        assert code == 0, f"worker failed:\n{out}\n{err}"
    with open(out_json) as f:
        final = json.load(f)
    assert final["loss"] < 0.8, final
    assert final["recall@20"] > 0.1, final


def test_two_process_criteo_streaming(tmp_path):
    """Config-5-shaped data path: one TSV, two processes, striped streaming
    batches, sharded tables, CTR eval (VERDICT r1 item 5)."""
    import numpy as np

    tsv = str(tmp_path / "criteo.tsv")
    rng = np.random.default_rng(7)
    with open(tsv, "w") as f:
        for _ in range(1200):
            label = rng.integers(0, 2)
            dense = "\t".join(str(rng.integers(0, 50)) for _ in range(13))
            cats = "\t".join(
                format(rng.integers(0, 1 << 32), "x") for _ in range(26)
            )
            f.write(f"{label}\t{dense}\t{cats}\n")

    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    out_json = str(tmp_path / "result.json")
    worker = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(i), out_json,
             f"criteo:{tsv}"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("criteo streaming workers timed out")
        outs.append((p.returncode, out, err))
    for code, out, err in outs:
        assert code == 0, f"worker failed:\n{out}\n{err}"
    with open(out_json) as f:
        final = json.load(f)
    assert final["global_step"] == 7
    assert 0.0 <= final["auc"] <= 1.0
    import math

    assert math.isfinite(final["loss"])
