"""Multi-controller tests: N processes x 8/N virtual devices run the
sharded Trainer end-to-end with per-process data shards, a sharded
checkpoint roundtrip (SURVEY.md §4 "Multi-host"), and the cross-topology
checkpoint restore (save at 2 processes -> restore at 1 and 4)."""

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


def _spawn_workers(num_procs: int, out_json: str, mode: str | None = None,
                   timeout: int = 420):
    """Run ``num_procs`` multiprocess_worker.py processes to completion;
    asserts every one exits 0."""
    coordinator = f"127.0.0.1:{_free_port()}"
    worker = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    argv = [coordinator, str(num_procs), None, out_json] + (
        [mode] if mode else []
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker] + [
                a if a is not None else str(i) for a in argv
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(num_procs)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multiprocess workers timed out")
        outs.append((p.returncode, out, err))
    for code, out, err in outs:
        assert code == 0, f"worker failed:\n{out}\n{err}"


@pytest.mark.parametrize("num_procs", [2, 4])
def test_multiprocess_sharded_training(tmp_path, num_procs):
    out_json = str(tmp_path / "result.json")
    _spawn_workers(num_procs, out_json)
    with open(out_json) as f:
        final = json.load(f)
    assert final["loss"] < 0.8, final
    assert final["recall@20"] > 0.1, final


def test_checkpoint_cross_topology_restore(tmp_path):
    """SURVEY.md §5 failure model: restart-from-checkpoint must survive a
    resized job. Save a sharded state at 2 processes, then restore it
    bitwise at 1 process (in this very pytest process, 8 local devices)
    and at 4 processes (2 local devices each)."""
    import numpy as np

    ckpt = str(tmp_path / "ckpt")
    _spawn_workers(2, str(tmp_path / "unused.json"), mode=f"ckptsave:{ckpt}")
    assert os.path.exists(os.path.join(ckpt, "ground_truth.npz"))

    # Restore at ONE process: this pytest process owns all 8 devices.
    import multiprocess_worker as mw

    from tfrec_tpu.utils.checkpoint import (
        checkpoint_table_layout, restore_checkpoint,
    )

    mesh, _, template = mw._ckpt_builder_state(7)
    restored = restore_checkpoint(ckpt, template)
    gt = np.load(os.path.join(ckpt, "ground_truth.npz"))
    flat = mw._flat_np(mesh, restored)
    assert set(flat) == set(gt.files)
    for k in gt.files:
        np.testing.assert_array_equal(flat[k], gt[k], err_msg=k)
    # Layout metadata readable from the saved keys (ADVICE r3 helper).
    assert checkpoint_table_layout(ckpt) is False  # per-field tables

    # Restore at FOUR processes (different count than the save).
    _spawn_workers(4, str(tmp_path / "unused2.json"),
                   mode=f"ckptrestore:{ckpt}")


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


def test_checkpoint_cross_device_count_restore(tmp_path):
    """Same PROCESS count, different DEVICE count (review finding, round
    4): vocab padding is a function of device count, so a 1-proc save on
    4 devices must RESSEMBLE (not fast-path) when restored on 8 devices
    — before the device_count metadata the fast path loaded the 4-device
    padded rows against the 8-device template and failed on shape."""
    import subprocess
    import sys

    import numpy as np

    ckpt = str(tmp_path / "ckpt")
    script = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import sys; sys.path.insert(0, 'tests');"
        "import numpy as np, os;"
        "import multiprocess_worker as mw;"
        "from tfrec_tpu.utils.checkpoint import save_checkpoint;"
        "mesh, _, state = mw._ckpt_builder_state(0, n_data=4);"
        "state = mw._bump(state);"
        f"save_checkpoint({ckpt!r}, 1, state);"
        "flat = mw._flat_np(mesh, state);"
        f"np.savez(os.path.join({ckpt!r}, 'ground_truth.npz'), **flat)"
    )
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, "-c", script], cwd=repo_root, env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]

    import multiprocess_worker as mw

    from tfrec_tpu.utils.checkpoint import restore_checkpoint

    mesh, _, template = mw._ckpt_builder_state(7)  # 8 devices, other seed
    restored = restore_checkpoint(ckpt, template)
    gt = np.load(os.path.join(ckpt, "ground_truth.npz"))
    flat = mw._flat_np(mesh, restored)
    assert set(flat) == set(gt.files)
    for k in gt.files:
        got, want = flat[k], gt[k]
        if got.ndim and got.shape != want.shape:
            # Row-padded leaf: logical rows bitwise, extra rows zero.
            n = min(got.shape[0], want.shape[0])
            np.testing.assert_array_equal(got[:n], want[:n], err_msg=k)
            assert not np.any(got[n:]), k
        else:
            np.testing.assert_array_equal(got, want, err_msg=k)
