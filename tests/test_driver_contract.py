"""Driver-facing contract: `bench.py` must print ONE parseable JSON line
(the round's recorded headline) and `__graft_entry__` must expose a
jittable forward (`entry`) plus a full sharded train step that compiles
and runs on an 8-device mesh (`dryrun_multichip`). A regression in
either silently loses the round's BENCH/MULTICHIP artifacts, so they
are pinned here, on CPU, at toy sizes."""

import json
import os
import subprocess
import sys

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(*args):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--devices", "cpu",
         *args],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def test_bench_emits_driver_json_mf():
    rec = _run_bench("--model", "mf", "--batch", "256",
                     "--k_small", "1", "--k_big", "2",
                     "--rounds", "1", "--reps", "1")
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["value"] > 0 and rec["unit"] == "examples/s"
    assert np.isfinite(rec["vs_baseline"])


def test_bench_emits_driver_json_dcn_default_shape():
    """The driver runs plain `python bench.py`: the default model/shape
    (dcn, d=32, auto lane pack) must produce the JSON line."""
    rec = _run_bench("--batch", "128", "--k_small", "1", "--k_big", "2",
                     "--rounds", "1", "--reps", "1")
    assert rec["value"] > 0
    assert "dcn" in rec["metric"] and "lane_pack" in rec["metric"]


def test_graft_entry_and_multichip_dryrun():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out.mean()))
    n = min(8, jax.device_count())
    if n >= 2:
        g.dryrun_multichip(n)  # asserts internally; raises on failure
