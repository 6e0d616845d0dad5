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
    (dcn, d=32, auto lane pack) must produce the JSON line — now carrying
    BOTH per-chip numbers (single-device value + same-session sharded-row
    `sharded_value`, VERDICT r4 item 2) and a self-describing `protocol`
    field (item 10)."""
    rec = _run_bench("--batch", "128", "--k_small", "1", "--k_big", "2",
                     "--rounds", "1", "--reps", "1")
    assert rec["value"] > 0
    assert "dcn" in rec["metric"] and "lane_pack" in rec["metric"]
    assert rec["protocol"] == "slope"
    assert rec.get("sharded_value", 0) > 0, rec.get("sharded_error", rec)
    assert rec["sharded_key"].endswith("-shrow")


def test_bench_table_sharding_main_mode():
    """`bench.py --table_sharding row` measures the ShardedTrainStepBuilder
    step as the MAIN record (key suffix -shrow, no duplicate extra)."""
    rec = _run_bench("--batch", "128", "--k_small", "1", "--k_big", "2",
                     "--rounds", "1", "--reps", "1",
                     "--table_sharding", "row")
    assert rec["value"] > 0
    assert "table_sharding=row" in rec["metric"]
    assert "sharded_value" not in rec


def test_probe_rate_is_clamped_to_physical_plausibility():
    """VERDICT r3 weak #6: BENCH_r02 shipped 4.8e11 'TFLOP/s' when tunnel
    jitter swallowed the probe's K-spread. probe_rate must return None —
    never a number — for jitter-sized spreads AND for rates above ~2x
    chip peak, for BOTH probes' ceilings."""
    sys.path.insert(0, REPO)
    try:
        from bench import PROBE_MAX_RATE, probe_rate
    finally:
        sys.path.remove(REPO)
    work_tf = 2 * 4096**3 / 1e12  # the health probe's per-step TFLOPs
    # Healthy session: ~157 TFLOP/s -> diff = work / rate * reps * dK.
    healthy = work_tf / 157.0 * 2 * 14
    assert abs(
        probe_rate(healthy, 2, 16, 2, work_tf, PROBE_MAX_RATE["health_tflops"])
        - 157.0
    ) < 0.5
    # Jitter-sized spread: no inferable slope.
    assert probe_rate(1e-12, 2, 16, 2, work_tf,
                      PROBE_MAX_RATE["health_tflops"]) is None
    assert probe_rate(2.9e-3, 2, 16, 2, work_tf,
                      PROBE_MAX_RATE["health_tflops"]) is None
    # Implausible rate (the BENCH_r02 class): clamp to None, not garbage.
    too_fast = work_tf / 5000.0 * 2 * 14
    assert too_fast >= 3e-3 or probe_rate(
        too_fast, 2, 16, 2, work_tf, PROBE_MAX_RATE["health_tflops"]
    ) is None
    big_work = work_tf * 1000  # spread clears jitter but rate is absurd
    assert probe_rate(healthy, 2, 16, 2, big_work,
                      PROBE_MAX_RATE["health_tflops"]) is None
    for name, ceil in PROBE_MAX_RATE.items():
        assert ceil <= 2000, (name, ceil)  # ceilings stay physical


def test_drift_normalized_factor():
    """VERDICT r3 weak #1: the driver-facing factor must separate real
    wins from session drift. A 2.0x headline in a session whose anchor
    replays at 1.5x the recorded seed normalizes to ~1.33x."""
    sys.path.insert(0, REPO)
    try:
        from bench import drift_normalized
    finally:
        sys.path.remove(REPO)
    sf, norm = drift_normalized(2.0027, 1.5e6, 1.0e6)
    assert abs(sf - 1.5) < 1e-6
    assert abs(norm - 1.3351) < 1e-3
    sf, norm = drift_normalized(1.0, 1.0e6, 1.0e6)
    assert sf == 1.0 and norm == 1.0


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
