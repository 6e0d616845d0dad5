"""Careful sequential TPU experiment runner.

The axon TPU tunnel in this environment wedges for a long time after an
abnormal client exit (timeout kill, crash mid-session). This runner
minimizes that risk:

- probes the chip first; skips everything if it hangs;
- runs each experiment in its OWN subprocess, sequentially, with output
  appended to a log file as it happens (partial progress survives);
- each experiment script catches its own exceptions and exits 0;
- a cooldown between experiments lets session teardown finish;
- the parent never kills a child mid-run (waits without timeout by
  default; --child_timeout only as a last resort).

Usage: python benchmarks/tpu_experiments.py --log /tmp/tpu_exp.log
       [--only name1,name2] [--list]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = "import jax, jax.numpy as jnp; print('PROBE_OK', float(jnp.ones(4).sum()))"

EXPERIMENTS = {
    # bench.py defaults to the elision-proof slope protocol now.
    "bench_xla_d128": ["python", "bench.py", "--batch", "8192",
                        "--devices", "tpu", "--embed_dim", "128"],
    "bench_xla_d32": ["python", "bench.py", "--batch", "8192",
                       "--devices", "tpu", "--embed_dim", "32"],
    "bench_pallas_d128": ["python", "bench.py", "--batch", "8192",
                           "--kernels", "pallas", "--devices", "tpu",
                           "--embed_dim", "128"],
    "bench_pallas_d32": ["python", "bench.py", "--batch", "8192",
                          "--kernels", "pallas", "--devices", "tpu",
                          "--embed_dim", "32"],
    # Record the lane-packed d32 seed (auto packing engages at this
    # shape) so the default headline compares like-for-like instead of
    # falling back to the plain-key denominator (ADVICE r3 #2). Run only
    # after `health` passes in the same batch.
    "bench_xla_d32_record": ["python", "bench.py", "--batch", "8192",
                              "--devices", "tpu", "--embed_dim", "32",
                              "--record_baseline"],
    # Round-5: record the sharded-row per-chip seed (the contract
    # metric's production form — VERDICT r4 item 2) alongside the default
    # headline; the default bench now carries both numbers.
    "bench_d32_sharded_record": ["python", "bench.py", "--batch", "8192",
                                 "--devices", "tpu", "--embed_dim", "32",
                                 "--record_baseline"],
    # b>=32k is the recorded production guidance (docs/PERF.md "Batch
    # sweep"); record a strict seed at that shape too.
    "bench_d32_b32k_record": ["python", "bench.py", "--batch", "32768",
                              "--devices", "tpu", "--embed_dim", "32",
                              "--record_baseline"],
    "bench_mf": ["python", "bench.py", "--model", "mf", "--batch", "8192",
                  "--devices", "tpu"],
    "bench_topk": ["python", "bench.py", "--model", "topk", "--batch", "1024",
                    "--devices", "tpu", "--embed_dim", "128"],
    # Record the product-path top-k seeds (round 3: default measures the
    # full-width serve.recommend program; the chunked merge is -chunk).
    "bench_topk_record": ["python", "bench.py", "--model", "topk", "--batch",
                           "1024", "--devices", "tpu", "--embed_dim", "128",
                           "--record_baseline"],
    "bench_topk_exact_record": ["python", "bench.py", "--model", "topk",
                                 "--batch", "1024", "--devices", "tpu",
                                 "--embed_dim", "128", "--topk_method",
                                 "exact", "--record_baseline"],
    "bench_topk_chunked": ["python", "bench.py", "--model", "topk", "--batch",
                            "1024", "--devices", "tpu", "--embed_dim", "128",
                            "--topk_chunk", "131072"],
    "bench_topk_sharded": ["python", "bench.py", "--model", "topk", "--batch",
                            "1024", "--devices", "tpu", "--embed_dim", "128",
                            "--sharded"],
    "bench_xla_bf16": ["python", "bench.py", "--batch", "8192",
                        "--devices", "tpu", "--precision", "bfloat16",
                        "--embed_dim", "128"],
    "bench_pallas_d128_bf16": ["python", "bench.py", "--batch", "8192",
                                "--kernels", "pallas",
                                "--devices", "tpu", "--embed_dim", "128",
                                "--precision", "bfloat16"],
    "kernel_bench": ["python", "benchmarks/kernel_bench.py", "--sizes", "full"],
    "cross_check": ["python", "benchmarks/exp_cross_check.py"],
    "roofline": ["python", "benchmarks/exp_roofline.py"],
    "honest": ["python", "benchmarks/exp_honest.py"],
    "ab": ["python", "benchmarks/exp_ab.py"],
    "honest_k1": ["python", "bench.py", "--batch", "8192", "--steps", "20",
                   "--devices", "tpu", "--fetch"],
    "honest_k16": ["python", "bench.py", "--batch", "8192", "--steps", "4",
                    "--devices", "tpu", "--fetch", "--steps_per_dispatch", "16",
                    "--warmup", "2"],
    "adagrad_check": ["python", "benchmarks/exp_adagrad_check.py"],
    "packed_check": ["python", "benchmarks/exp_packed_check.py"],
    "collectives": ["python", "benchmarks/exp_collectives.py"],
    # Run FIRST in any batch whose numbers may become baselines: fast
    # elision-proof TFLOP/s slope -> HEALTHY/THROTTLED session verdict.
    "health": ["python", "benchmarks/exp_health.py"],
    # Effective random-row gather bandwidth at d in {32,128} (the d=32
    # flagship is HBM-transaction bound, not MXU bound) + strategy
    # variants (sorted ids, packed pallas) at the v=1M d=32 cliff.
    "gatherbw": ["python", "benchmarks/exp_gatherbw.py"],
    # Interleaved A/B: exact lax.top_k vs approx_max_k candidate
    # retrieval (chunked top-100 vs 1M items, b=1024, d=128).
    "topk_ab": ["python", "benchmarks/exp_topk_ab.py"],
    # Interleaved A/B: per-field vs stacked embedding tables (DCN d=32).
    "stacked_ab": ["python", "benchmarks/exp_stacked_ab.py"],
    # Attribute the ~24ms strict-slope DCN step: gathers vs dedup sorts
    # vs fwd/bwd vs sparse update (PERF.md "latency/sort-bound").
    "step_breakdown": ["python", "benchmarks/exp_step_breakdown.py"],
    "step_breakdown_d128": ["env", "BREAKDOWN_DIM=128", "python",
                            "benchmarks/exp_step_breakdown.py"],
    # Variants of the REAL step (grouped dedup A/B + sparse-path ablation).
    "step_ablate": ["python", "benchmarks/exp_step_ablate.py"],
    "step_ablate_d128": ["env", "BREAKDOWN_DIM=128", "python",
                         "benchmarks/exp_step_ablate.py"],
    # Examples/s vs batch size (fixed V-line sweep costs amortize with b).
    "batch_sweep": ["python", "benchmarks/exp_batch_sweep.py"],
    "batch_sweep_d128": ["env", "BREAKDOWN_DIM=128", "python",
                         "benchmarks/exp_batch_sweep.py"],
    # Packed-reshape scatter-add A/B inside the real step (interleaved
    # pairs: on, off, on, off — same session).
    # Since the 2026-08-17 measurement the packed lowering defaults OFF,
    # so the A/B pairs plain pertable against the forced-on variant.
    "step_packed_ab": [
        "env",
        "ABLATE_VARIANTS=pertable,pertable_packed_on,pertable,pertable_packed_on",
        "python", "benchmarks/exp_step_ablate.py",
    ],
    "step_packed_ab_d64": [
        "env", "BREAKDOWN_DIM=64",
        "ABLATE_VARIANTS=pertable,pertable_packed_on,pertable,pertable_packed_on",
        "python", "benchmarks/exp_step_ablate.py",
    ],
    # In-situ attribution of the sparse path's two halves (dedup sorts vs
    # the optimizer take/scatter trio), with pertable as the same-session
    # reference point.
    "step_ablate_parts": [
        "env", "ABLATE_VARIANTS=pertable,dedup_only,trio_arange,no_sparse",
        "python", "benchmarks/exp_step_ablate.py",
    ],
    # In-situ A/B: XLA take/scatter/scatter trio vs ONE Pallas fused RMW
    # per table (isolated slopes mispredict in-situ cost — measure in the
    # real step).
    "step_pallas_trio_ab_d128": [
        "env", "BREAKDOWN_DIM=128",
        "ABLATE_VARIANTS=pertable,pertable_pallas_trio,pertable,pertable_pallas_trio",
        "python", "benchmarks/exp_step_ablate.py",
    ],
    "step_pallas_trio_ab_d32": [
        "env", "TFREC_PACK_SUBDIM=1",
        "ABLATE_VARIANTS=pertable,pertable_pallas_trio,pertable,pertable_pallas_trio",
        "python", "benchmarks/exp_step_ablate.py",
    ],
    # Flat keyed-sort dedup (ONE sort over disjoint per-table ranges)
    # vs per-table, in the dedup half alone and in the full step.
    "step_flat_ab": [
        "env",
        "ABLATE_VARIANTS=dedup_only,dedup_only_flat,dedup_only,dedup_only_flat,pertable,flat,pertable,flat",
        "python", "benchmarks/exp_step_ablate.py",
    ],
    # Lane-packed tables (128/d fields per physical table) vs per-table,
    # at the flagship d=32 and at d=64 — the predicted big lever: the
    # optimizer sweep is dim-independent (lane padding), so packing cuts
    # swept tables 4x / 2x. Flip model.lane_pack default only on a win.
    "step_lanepack_ab": [
        "env",
        "ABLATE_VARIANTS=pertable,lanepack,pertable,lanepack",
        "python", "benchmarks/exp_step_ablate.py",
    ],
    "step_lanepack_ab_d64": [
        "env", "BREAKDOWN_DIM=64",
        "ABLATE_VARIANTS=pertable,lanepack,pertable,lanepack",
        "python", "benchmarks/exp_step_ablate.py",
    ],
    # Composition: lane-packed tables + flat keyed dedup, interleaved
    # against lanepack alone (decides group_dedup's default UNDER packing).
    "step_lanepack_flat_ab": [
        "env",
        "ABLATE_VARIANTS=lanepack,lanepack_flat,lanepack,lanepack_flat",
        "python", "benchmarks/exp_step_ablate.py",
    ],
    # Packed vs unpacked at b=16384: locates the crossover between the
    # b=8192 1.33x win and the b=32768 tie (auto threshold evidence).
    "step_lanepack_b16k": [
        "env", "BREAKDOWN_BATCH=16384",
        "ABLATE_VARIANTS=pertable,lanepack,pertable,lanepack",
        "python", "benchmarks/exp_step_ablate.py",
    ],
    # Lane-packed batch scaling at the flagship shape (b>=32k guidance).
    "step_lanepack_b32k": [
        "env", "BREAKDOWN_BATCH=32768",
        "ABLATE_VARIANTS=pertable,lanepack,pertable,lanepack",
        "python", "benchmarks/exp_step_ablate.py",
    ],
    # In-situ attribution of the PACKED step's halves (what dominates the
    # 11.3 ms after packing: the 7 bigger dedup sorts or the 7 trios?).
    "step_lanepack_parts": [
        "env",
        "ABLATE_VARIANTS=lanepack,lanepack_dedup_only,lanepack_trio_arange,lanepack_no_sparse",
        "python", "benchmarks/exp_step_ablate.py",
    ],
    # Host-precomputed dedup sorts (train.host_dedup) vs device argsorts,
    # composed with lane packing — interleaved in-situ pairs.
    "step_hostdedup_ab": [
        "env",
        "ABLATE_VARIANTS=lanepack,lanepack_hostdedup,lanepack,lanepack_hostdedup",
        "python", "benchmarks/exp_step_ablate.py",
    ],
    "step_hostdedup_ab_unpacked": [
        "env",
        "ABLATE_VARIANTS=pertable,hostdedup,pertable,hostdedup",
        "python", "benchmarks/exp_step_ablate.py",
    ],
    "step_flat_ab_d128": [
        "env", "BREAKDOWN_DIM=128",
        "ABLATE_VARIANTS=pertable,flat,pertable,flat",
        "python", "benchmarks/exp_step_ablate.py",
    ],
    # Where does grouped dedup's in-situ cost go? (one batched sort is
    # ~30x cheaper in isolation, yet grouped mode lost the full-step A/B)
    "step_dedup_grouped": [
        "env",
        "ABLATE_VARIANTS=dedup_only,dedup_only_grouped,dedup_only,dedup_only_grouped,no_sparse",
        "python", "benchmarks/exp_step_ablate.py",
    ],
    "step_ablate_parts_d128": [
        "env", "BREAKDOWN_DIM=128",
        "ABLATE_VARIANTS=pertable,dedup_only,trio_arange,no_sparse",
        "python", "benchmarks/exp_step_ablate.py",
    ],
    # Table-update scatter strategies (sorted/unique hints, pallas fused).
    "scatter_variants": ["python", "benchmarks/exp_scatter_variants.py"],
    "scatter_variants_d128": ["env", "BREAKDOWN_DIM=128", "python",
                              "benchmarks/exp_scatter_variants.py"],
    # Post-hints sparse-path decomposition at 26-table scale.
    "sparse_residue": ["python", "benchmarks/exp_sparse_residue.py"],
    "sparse_residue_d128": ["env", "BREAKDOWN_DIM=128", "python",
                            "benchmarks/exp_sparse_residue.py"],
    # Round-4 mesh-path A/B on the (1,1) mesh: lane-sliced packing x wire
    # dtype, interleaved K-pair slopes (VERDICT r3 items 1 + 3).
    "mesh_ab": ["python", "benchmarks/exp_mesh_ab.py"],
    # Round-5 mesh A/B: route reuse x receive-side merge + the col path's
    # first on-chip number (VERDICT r4 items 1/3/4).
    "mesh_r5": ["python", "benchmarks/exp_mesh_r5.py"],
    # Int8 quantized serving throughput + recall delta vs f32 (VERDICT r4
    # weak #5).
    "int8_serve": ["python", "benchmarks/exp_int8_serve.py"],
    "mesh_r5_colshape": ["env", "MESH_R5_GROUP=colshape", "python",
                         "benchmarks/exp_mesh_r5.py"],
    # Config-5's stack_tables=True on the MESH path (never measured there;
    # the single-device 2.2x loss came from V-sweeps the mesh update
    # doesn't have).
    "mesh_r5_stacked": ["env", "MESH_R5_GROUP=stacked", "python",
                        "benchmarks/exp_mesh_r5.py"],
    # fused_tables x route_reuse interleaved A/B (the round-5 breakdown
    # window hinted fused wins 1.16x under route reuse).
    "mesh_r5_fused": ["env", "MESH_R5_GROUP=fused", "python",
                      "benchmarks/exp_mesh_r5.py"],
    "mesh_r5_route_d128": ["env", "MESH_R5_GROUP=route_d128", "python",
                           "benchmarks/exp_mesh_r5.py"],
    # Attribute the mesh step's ~2x overhead vs single-device (lookup vs
    # update machinery vs partitioner reference) — the R8 per-chip term.
    "mesh_breakdown": ["python", "benchmarks/exp_mesh_breakdown.py"],
    "mesh_breakdown_d128": ["env", "BREAKDOWN_DIM=128", "python",
                            "benchmarks/exp_mesh_breakdown.py"],
    # Compile-only inspection of the (1,1) row vs gspmd step on TPU.
    "mesh_hlo": ["python", "benchmarks/exp_mesh_hlo.py"],
    # Compile-only collective inventory of gspmd vs row on the REAL
    # 8-device virtual mesh (the structural gspmd-wire record).
    "gspmd_wire": ["env", "XLA_FLAGS=--xla_force_host_platform_device_count=8",
                   "python", "benchmarks/exp_gspmd_wire.py"],
    # Device trace of 3 steps, top ops by duration (row vs gspmd).
    "mesh_profile": ["python", "benchmarks/exp_mesh_profile.py"],
    # Quality bands for the Criteo-shaped configs (VERDICT r1 item 1) —
    # long (~20-30 min): 2 configs x 3 seeds, full length, on the chip.
    "quality_dcn": ["python", "benchmarks/quality_bands.py", "--configs",
                     "dcn_criteo,dcn_multihost", "--seeds", "3",
                     "--device", "default"],
    # Config 5 alone (config 4's band landed 2026-08-17; the dcn_multihost
    # leg of that batch was cut off at seed 42).
    "quality_dcn5": ["python", "benchmarks/quality_bands.py", "--configs",
                      "dcn_multihost", "--seeds", "3", "--device", "default"],
}


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--log", default="/tmp/tpu_experiments.log")
    parser.add_argument("--only", default="")
    parser.add_argument("--list", action="store_true")
    parser.add_argument("--cooldown", type=int, default=30)
    parser.add_argument("--child_timeout", type=int, default=1800, help="0 = none")
    args = parser.parse_args(argv)

    if args.list:
        print("\n".join(EXPERIMENTS))
        return 0
    names = [n for n in args.only.split(",") if n] or list(EXPERIMENTS)
    unknown = [n for n in names if n not in EXPERIMENTS]
    if unknown:
        # Fail BEFORE the probe: a typo must not burn tunnel sessions.
        print(f"unknown experiment(s) {unknown}; options: {sorted(EXPERIMENTS)}")
        return 2

    log = open(args.log, "a", buffering=1)

    def note(msg):
        line = f"[{time.strftime('%H:%M:%S')}] {msg}"
        log.write(line + "\n")
        print(line, flush=True)

    note(f"=== tpu_experiments start: {names}")

    def probe_ok(attempts: int = 3, wait_s: int = 60) -> bool:
        """Session creation right after another session often hangs while
        the server side tears down; retry with long gaps."""
        # Session creation can legitimately take minutes while the
        # previous session tears down; waiting out one long attempt beats
        # killing it (kills extend the teardown).
        for attempt in range(attempts):
            try:
                probe = subprocess.run(
                    [sys.executable, "-c", PROBE], timeout=600,
                    capture_output=True, text=True, cwd=REPO,
                )
                if "PROBE_OK" in probe.stdout:
                    return True
                note(f"probe attempt {attempt}: rc={probe.returncode} "
                     f"err={probe.stderr[-150:]}")
            except subprocess.TimeoutExpired:
                note(f"probe attempt {attempt}: HUNG")
            if attempt + 1 < attempts:
                time.sleep(wait_s)
        return False

    if not probe_ok():
        note("tunnel unavailable; aborting (no experiments run)")
        return 1
    note("probe ok")
    time.sleep(args.cooldown)

    for name in names:
        # No inter-experiment probes: every probe is itself a session and
        # adds teardown churn. Each experiment just waits out session
        # creation on its own (can take minutes).
        cmd = EXPERIMENTS[name]
        note(f"--- {name}: {' '.join(cmd)}")
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        with open(args.log, "a") as child_log:
            try:
                rc = subprocess.run(
                    [sys.executable] + cmd[1:] if cmd[0] == "python" else cmd,
                    stdout=child_log, stderr=child_log, cwd=REPO, env=env,
                    timeout=args.child_timeout or None,
                ).returncode
                note(f"--- {name}: exit {rc}")
            except subprocess.TimeoutExpired:
                note(f"--- {name}: TIMEOUT (tunnel may now be wedged)")
                return 1
        time.sleep(args.cooldown)
    note("=== all done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
