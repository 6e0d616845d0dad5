"""Full-length quality-band runs for the five milestone configs
(BASELINE.json:7-11; VERDICT r1 item 1 — the contract's headline metric).

Runs each requested zoo config end to end on its synthetic stand-in
(/root/reference was empty and no datasets ship here — SURVEY.md §0) over
N seeds (train.seed varies; the data split stays fixed so the band
measures RUN-to-run variance, the contract's parity definition), then
merges {config: {metric: {mean, std, min, max, values}}} into
QUALITY_BANDS.json at the repo root. BASELINE.md quotes these bands;
tests/test_golden.py pins the CI-gate config's band.

Configs 1-3 are CPU-runnable; 4-5 (26-field Criteo shape) are meant for
the chip (schedule via benchmarks/tpu_experiments.py --only quality_dcn).

Usage: python benchmarks/quality_bands.py
         [--configs mf_bpr_ml100k,fm_ctr_ml1m,neumf_ml20m]
         [--seeds 3] [--device cpu|default] [--out QUALITY_BANDS.json]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import statistics
import time

REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))

# Metrics worth banding, per config kind.
BAND_METRICS = (
    "recall@10", "recall@20", "recall@50", "ndcg@10", "ndcg@20",
    "hr@10", "hr@20", "ndcg_sampled@10", "ndcg_sampled@20",
    "auc", "logloss", "loss",
)


def run_config(name: str, seed: int, quiet: bool = True, overrides=None):
    from tfrec_tpu.configs import with_overrides
    from tfrec_tpu.train.trainer import run
    from tfrec_tpu.zoo_configs import ZOO

    cfg = ZOO[name]()
    cfg = with_overrides(cfg, {"train.seed": seed, **(overrides or {})})
    t0 = time.monotonic()
    _, hist = run(cfg, quiet=quiet)
    final = {k: v for k, v in hist[-1].items() if isinstance(v, (int, float))}
    final["_wall_s"] = round(time.monotonic() - t0, 1)
    return final


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--configs", default="mf_bpr_ml100k,fm_ctr_ml1m,neumf_ml20m")
    parser.add_argument("--seeds", type=int, default=3)
    parser.add_argument("--seed_base", type=int, default=42)
    parser.add_argument("--device", default="cpu", choices=["cpu", "default"])
    parser.add_argument("--out", default=_os.path.join(REPO, "QUALITY_BANDS.json"))
    parser.add_argument(
        "--override", action="append", default=[],
        help="dotted config override applied to every run, e.g. "
        "mesh.a2a_dtype=bfloat16 (repeatable)")
    parser.add_argument(
        "--suffix", default="",
        help="band-name suffix so an overridden run lands under its own "
        "key (e.g. --suffix _bf16wire -> dcn_multihost_bf16wire)")
    args = parser.parse_args(argv)
    from tfrec_tpu.cli import parse_overrides

    overrides = parse_overrides(args.override)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    platform = jax.default_backend()

    results = {}
    if _os.path.exists(args.out):
        try:
            with open(args.out) as f:
                results = json.load(f)
        except Exception:
            results = {}

    for name in [c for c in args.configs.split(",") if c]:
        runs = []
        for i in range(args.seeds):
            seed = args.seed_base + i * 101
            final = run_config(name, seed, overrides=overrides)
            runs.append(final)
            print(f"{name} seed={seed}: " + " ".join(
                f"{k}={v:.4f}" for k, v in sorted(final.items())
                if k in BAND_METRICS), flush=True)
        bands = {}
        for metric in BAND_METRICS:
            vals = [r[metric] for r in runs if metric in r]
            if not vals:
                continue
            bands[metric] = {
                "mean": statistics.mean(vals),
                "std": statistics.stdev(vals) if len(vals) > 1 else 0.0,
                "min": min(vals),
                "max": max(vals),
                "values": vals,
            }
        entry = {
            "platform": platform,
            "seeds": [args.seed_base + i * 101 for i in range(args.seeds)],
            "date": time.strftime("%Y-%m-%d"),
            "wall_s_per_run": [r["_wall_s"] for r in runs],
            "metrics": bands,
        }
        if overrides:
            entry["overrides"] = overrides
        results[name + args.suffix] = entry
        with open(args.out, "w") as f:  # persist after EVERY config
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"=== {name}{args.suffix}: bands written to {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
