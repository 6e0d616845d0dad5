"""Command-line entry: ``python -m tfrec_tpu.cli --config <name> [k=v ...]``.

The reference family's ``main.py`` + ``.properties`` flow (SURVEY.md §3a)
maps to: pick a zoo config by name, override any field with dotted
``section.field=value`` pairs (typed via ast.literal_eval), train + eval.

Multi-host: set JAX_COORDINATOR=host:port (plus JAX_NUM_PROCESSES /
JAX_PROCESS_ID) and every process runs this same program;
``jax.distributed.initialize`` is called before any backend use
(SURVEY.md §3d).
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import sys


def parse_overrides(pairs):
    out = {}
    for pair in pairs:
        if "=" not in pair:
            raise SystemExit(f"override {pair!r} is not of the form section.field=value")
        key, raw = pair.split("=", 1)
        low = raw.strip().lower()
        if low in ("true", "false"):
            # ast.literal_eval only accepts Python-cased True/False; the
            # lowercase forms used to fall through as BARE STRINGS, and
            # "false" is truthy — `mesh.route_reuse=false` silently
            # ENABLED the flag (round-5 verify finding; the dataclass
            # layer now also refuses str-into-bool).
            out[key] = low == "true"
            continue
        try:
            out[key] = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            out[key] = raw  # bare string
    return out


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="tfrec_tpu",
        description="TPU-native recommender training",
    )
    parser.add_argument(
        "--config", default="mf_bpr_ml100k",
        help="zoo config name (see tfrec_tpu.zoo_configs.ZOO)",
    )
    parser.add_argument("--data_path", default=None, help="dataset path (MovieLens UIRT / Criteo TSV)")
    parser.add_argument(
        "--platform", default=None,
        help="force a JAX platform list (e.g. 'cpu') before backend init — "
        "takes effect even where site hooks override the JAX_PLATFORMS env "
        "var (jax.config wins over both)",
    )
    parser.add_argument("--list_configs", action="store_true")
    parser.add_argument(
        "overrides", nargs="*",
        help="dotted config overrides, e.g. train.batch_size=4096 model.embed_dim=128",
    )
    args = parser.parse_args(argv)

    from tfrec_tpu.zoo_configs import ZOO

    if args.list_configs:
        for name in ZOO:
            print(name)
        return 0
    if args.config not in ZOO:
        raise SystemExit(f"unknown config {args.config!r}; options: {sorted(ZOO)}")

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if os.environ.get("JAX_COORDINATOR"):
        import jax

        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR"],
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )

    from tfrec_tpu.configs import with_overrides
    from tfrec_tpu.train.trainer import run

    cfg = ZOO[args.config](args.data_path)
    if args.overrides:
        cfg = with_overrides(cfg, parse_overrides(args.overrides))

    _, history = run(cfg)
    if history:
        print(json.dumps(history[-1], default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
