"""Scaling benchmark: examples/s at 1 device vs N devices (R8).

On real hardware this measures true scaling (1 chip -> 1 host -> slice, the
>=85% efficiency target); on the virtual CPU mesh it validates the
measurement path only (virtual devices share one physical core, so reported
"efficiency" there is meaningless and flagged as simulated).

Usage: python benchmarks/scaling.py [--devices N] [--batch 8192] [--model dcn]
Prints a JSON report; exit code 0.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def measure(n_devices: int, batch: int, model_name: str, steps: int, warmup: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tfrec_tpu.configs import MeshConfig, ModelConfig, OptimConfig
    from tfrec_tpu.models import DataSpec, build_model
    from tfrec_tpu.parallel.mesh import make_mesh
    from tfrec_tpu.parallel.step import ShardedTrainStepBuilder

    mesh = make_mesh(n_devices, 1, devices=jax.devices()[:n_devices])
    vocabs = (100_000,) * 8
    num_dense = 13
    if model_name == "dcn":
        mcfg = ModelConfig(name="dcn", embed_dim=32, num_cross_layers=3,
                           mlp_dims=(256, 128))
    else:
        mcfg = ModelConfig(name=model_name, embed_dim=32, mlp_dims=(256, 128))
    # sharded_tables: tables are row-sharded below — auto lane packing
    # must stay off (128/d a2a wire regression; lane_pack_applies).
    model = build_model(mcfg, DataSpec.ctr(vocabs, num_dense),
                        sharded_tables=True)
    builder = ShardedTrainStepBuilder(
        model, "logloss",
        OptimConfig(learning_rate=1e-3, sparse_optimizer="rowwise_adagrad"),
        mesh, MeshConfig(table_sharding="row"),
    )
    state = builder.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(4):
        b = {
            "dense": rng.normal(size=(batch, num_dense)).astype(np.float32),
            "cat": np.stack([rng.integers(0, v, batch) for v in vocabs], 1).astype(np.int32),
            "label": rng.integers(0, 2, batch).astype(np.float32),
        }
        sh = builder.batch_shardings(b)
        batches.append({k: jax.device_put(jnp.asarray(v), sh[k]) for k, v in b.items()})
    step = builder.compile_step(state, batches[0])
    for i in range(warmup):
        state, m = step(state, batches[i % len(batches)])
    float(m["loss"])
    # Fetch-fenced: on this environment's relay, block_until_ready can
    # return before execution completes (docs/PERF.md "The fence
    # artifact"), so every timed step fetches its loss. The reported
    # rate therefore includes one host round-trip per step — fine for a
    # RATIO between the 1-device and N-device runs (the RTT term is the
    # same constant in both), which is all this script reports.
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = step(state, batches[i % len(batches)])
        float(m["loss"])
    dt = time.perf_counter() - t0
    return steps * batch / dt


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, default=0, help="0 = all")
    parser.add_argument("--batch", type=int, default=8192)
    parser.add_argument("--model", default="dcn")
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--platform", default="auto",
                        choices=["auto", "cpu", "tpu"],
                        help="cpu forces the CPU backend via jax.config "
                             "(the JAX_PLATFORMS env var is overridden by "
                             "this image's sitecustomize — CLAUDE.md)")
    args = parser.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    n = args.devices or len(jax.devices())
    platform = jax.default_backend()
    r1 = measure(1, args.batch, args.model, args.steps, args.warmup)
    rn = measure(n, args.batch, args.model, args.steps, args.warmup) if n > 1 else r1
    eff = rn / (n * r1) if n > 1 else 1.0
    print(json.dumps({
        "model": args.model,
        "platform": platform,
        "batch": args.batch,
        "examples_per_s_1dev": round(r1, 1),
        "examples_per_s_ndev": round(rn, 1),
        "n_devices": n,
        "scaling_efficiency": round(eff, 4),
        "simulated": platform == "cpu",
        "note": "virtual CPU devices share one core; efficiency is only "
                "meaningful on real hardware" if platform == "cpu" else "",
    }))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
