"""Headline benchmark: examples/s/chip on Criteo-shaped DCN CTR training
(BASELINE.json metric). Defaults: embed_dim 128 (128-lane-aligned rows),
XLA kernels (at least as fast as the fused path in controlled interleaved
A/B runs; docs/PERF.md discusses the measurement-environment variance). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference published no numbers (BASELINE.json:13 -> {};
SURVEY.md §6), so the denominator is our own recorded first TPU measurement
stored in BENCH_BASELINE.json — i.e. the line tracks regressions/speedups
against round-1 performance. Until that file exists, vs_baseline = 1.0 and
the current value is recorded as the baseline.

Flags: --model dcn|dlrm|mf  --steps N  --batch N  --kernels xla|pallas
       --devices auto|cpu
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_dcn_bench(batch_size: int, kernels: str, embed_dim: int = 32):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tfrec_tpu.configs import ModelConfig, OptimConfig
    from tfrec_tpu.models import DataSpec, build_model
    from tfrec_tpu.train.step import TrainStepBuilder

    num_dense = 13
    vocabs = (100_000,) * 26  # Criteo-DAC shape
    model = build_model(
        ModelConfig(name="dcn", embed_dim=embed_dim, num_cross_layers=3,
                    mlp_dims=(512, 256, 128)),
        DataSpec.ctr(vocabs, num_dense),
        backend=kernels,
    )
    builder = TrainStepBuilder(
        model, "logloss",
        OptimConfig(learning_rate=1e-3, dense_optimizer="adam",
                    sparse_optimizer="rowwise_adagrad", sparse_learning_rate=0.02),
        kernels=kernels,
    )
    state = builder.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    n_batches = 8
    batches = []
    for _ in range(n_batches):
        batches.append({
            "dense": jnp.asarray(rng.normal(size=(batch_size, num_dense)).astype(np.float32)),
            "cat": jnp.asarray(
                np.stack([rng.integers(0, v, batch_size) for v in vocabs], 1).astype(np.int32)
            ),
            "label": jnp.asarray(rng.integers(0, 2, batch_size).astype(np.float32)),
        })
    step = jax.jit(builder.step, donate_argnums=(0,))
    return step, state, batches, builder


def build_topk_bench(batch_size: int, embed_dim: int):
    """Retrieval scoring throughput (R7): full-catalog top-k for a user
    batch against a 1M-item table — users/s is the reported rate."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tfrec_tpu.eval.retrieval import chunked_topk

    v, d, k = 1_000_000, embed_dim, 100
    chunk = 131_072
    v_pad = -(-v // chunk) * chunk  # dynamic_slice clamps at the edge —
    rng = np.random.default_rng(0)  # pad so chunk starts never overhang
    items = jnp.asarray(
        np.pad(rng.normal(size=(v, d)).astype(np.float32), ((0, v_pad - v), (0, 0)))
    )

    @jax.jit
    def query(item_table, users):
        # Running top-k merge over item chunks: never materializes [B, V]
        # (4GB at B=1024, V=1M) — the serving-path design. item_table is an
        # ARGUMENT, not a closure: closed-over arrays are baked into the
        # lowered program as constants (a 512MB compile payload).
        def score_chunk(u, start):
            block = jax.lax.dynamic_slice_in_dim(item_table, start, chunk, axis=0)
            return jnp.dot(u, block.T, preferred_element_type=jnp.float32)

        return chunked_topk(score_chunk, users, v, k, chunk)

    batches = [
        jnp.asarray(rng.normal(size=(batch_size, d)).astype(np.float32))
        for _ in range(4)
    ]

    def step(state, batch):
        vals, ids = query(items, batch)
        return state, {"loss": vals[0, 0]}

    return step, {}, batches, None


def build_mf_bench(batch_size: int, kernels: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tfrec_tpu.configs import OptimConfig
    from tfrec_tpu.models import MF, DataSpec
    from tfrec_tpu.train.step import TrainStepBuilder

    model = MF(DataSpec.interaction(1_000_000, 1_000_000), embed_dim=64)
    builder = TrainStepBuilder(
        model, "bpr",
        OptimConfig(learning_rate=0.05, sparse_optimizer="rowwise_adagrad"),
        kernels=kernels,
    )
    state = builder.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(8):
        batches.append({
            "user": jnp.asarray(rng.integers(0, 1_000_000, batch_size).astype(np.int32)),
            "pos": jnp.asarray(rng.integers(0, 1_000_000, batch_size).astype(np.int32)),
            "neg": jnp.asarray(rng.integers(0, 1_000_000, batch_size).astype(np.int32)),
        })
    step = jax.jit(builder.step, donate_argnums=(0,))
    return step, state, batches, builder


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="dcn", choices=["dcn", "mf", "topk"])
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--batch", type=int, default=8192)
    parser.add_argument("--kernels", default="xla", choices=["xla", "pallas"])
    parser.add_argument("--embed_dim", type=int, default=128)
    parser.add_argument("--steps_per_dispatch", type=int, default=1,
                        help="K steps per host round-trip (lax.scan)")
    parser.add_argument("--fetch", action="store_true",
                        help="fetch the loss to host every dispatch "
                             "(honest lower bound; defeats dispatch elision)")
    parser.add_argument("--precision", default="default",
                        choices=["default", "bfloat16", "float32", "highest"])
    parser.add_argument(
        "--devices", default="auto", choices=["auto", "cpu", "tpu"],
        help="auto probes the TPU with a deadline; tpu skips the probe",
    )
    args = parser.parse_args(argv)

    if args.devices == "auto":
        # The TPU tunnel in this environment can wedge (stateful PJRT
        # session hangs while control stays up). Probe it in a subprocess
        # with a hard deadline; fall back to CPU rather than hanging the
        # benchmark run forever.
        import subprocess

        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; print(float(jnp.ones(4).sum()))"],
                timeout=180, capture_output=True, text=True,
            )
            tpu_ok = probe.returncode == 0 and "4.0" in probe.stdout
        except subprocess.TimeoutExpired:
            tpu_ok = False
        if not tpu_ok:
            print("bench: device probe failed/hung; falling back to CPU",
                  file=sys.stderr)
            args.devices = "cpu"
    if args.devices == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    if args.precision != "default":
        jax.config.update("jax_default_matmul_precision", args.precision)
    platform = jax.default_backend()
    # MF ignores --embed_dim (fixed d=64); keep its baseline key stable.
    key_dim = 64 if args.model == "mf" else args.embed_dim
    # topk scores a (clamped) user batch against the catalog.
    eff_batch = min(args.batch, 1024) if args.model == "topk" else args.batch
    k_disp = max(args.steps_per_dispatch, 1)

    def build(kernels):
        if args.model == "dcn":
            out = build_dcn_bench(args.batch, kernels, args.embed_dim)
        elif args.model == "topk":
            out = build_topk_bench(eff_batch, args.embed_dim)
        else:
            out = build_mf_bench(args.batch, kernels)
        step, state, batches, builder = out
        if k_disp > 1:
            assert builder is not None, "--steps_per_dispatch needs dcn/mf"
            import jax.numpy as jnp  # noqa: F811

            stacked = []
            for i in range(0, len(batches) - k_disp + 1, k_disp):
                group = batches[i : i + k_disp]
                stacked.append({
                    key: jnp.stack([g[key] for g in group]) for key in group[0]
                })
            if not stacked:
                stacked = [{
                    key: jnp.stack([batches[i % len(batches)][key]
                                    for i in range(k_disp)])
                    for key in batches[0]
                }]
            batches = stacked
            step = jax.jit(builder.multi_step, donate_argnums=(0,))
        return step, state, batches

    step, state, batches = build(args.kernels)
    # Warmup (compile + cache); if the fused-kernel path fails to compile
    # on this hardware, fall back to the XLA path rather than dying.
    warmup = max(args.warmup, 1)  # at least one: compile must happen here
    try:
        for i in range(warmup):
            state, metrics = step(state, batches[i % len(batches)])
        jax.block_until_ready(metrics["loss"])
    except Exception as e:
        if args.kernels == "pallas":
            print(f"bench: pallas path failed ({type(e).__name__}); "
                  "falling back to xla kernels", file=sys.stderr)
            args.kernels = "xla"
            step, state, batches = build("xla")
            for i in range(warmup):
                state, metrics = step(state, batches[i % len(batches)])
            jax.block_until_ready(metrics["loss"])
        else:
            raise

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = step(state, batches[i % len(batches)])
        if args.fetch:
            float(metrics["loss"])
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    examples_per_s = args.steps * k_disp * eff_batch / dt

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BENCH_BASELINE.json")
    vs_baseline = 1.0
    record = None
    if os.path.exists(baseline_path):
        try:
            with open(baseline_path) as f:
                base = json.load(f)
            key = f"{args.model}-{platform}-b{eff_batch}-d{key_dim}-{args.kernels}-{args.precision}"
            if key in base:
                vs_baseline = examples_per_s / base[key]
            else:
                record = key
        except Exception:
            pass
    else:
        base, record = {}, f"{args.model}-{platform}-b{eff_batch}-d{key_dim}-{args.kernels}-{args.precision}"
    if record and platform == "tpu":
        base[record] = examples_per_s
        try:
            with open(baseline_path, "w") as f:
                json.dump(base, f, indent=1)
        except OSError:
            pass

    desc = {
        "dcn": "CTR train", "mf": "BPR train",
        "topk": "top-100 retrieval vs 1M items, users/s",
    }[args.model]
    print(json.dumps({
        "metric": f"examples/s/chip ({args.model} {desc}, {platform}, "
                  f"batch={eff_batch}, kernels={args.kernels}, "
                  f"prec={args.precision}, k_disp={k_disp}"
                  + (", fetch" if args.fetch else "") + ")",
        "value": round(examples_per_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(vs_baseline, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
