"""1-chip shard_map interleaved A/B of the row-sharded step variants.

The round-4 mesh-path claims need on-hardware evidence (VERDICT r3
items 1 and 3):

  unpacked_f32   row-sharded, per-field tables, f32 wire (round-3 mesh
                 default — the control)
  unpacked_bf16  same layout, bf16 a2a wire (the round-4 default)
  packed_bf16    lane-packed tables + lane-sliced a2a (the round-4
                 composed default at d=32)
  packed_f32     lane-sliced a2a at f32 wire (isolates packing from wire)

All four run the REAL ShardedTrainStepBuilder step over a (1, 1) mesh on
the default device — the a2a is degenerate on one chip so this measures
the shard_map step's COMPUTE (gathers, key dedup, lane slicing, one-hot
reassembly, optimizer), not wire time; the wire term is modeled from
bytes in docs/PERF.md "Multi-chip scaling model". Protocol: K-pair scan
slope (RTT-free), variants interleaved round-robin within one session
(the only load-bearing comparison on this tunnel — CLAUDE.md gotcha 3),
loss fetched per timed call (elision-proof fence).

Run via: python benchmarks/tpu_experiments.py --only mesh_ab
BREAKDOWN_DIM selects embed_dim (default 32). Catches everything; exits 0.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import statistics
import time
import traceback

import jax

if _os.environ.get("BREAKDOWN_CPU"):
    jax.config.update("jax_platforms", "cpu")

D = int(_os.environ.get("BREAKDOWN_DIM", "32"))
B = int(_os.environ.get("BREAKDOWN_BATCH", "8192"))
K_PAIR = (2, 6)
ROUNDS = 5
REPS = 2

VARIANTS = {
    "unpacked_f32": dict(lane_pack=False, a2a_dtype="float32"),
    "unpacked_bf16": dict(lane_pack=False, a2a_dtype="bfloat16"),
    "packed_bf16": dict(lane_pack=True, a2a_dtype="bfloat16"),
    "packed_f32": dict(lane_pack=True, a2a_dtype="float32"),
}


def _build(lane_pack: bool, a2a_dtype: str):
    import jax.numpy as jnp
    import numpy as np

    from tfrec_tpu.configs import MeshConfig, ModelConfig, OptimConfig
    from tfrec_tpu.models import DataSpec, build_model
    from tfrec_tpu.parallel.mesh import make_mesh
    from tfrec_tpu.parallel.step import ShardedTrainStepBuilder

    mesh = make_mesh(1, 1)
    num_dense = 13
    vocabs = (100_000,) * 26  # the bench.py Criteo-DAC shape
    model = build_model(
        ModelConfig(name="dcn", embed_dim=D, num_cross_layers=3,
                    mlp_dims=(512, 256, 128), lane_pack=lane_pack),
        DataSpec.ctr(vocabs, num_dense),
        sharded_tables=True,
        batch_size=B,
    )
    builder = ShardedTrainStepBuilder(
        model, "logloss",
        OptimConfig(learning_rate=1e-3, dense_optimizer="adam",
                    sparse_optimizer="rowwise_adagrad",
                    sparse_learning_rate=0.02),
        mesh,
        MeshConfig(table_sharding="row", a2a_dtype=a2a_dtype),
    )
    state = builder.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    shardings = None
    stacked = {}
    for k in K_PAIR:
        host = {
            "dense": rng.normal(size=(k, B, num_dense)).astype(np.float32),
            "cat": rng.integers(
                0, 100_000, size=(k, B, 26)).astype(np.int32),
            "label": rng.integers(0, 2, (k, B)).astype(np.float32),
        }
        if shardings is None:
            shardings = builder.batch_shardings(
                {n: v[0] for n, v in host.items()}, stacked=True)
        stacked[k] = {
            n: jax.device_put(jnp.asarray(v), shardings[n])
            for n, v in host.items()
        }
    steps = {
        k: jax.jit(
            builder.multi_step,
            in_shardings=(builder.state_shardings(state), shardings),
            out_shardings=(builder.state_shardings(state), None),
        )
        for k in K_PAIR
    }
    return state, stacked, steps


def main() -> int:
    try:
        built = {}
        for name, kw in VARIANTS.items():
            built[name] = _build(**kw)
            print(f"built {name}", flush=True)
        # warmup/compile every (variant, k) before any timing
        losses = {}
        for name, (state, stacked, steps) in built.items():
            for k in K_PAIR:
                _, m = steps[k](state, stacked[k])
                losses[name] = float(m["loss"])
        print("compile done; losses " + ", ".join(
            f"{n}={v:.4f}" for n, v in losses.items()), flush=True)

        times = {n: {k: [] for k in K_PAIR} for n in VARIANTS}
        for _ in range(ROUNDS):
            for name, (state, stacked, steps) in built.items():
                for k in K_PAIR:
                    t0 = time.perf_counter()
                    for _ in range(REPS):
                        _, m = steps[k](state, stacked[k])
                        float(m["loss"])  # elision-proof fence
                    times[name][k].append(time.perf_counter() - t0)
        k_s, k_b = K_PAIR
        rates = {}
        for name in VARIANTS:
            t = (statistics.median(times[name][k_b])
                 - statistics.median(times[name][k_s])) / (REPS * (k_b - k_s))
            rates[name] = t
            print(f"mesh_ab {name} d={D} b={B}: {t*1e3:.2f} ms/step "
                  f"({B/t:,.0f} ex/s)", flush=True)
        base = rates["unpacked_f32"]
        for name in ("unpacked_bf16", "packed_bf16", "packed_f32"):
            print(f"mesh_ab ratio {name}/unpacked_f32: "
                  f"{base/rates[name]:.3f}x speedup", flush=True)
    except Exception:
        traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
