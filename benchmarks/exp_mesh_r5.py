"""Round-5 mesh-path A/B on the (1,1) mesh: route reuse x receive-side
combine, plus the column path's first on-chip measurement.

VERDICT r4 items 1/3/4. Same protocol as exp_mesh_ab (the only
load-bearing comparison on this tunnel): REAL ShardedTrainStepBuilder
steps at the flagship 26x100k DCN shape, variants interleaved
round-robin, K-pair scan slopes, loss fetched per dispatch.

Groups (env MESH_R5_GROUP):
  route (default):
    row_ctl          route_reuse=False, recv_combine=sort (the round-4
                     shipped path — control; r4 measured 22.2-22.9 ms)
    row_reuse        route_reuse=True,  sort
    row_reuse_merge  route_reuse=True,  merge
    row_merge        route_reuse=False, merge (merge in isolation)
    col              table_sharding=col on the degenerate (1,1) mesh —
                     the col path's per-chip machinery cost (VERDICT r4
                     weak #2: correctness-pinned, never measured)
  colshape:
    row vs col at a col-friendly shape (d=128, V=20k — feature-heavy,
    modest vocab), both with round-5 defaults.

Run via: python benchmarks/tpu_experiments.py --only mesh_r5[,mesh_r5_colshape]
Catches everything; exits 0.
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

B = int(_os.environ.get("BREAKDOWN_BATCH", "8192"))
K_PAIR = (2, 6)
ROUNDS = 5
REPS = 2
GROUP = _os.environ.get("MESH_R5_GROUP", "route")

# name -> (embed_dim, vocab, table_sharding, route_reuse, recv_combine,
#          stack_tables)
GROUPS = {
    "route": {
        "row_ctl": (32, 100_000, "row", False, "sort", False),
        "row_reuse": (32, 100_000, "row", True, "sort", False),
        "row_reuse_merge": (32, 100_000, "row", True, "merge", False),
        "row_merge": (32, 100_000, "row", False, "merge", False),
        "col": (32, 100_000, "col", True, "sort", False),
    },
    "colshape": {
        "row_d128v20k": (128, 20_000, "row", True, "sort", False),
        "col_d128v20k": (128, 20_000, "col", True, "sort", False),
    },
    # The config-5 preset (zoo_configs.dcn_retrieval_multihost) sets
    # stack_tables=True for ONE a2a set instead of 26 — a collective-
    # count rationale that was never measured on the mesh path (stacked
    # lost 2.2x on the SINGLE-device path, round 2, where the optimizer
    # V-sweeps dominate; the capacity-bounded mesh update has no such
    # sweeps, so the economics may invert).
    "stacked": {
        "row_reuse": (32, 100_000, "row", True, "sort", False),
        "row_stacked": (32, 100_000, "row", True, "sort", True),
    },
    # fused_tables x route_reuse: pre-reuse the fused regions measured a
    # tie twice (round 4, 12th losing design); the round-5 mesh_breakdown
    # window showed fused 22.80 vs per-table 26.47 ms (1.16x) WITH route
    # reuse — decide the default with a dedicated interleaved A/B.
    # Route reuse at the OTHER flagship dim (d=128) — the round-5 verdict
    # was measured at d=32 only.
    "route_d128": {
        "row_ctl_d128": (128, 100_000, "row", False, "sort"),
        "row_reuse_d128": (128, 100_000, "row", True, "sort"),
    },
    "fused": {
        "row_reuse": (32, 100_000, "row", True, "sort", False, False),
        "row_reuse_fused": (32, 100_000, "row", True, "sort", False, True),
        "row_ctl": (32, 100_000, "row", False, "sort", False, False),
        "row_ctl_fused": (32, 100_000, "row", False, "sort", False, True),
    },
}
VARIANTS = GROUPS[GROUP]


def _build(embed_dim, vocab, sharding, route_reuse, recv_combine,
           stack_tables=False, fused_tables=False):
    import jax.numpy as jnp
    import numpy as np

    from tfrec_tpu.configs import MeshConfig, ModelConfig, OptimConfig
    from tfrec_tpu.models import DataSpec, build_model
    from tfrec_tpu.parallel.mesh import make_mesh
    from tfrec_tpu.parallel.step import ShardedTrainStepBuilder

    mesh = make_mesh(1, 1)
    num_dense = 13
    vocabs = (vocab,) * 26
    model = build_model(
        ModelConfig(name="dcn", embed_dim=embed_dim, num_cross_layers=3,
                    mlp_dims=(512, 256, 128), lane_pack=False,
                    stack_tables=stack_tables),
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
        MeshConfig(table_sharding=sharding, route_reuse=route_reuse,
                   recv_combine=recv_combine, fused_tables=fused_tables),
    )
    state = builder.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    shardings = None
    stacked = {}
    for k in K_PAIR:
        host = {
            "dense": rng.normal(size=(k, B, num_dense)).astype(np.float32),
            "cat": rng.integers(0, vocab, size=(k, B, 26)).astype(np.int32),
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
        import warnings

        warnings.filterwarnings("ignore")  # degenerate-col warning is expected
        built = {}
        for name, spec in VARIANTS.items():
            built[name] = _build(*spec)
            print(f"built {name}", flush=True)
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
        for name, spec in VARIANTS.items():
            t = (statistics.median(times[name][k_b])
                 - statistics.median(times[name][k_s])) / (REPS * (k_b - k_s))
            rates[name] = t
            print(f"mesh_r5 {name} d={spec[0]} v={spec[1]} b={B}: "
                  f"{t*1e3:.2f} ms/step ({B/t:,.0f} ex/s)", flush=True)
        base_name = next(iter(VARIANTS))
        base = rates[base_name]
        for name in list(VARIANTS)[1:]:
            print(f"mesh_r5 ratio {name} vs {base_name}: "
                  f"{base/rates[name]:.3f}x speedup", flush=True)
    except Exception:
        traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
