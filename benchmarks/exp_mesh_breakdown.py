"""Attribute the row-sharded step's ~2x overhead vs the single-device step.

Round-4 finding (exp_mesh_ab): the REAL ShardedTrainStep at a (1,1) mesh
measures ~43 ms/step where the single-device step at the same shape
measures ~15-24 ms — and that shard_map step IS the per-chip compute of
a real multi-chip run (per-chip work scales with the fixed local batch),
so shrinking it raises the R8 flagship directly. This experiment knocks
out one half of the a2a machinery at a time, interleaved in ONE session:

  row           full row-sharded step (the 43 ms baseline)
  gspmd         table_sharding="gspmd": plain take/scatter, partitioner
                collectives only — no explicit dedup/bucket/reassembly
  row_lookup_take  row UPDATE machinery kept; lookup replaced by a plain
                take (isolates the lookup-side dedup+bucket+gather+
                reassembly cost as row - this)
  row_update_plain row LOOKUP machinery kept; update replaced by the
                single-device sparse_opt.apply on local ids (isolates the
                update-side combine+bucket+a2a+receive-combine cost)
  singledev     TrainStepBuilder (no shard_map, no mesh) — the anchor

K-pair scan slopes, loss fetched per dispatch, variants round-robin.
Since the round-4 donation fix the jits DONATE the state and the timing
loop THREADS it (exactly the product compile_step contract) — the first
runs of this experiment did neither, so their ~3-5 ms/step of copy
traffic partly measured the experiment, not the product.
BREAKDOWN_DIM / BREAKDOWN_BATCH override d / b. Catches everything;
exits 0. Run via: python benchmarks/tpu_experiments.py --only mesh_breakdown
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
VOCABS = (100_000,) * 26
NUM_DENSE = 13

VARIANTS = ("row", "row_fused", "gspmd", "row_lookup_take",
            "row_update_plain", "singledev")


def _model_and_opt():
    from tfrec_tpu.configs import ModelConfig, OptimConfig

    return (
        ModelConfig(name="dcn", embed_dim=D, num_cross_layers=3,
                    mlp_dims=(512, 256, 128), lane_pack=False),
        OptimConfig(learning_rate=1e-3, dense_optimizer="adam",
                    sparse_optimizer="rowwise_adagrad",
                    sparse_learning_rate=0.02),
    )


def _batches(rng):
    import numpy as np

    out = {}
    for k in K_PAIR:
        out[k] = {
            "dense": rng.normal(size=(k, B, NUM_DENSE)).astype(np.float32),
            "cat": rng.integers(0, VOCABS[0], size=(k, B, 26)).astype(np.int32),
            "label": rng.integers(0, 2, (k, B)).astype(np.float32),
        }
    return out


def _build(variant: str):
    import jax.numpy as jnp
    import numpy as np

    from tfrec_tpu.configs import MeshConfig
    from tfrec_tpu.models import DataSpec, build_model

    mcfg, ocfg = _model_and_opt()
    host = _batches(np.random.default_rng(0))

    if variant == "singledev":
        from tfrec_tpu.train.step import TrainStepBuilder

        model = build_model(mcfg, DataSpec.ctr(VOCABS, NUM_DENSE),
                            batch_size=B)
        builder = TrainStepBuilder(model, "logloss", ocfg)
        state = builder.init_state(jax.random.PRNGKey(0))
        stacked = {
            k: {n: jnp.asarray(v) for n, v in host[k].items()} for k in K_PAIR
        }
        steps = {
            k: jax.jit(builder.multi_step, donate_argnums=(0,))
            for k in K_PAIR
        }
        return state, stacked, steps

    from tfrec_tpu.parallel.mesh import make_mesh
    from tfrec_tpu.parallel.step import ShardedTrainStepBuilder

    mesh = make_mesh(1, 1)
    sharding = "gspmd" if variant == "gspmd" else "row"
    fused = variant == "row_fused"
    model = build_model(mcfg, DataSpec.ctr(VOCABS, NUM_DENSE),
                        sharded_tables=True, batch_size=B)
    builder = ShardedTrainStepBuilder(
        model, "logloss", ocfg, mesh,
        MeshConfig(table_sharding=sharding, a2a_dtype="float32",
                   fused_tables=fused),
    )
    if variant == "row_lookup_take":
        # want_route accepted (and ignored: a plain take has no route, so
        # the update half re-derives — the seam signature grew in round 5).
        def lookup(tables, ids, want_route=False, _b=builder):
            gathered = {
                n: jnp.take(tables[n], i, axis=0, mode="clip")
                for n, i in ids.items()
            }
            return gathered, {"lookup_overflow": jnp.zeros((), jnp.int32)}

        builder.lookup = lookup
    elif variant == "row_update_plain":
        def sparse_update(name, table, opt_state, ids, grads, lr,
                          order=None, route=None, _b=builder):
            return _b.sparse_opt.apply(table, opt_state, ids, grads, lr)

        builder.sparse_update = sparse_update

    state = builder.init_state(jax.random.PRNGKey(0))
    shardings = builder.batch_shardings(
        {n: v[0] for n, v in host[K_PAIR[0]].items()}, stacked=True)
    stacked = {
        k: {n: jax.device_put(jnp.asarray(v), shardings[n])
            for n, v in host[k].items()}
        for k in K_PAIR
    }
    steps = {
        k: jax.jit(
            builder.multi_step,
            in_shardings=(builder.state_shardings(state), shardings),
            out_shardings=(builder.state_shardings(state), None),
            donate_argnums=(0,),
        )
        for k in K_PAIR
    }
    return state, stacked, steps


def main() -> int:
    try:
        built = {}
        for name in VARIANTS:
            built[name] = _build(name)
            print(f"built {name}", flush=True)
        losses = {}
        for name, (state, stacked, steps) in built.items():
            for k in K_PAIR:
                state, m = steps[k](state, stacked[k])  # donated: thread it
                losses[name] = float(m["loss"])
            built[name] = (state, stacked, steps)
        print("compile done; losses " + ", ".join(
            f"{n}={v:.4f}" for n, v in losses.items()), flush=True)

        times = {n: {k: [] for k in K_PAIR} for n in VARIANTS}
        for _ in range(ROUNDS):
            for name in VARIANTS:
                state, stacked, steps = built[name]
                for k in K_PAIR:
                    t0 = time.perf_counter()
                    for _ in range(REPS):
                        state, m = steps[k](state, stacked[k])
                        float(m["loss"])  # elision-proof fence
                    times[name][k].append(time.perf_counter() - t0)
                built[name] = (state, stacked, steps)
        k_s, k_b = K_PAIR
        rates = {}
        for name in VARIANTS:
            t = (statistics.median(times[name][k_b])
                 - statistics.median(times[name][k_s])) / (REPS * (k_b - k_s))
            rates[name] = t
            print(f"mesh_breakdown {name} d={D} b={B}: {t*1e3:.2f} ms/step",
                  flush=True)
        full, single = rates["row"], rates["singledev"]
        print(f"mesh_breakdown attribution d={D}: total mesh overhead "
              f"{(full-single)*1e3:.2f} ms; lookup machinery "
              f"{(full-rates['row_lookup_take'])*1e3:.2f} ms; update machinery "
              f"{(full-rates['row_update_plain'])*1e3:.2f} ms; gspmd gap "
              f"{(rates['gspmd']-single)*1e3:.2f} ms; fused-region win "
              f"{(full-rates['row_fused'])*1e3:.2f} ms "
              f"({full/max(rates['row_fused'],1e-12):.2f}x)", flush=True)
    except Exception:
        traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
