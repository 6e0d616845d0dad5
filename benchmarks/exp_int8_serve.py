"""Int8 quantized serving: throughput + recall delta vs f32 (VERDICT r4
weak #5 — the one shipped capability with neither a measurement nor a
recorded decision).

Measures, at the R7 serving shape (top-100 vs a 1M-item catalog,
d=128), interleaved in one session:

  f32     serve.recommend's single-device program: full [B, V] scores
          (f32 table) + one approx_max_k PartialReduce
  int8    the quantized program: int8 table widened inside the fused
          matmul + rowwise rescale + the same approx_max_k
          (ops/quantize.quantized_scores — serve.Recommender(quantize=True))

plus recall@100 of each against the f32 EXACT full-sort oracle (the
quantization quality cost, separated from approx_max_k's own
recall_target=0.99 budget).

Protocol: chained K-query scan slopes (each query feeds a negligible
perturbation of the next — elision-proof), variants interleaved.
Run via: python benchmarks/tpu_experiments.py --only int8_serve
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

V = int(_os.environ.get("INT8_V", "1000000"))
D = int(_os.environ.get("INT8_D", "128"))
B = int(_os.environ.get("INT8_B", "1024"))
K = 100
K_PAIR = (2, 16)
ROUNDS = 3
REPS = 2


def main() -> int:
    try:
        import jax.numpy as jnp
        import numpy as np

        from tfrec_tpu.eval.retrieval import topk_scores
        from tfrec_tpu.ops.quantize import quantize_table, quantized_scores

        rng = np.random.default_rng(0)
        table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
        qt = quantize_table(table)
        users0 = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

        def q_f32(tbl, users):
            scores = jnp.dot(users, tbl.T, preferred_element_type=jnp.float32)
            return topk_scores(scores, K, None, None, method="approx")

        def q_int8(q_vals, q_scales, users):
            scores = quantized_scores(
                users, type(qt)(q_vals, q_scales), None
            )
            return topk_scores(scores, K, None, None, method="approx")

        def q_f32_bf16s(tbl, users):
            # bf16 SCORE MATRIX: the serving program is bound by writing
            # the [B, V] scores (4 GB at this shape) — a bf16 matrix
            # halves that traffic; candidate selection runs on bf16.
            scores = jnp.dot(users.astype(jnp.bfloat16),
                             tbl.astype(jnp.bfloat16).T,
                             preferred_element_type=jnp.bfloat16)
            vals, ids = topk_scores(scores, K, None, None, method="approx")
            return vals.astype(jnp.float32), ids

        def chain(query, k):
            # Tables are ARGUMENTS, never closure constants — a closed-over
            # 512MB table bakes into the compile payload (bench.py topk
            # learned this: the remote-compile endpoint rejects/crawls).
            def fn(users, *state_args):
                def body(carry, _):
                    vals, _ids = query(*state_args, users + carry * 1e-20)
                    return vals[0, 0], None

                last, _ = jax.lax.scan(body, jnp.zeros(()), None, length=k)
                return last

            return jax.jit(fn)

        variants = {
            "f32": ({k: chain(q_f32, k) for k in K_PAIR}, (table,)),
            "int8": ({k: chain(q_int8, k) for k in K_PAIR},
                     (qt.values, qt.scales)),
            "f32_bf16scores": ({k: chain(q_f32_bf16s, k) for k in K_PAIR},
                               (table,)),
        }
        for fns, state_args in variants.values():
            for f in fns.values():
                float(f(users0, *state_args))  # compile + warm
        print("compile done", flush=True)

        times = {n: {k: [] for k in K_PAIR} for n in variants}
        for _ in range(ROUNDS):
            for name, (fns, state_args) in variants.items():
                for k, f in fns.items():
                    t0 = time.perf_counter()
                    for _ in range(REPS):
                        float(f(users0, *state_args))
                    times[name][k].append(time.perf_counter() - t0)
        k_s, k_b = K_PAIR
        for name in variants:
            t = (statistics.median(times[name][k_b])
                 - statistics.median(times[name][k_s])) / (REPS * (k_b - k_s))
            print(f"int8_serve {name} top-{K} vs {V} items d={D} b={B}: "
                  f"{t*1e3:.2f} ms/query ({B/t:,.0f} users/s)", flush=True)

        # Recall@100 vs the f32 EXACT oracle (chunk-safe full sort) on a
        # 256-user slice — separates quantization loss from approx_max_k's
        # own recall_target budget.
        users_q = users0[:256]
        exact_scores = jnp.dot(users_q, table.T,
                               preferred_element_type=jnp.float32)
        _, oracle_ids = topk_scores(exact_scores, K, None, None,
                                    method="exact")
        oracle = np.asarray(oracle_ids)
        for name, (vals, ids) in {
            "f32_approx": jax.jit(q_f32)(table, users_q),
            "int8_approx": jax.jit(q_int8)(qt.values, qt.scales, users_q),
            "bf16scores_approx": jax.jit(q_f32_bf16s)(table, users_q),
        }.items():
            got = np.asarray(ids)
            hits = np.mean([
                len(set(got[i]) & set(oracle[i])) / K
                for i in range(len(got))
            ])
            print(f"int8_serve recall@{K} {name} vs f32 exact: {hits:.4f}",
                  flush=True)
    except Exception:
        traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
