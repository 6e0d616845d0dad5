"""Interleaved A/B: exact lax.top_k vs approx_max_k candidate retrieval.

Round-2 on-chip measurement showed the exact chunked top-100 over a
1M-item catalog at ~3.0k users/s — ~250x off the MXU scoring ceiling —
because lax.top_k over 131k-wide rows lowers to a full bitonic sort.
candidate_topk(method="approx") routes candidate selection through
jax.lax.approx_max_k (the TPU PartialReduce op; per-row recall_target
guarantee) with an exact cross-chunk merge. This experiment interleaves
the two variants in ONE session (the only load-bearing comparison design
on this tunnel — docs/PERF.md) using the same chained-scan slope
protocol as bench.py: per-dispatch loss fetch, K-small/K-big dispatch
pairs, per-variant slope. Catches everything; exits 0.

Run via: python benchmarks/tpu_experiments.py --only topk_ab
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import statistics
import sys
import time
import traceback

import jax
import jax.numpy as jnp


def main() -> int:
    try:
        sys.path.insert(0, ".")
        from bench import build_topk_bench

        batch = int(_os.environ.get("TOPK_AB_BATCH", "1024"))
        d = int(_os.environ.get("TOPK_AB_DIM", "128"))
        k_small, k_big, reps, rounds = 2, 16, 2, 4
        if _os.environ.get("TOPK_AB_SMOKE"):  # CPU CI smoke: tiny Ks
            k_small, k_big, reps, rounds = 1, 2, 1, 2
        # slot key -> [fn, state, stacked_users, times]
        slots = {}
        for method in ("exact", "approx"):
            step, items, batches, _, multi = build_topk_bench(
                batch, d, method=method
            )
            fn = jax.jit(multi)
            for k in (k_small, k_big):
                stacked = jnp.broadcast_to(
                    batches[0], (k, *batches[0].shape)
                )
                _, m = fn(items, stacked)  # compile + warm
                float(m["loss"])
                slots[(method, k)] = [fn, items, stacked, []]
        for _ in range(rounds):
            for (method, k), slot in slots.items():
                fn, items, stacked, times = slot
                t0 = time.perf_counter()
                for _ in range(reps):
                    _, m = fn(items, stacked)
                    float(m["loss"])  # fetched: no elision
                times.append(time.perf_counter() - t0)
        out = {}
        for method in ("exact", "approx"):
            t_small = statistics.median(slots[(method, k_small)][-1])
            t_big = statistics.median(slots[(method, k_big)][-1])
            t_step = max(t_big - t_small, 1e-12) / (reps * (k_big - k_small))
            rate = batch / t_step
            out[method] = rate
            print(
                f"topk_ab {method}: {rate:.1f} users/s "
                f"({t_step*1e3:.2f} ms/query; blocks_small "
                f"{', '.join(f'{t:.3f}' for t in slots[(method, k_small)][-1])}; "
                f"blocks_big "
                f"{', '.join(f'{t:.3f}' for t in slots[(method, k_big)][-1])})",
                flush=True,
            )
        print(
            f"topk_ab speedup approx/exact: {out['approx']/out['exact']:.2f}x",
            flush=True,
        )
    except Exception:
        traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
