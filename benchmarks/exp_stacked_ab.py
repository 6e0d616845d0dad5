"""Interleaved A/B: per-field vs STACKED embedding tables, DCN d=32.

model.stack_tables fuses the 26 per-field tables into one [2.6M, 32]
table: the step issues 1 gather + 1 duplicate-combine + 1 sparse update
instead of 26 of each. Two opposing forces, both measured here in one
session (interleaved slope protocol, per-dispatch fetch — docs/PERF.md):

- fewer/larger ops: less per-op dispatch and scheduling overhead, one
  fused dedup sort over the combined 26*B ids, one scatter pass;
- the round-2 gatherbw finding: effective random-row gather bandwidth
  CLIFFS from 44 GB/s (v=100k, d=32) to 3.6 GB/s (v=1M, d=32) — the
  stacked table is 26x larger, so its gathers may sit on the wrong side
  of whatever capacity effect causes the cliff.

Whichever way it lands, the result decides the recommended default for
config 4/5 and is recorded in docs/PERF.md. Catches everything; exits 0.

Run via: python benchmarks/tpu_experiments.py --only stacked_ab
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import statistics
import sys
import time
import traceback

import jax


def main() -> int:
    try:
        sys.path.insert(0, ".")
        from bench import _stack, build_dcn_bench

        batch = int(_os.environ.get("STACKED_AB_BATCH", "8192"))
        d = int(_os.environ.get("STACKED_AB_DIM", "32"))
        k_small, k_big, reps, rounds = 4, 32, 2, 4
        if _os.environ.get("STACKED_AB_SMOKE"):  # CPU CI smoke: tiny Ks
            k_small, k_big, reps, rounds = 1, 2, 1, 2
        slots = {}
        for stacked in (False, True):
            step, state, batches, builder = build_dcn_bench(
                batch, "xla", d, stack_tables=stacked
            )
            fn = jax.jit(builder.multi_step, donate_argnums=(0,))
            for k in (k_small, k_big):
                kb = _stack(batches, k)
                st = builder.init_state(jax.random.PRNGKey(0))
                st, m = fn(st, kb)  # compile + warm
                float(m["loss"])
                slots[(stacked, k)] = [fn, st, kb, []]
        for _ in range(rounds):
            for key, slot in slots.items():
                fn, st, kb, times = slot
                t0 = time.perf_counter()
                for _ in range(reps):
                    st, m = fn(st, kb)
                    float(m["loss"])  # fetched: no elision
                times.append(time.perf_counter() - t0)
                slot[1] = st
        out = {}
        for stacked in (False, True):
            name = "stacked" if stacked else "per-field"
            t_small = statistics.median(slots[(stacked, k_small)][-1])
            t_big = statistics.median(slots[(stacked, k_big)][-1])
            t_step = max(t_big - t_small, 1e-12) / (reps * (k_big - k_small))
            rate = batch / t_step
            out[stacked] = rate
            print(
                f"stacked_ab {name}: {rate/1e6:.2f}M ex/s "
                f"({t_step*1e3:.2f} ms/step; blocks_small "
                f"{', '.join(f'{t:.3f}' for t in slots[(stacked, k_small)][-1])}; "
                f"blocks_big "
                f"{', '.join(f'{t:.3f}' for t in slots[(stacked, k_big)][-1])})",
                flush=True,
            )
        print(
            f"stacked_ab speedup stacked/per-field: "
            f"{out[True]/out[False]:.2f}x",
            flush=True,
        )
    except Exception:
        traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
