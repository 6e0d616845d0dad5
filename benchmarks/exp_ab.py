"""Interleaved A/B benchmark: xla vs pallas DCN step in ONE session.

Session-to-session throughput varies ±40% on this tunnel, so cross-window
comparisons are noise. This probe alternates timed blocks of the two
step variants (A B A B A B) inside one process and reports per-variant
medians. Round-3 fencing fix: every timed step fetches its loss
(block_until_ready can return early on this relay — docs/PERF.md "The
fence artifact"), so the reported absolute rates include one host RTT
per step; the A/B RATIO stays valid (the RTT constant is common to both
arms). For RTT-free absolutes use the slope protocol
(exp_step_ablate / bench.py). Catches everything; exits 0.
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
        from bench import build_dcn_bench

        batch, d = 8192, 128
        variants = {}
        for name in ("xla", "pallas"):
            step, state, batches, _ = build_dcn_bench(batch, name, d)
            # warmup/compile
            for i in range(3):
                state, m = step(state, batches[i % len(batches)])
            float(m["loss"])
            variants[name] = [step, state, batches, []]

        rounds, steps_per_block = 5, 10
        for r in range(rounds):
            for name, slot in variants.items():
                step, state, batches, times = slot
                t0 = time.perf_counter()
                for i in range(steps_per_block):
                    state, m = step(state, batches[i % len(batches)])
                    float(m["loss"])  # elision-proof fence per step
                dt = time.perf_counter() - t0
                slot[1] = state
                times.append(steps_per_block * batch / dt)
        for name, (_, _, _, times) in variants.items():
            med = statistics.median(times)
            print(f"AB {name}: median {med/1e6:.2f}M ex/s "
                  f"(blocks: {', '.join(f'{t/1e6:.1f}' for t in times)})",
                  flush=True)
    except Exception:
        traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
