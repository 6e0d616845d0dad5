"""Examples/s vs batch size for the real DCN step, same session.

step_ablate attribution (docs/PERF.md): the optimizer trio sweeps each
table's V lane-lines per step — a cost INDEPENDENT of batch size — and
the dedup sorts grow ~n log n. Larger batches therefore amortize the
fixed sweeps: this sweep measures where examples/s saturates (the
production batch-size knob for the R8 headline). Fetch-fenced slopes,
one session, interleaved ascending+descending to cancel drift.

BREAKDOWN_DIM selects embed_dim (default 32).
Run via: python benchmarks/tpu_experiments.py --only batch_sweep
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import traceback

import jax

D = int(_os.environ.get("BREAKDOWN_DIM", "32"))
BATCHES = tuple(
    int(b) for b in _os.environ.get(
        "SWEEP_BATCHES", "8192,16384,32768,65536"
    ).split(",")
)


def main() -> int:
    try:
        from bench import _stack, build_dcn_bench
        from exp_step_breakdown import _slope

        def make(b):
            _, state, batches, builder = build_dcn_bench(b, "xla", D)

            def stepk(args, k, _b=builder, _batches=batches):
                st, m = jax.lax.scan(
                    lambda s, bb: _b.step(s, bb), args, _stack(_batches, k)
                )
                return m["loss"][-1]

            return stepk, state

        # Ascending then descending: each batch size measured twice with
        # opposite drift exposure.
        for b in BATCHES + BATCHES[::-1]:
            stepk, state = make(b)
            t = _slope(stepk, state, f"batch_sweep b={b} d={D}")
            print(f"batch_sweep b={b}: {b / t:,.0f} examples/s", flush=True)
            del stepk, state
    except Exception:
        traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
