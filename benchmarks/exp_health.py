"""Fast session-health verdict (docs/PERF.md "Session health"): one
2026-08-17 session ran the whole experiment batch ~40x slow with a flat
~24 ms/dispatch floor, so every absolute number from a session is worthless
unless the session first reproduces a known-good rate.

Elision-proof chained-matmul slope: K-small vs K-big `lax.scan` where each
matmul's output feeds the next (cannot be elided), per-dispatch fetched.
A healthy v5e reaches >100 TFLOP/s bf16 on 4096^3; print HEALTHY if the
slope exceeds 30 TFLOP/s, THROTTLED otherwise. Run this FIRST in any batch
whose numbers may become baselines.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import statistics
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

THRESHOLD_TFLOPS = 30.0


def main() -> int:
    try:
        n = 4096
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))

        def chain(x, k):
            def body(c, _):
                c = jnp.dot(c, a, preferred_element_type=jnp.float32)
                c = c / (jnp.abs(c).max() + 1e-6)  # keep finite
                return c, None

            out, _ = jax.lax.scan(body, x, None, length=k)
            return out[0, 0]

        k_small, k_big, reps, rounds = 4, 64, 3, 3
        fns = {k: jax.jit(lambda x, k=k: chain(x, k)) for k in (k_small, k_big)}
        times = {k: [] for k in fns}
        for fn in fns.values():
            float(fn(a))  # compile + warm
        for _ in range(rounds):
            for k, fn in fns.items():
                t0 = time.perf_counter()
                for _ in range(reps):
                    float(fn(a))
                times[k].append(time.perf_counter() - t0)
        t_mm = (statistics.median(times[k_big]) - statistics.median(times[k_small])) / (
            reps * (k_big - k_small)
        )
        tflops = 2 * n**3 / max(t_mm, 1e-12) / 1e12
        verdict = "HEALTHY" if tflops >= THRESHOLD_TFLOPS else "THROTTLED"
        print(
            f"health: {t_mm*1e6:.0f} us per {n}^3 matmul = {tflops:.1f} "
            f"TFLOP/s (bf16 MXU path) -> {verdict}",
            flush=True,
        )
    except Exception:
        print("health: EXCEPTION -> treat session as UNHEALTHY", flush=True)
        traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
