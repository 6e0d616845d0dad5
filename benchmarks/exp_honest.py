"""Honest-timing calibration.

The first roofline probe returned physically impossible numbers
(30k+ TFLOP/s), implying the remote terminal elides or caches repeated
identical dispatches. This probe forces real work three ways:

1. K dependent matmuls inside ONE jit (fori_loop) — the device must
   execute all K sequentially; per-matmul time = total / K.
2. Fresh random inputs each call (no repeat-dispatch caching) + value
   fetch (forces materialization).
3. The DCN train step re-timed with a per-step host fetch of the loss
   (lower bound on throughput; adds transfer latency).

Catches everything; exits 0.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    try:
        n, k = 4096, 32
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32)) * 1e-3
        b = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32)) * 1e-3

        @jax.jit
        def chain(x, w):
            def body(_, acc):
                return jnp.tanh(acc @ w)  # tanh keeps values bounded + unfusable

            return jax.lax.fori_loop(0, k, body, x)

        out = chain(a, b)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = chain(a, b)
        val = float(out[0, 0])  # value fetch: total materialization
        dt = time.perf_counter() - t0
        per_mm = dt / k
        flops = 2 * n**3
        print(f"chained {k}x matmul {n}^3 (one jit, value-fetched): "
              f"{per_mm*1e3:.3f} ms/matmul = {flops/per_mm/1e12:.1f} TFLOP/s "
              f"(val={val:.3e})", flush=True)

        # fresh inputs each dispatch + per-call value fetch
        ts = []
        for i in range(5):
            ai = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
            t0 = time.perf_counter()
            r = jax.jit(lambda x, y: x @ y)(ai, b)
            _ = float(r[0, 0])
            ts.append(time.perf_counter() - t0)
        t_best = min(ts)
        print(f"fresh-input matmul {n}^3 (value-fetched): {t_best*1e3:.2f} ms "
              f"= {flops/t_best/1e12:.1f} TFLOP/s", flush=True)

        # DCN step with per-step loss fetch
        import sys
        sys.path.insert(0, ".")
        from bench import build_dcn_bench

        step, state, batches, _ = build_dcn_bench(8192, "pallas", 128)
        for i in range(3):
            state, m = step(state, batches[i % len(batches)])
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        steps = 20
        for i in range(steps):
            state, m = step(state, batches[i % len(batches)])
            _ = float(m["loss"])  # host fetch every step
        dt = time.perf_counter() - t0
        print(f"DCN step with per-step loss fetch: "
              f"{dt/steps*1e3:.2f} ms/step = {steps*8192/dt/1e6:.2f}M examples/s",
              flush=True)

        # DCN async-dispatch timing (the original protocol) for comparison
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = step(state, batches[i % len(batches)])
        jax.block_until_ready(m["loss"])
        dt = time.perf_counter() - t0
        print(f"DCN step async protocol: {dt/steps*1e3:.2f} ms/step "
              f"= {steps*8192/dt/1e6:.2f}M examples/s", flush=True)
    except Exception:
        traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
