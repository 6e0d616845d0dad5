"""Chip calibration: pure-matmul FLOP/s (default and highest precision)
and HBM copy bandwidth. Grounds the examples/s numbers in measured
hardware ceilings rather than nominal specs. Catches everything; exit 0."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, steps=20, warmup=3):
    """Elision-proof: every timed call fetches one output scalar (this
    relay's block_until_ready can return early — docs/PERF.md "The fence
    artifact"; the free-run version of this very script is what first
    flagged impossible rates). Absolutes include one RTT per call, so the
    reported ceilings are LOWER bounds on the hardware ceiling."""

    def fetch(out):
        return float(jnp.ravel(out)[0])

    out = None
    for _ in range(warmup):
        out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        fetch(fn(*args))
    return (time.perf_counter() - t0) / steps


def main() -> int:
    try:
        n = 8192
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
        flops = 2 * n * n * n

        mm_def = jax.jit(lambda x, y: x @ y)
        t = _time(mm_def, a, b)
        print(f"matmul f32-in default-precision {n}^3: {t*1e3:.2f} ms "
              f"= {flops/t/1e12:.1f} TFLOP/s", flush=True)

        mm_hi = jax.jit(
            lambda x, y: jax.lax.dot(x, y, precision=jax.lax.Precision.HIGHEST)
        )
        t = _time(mm_hi, a, b)
        print(f"matmul f32 HIGHEST precision: {t*1e3:.2f} ms "
              f"= {flops/t/1e12:.1f} TFLOP/s", flush=True)

        ab = a.astype(jnp.bfloat16)
        bb = b.astype(jnp.bfloat16)
        mm_bf = jax.jit(lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32))
        t = _time(mm_bf, ab, bb)
        print(f"matmul bf16 inputs: {t*1e3:.2f} ms = {flops/t/1e12:.1f} TFLOP/s",
              flush=True)

        big = jnp.asarray(rng.normal(size=(512 * 1024 * 1024 // 4,)).astype(np.float32))
        cp = jax.jit(lambda x: x * 1.0000001)
        t = _time(cp, big, steps=10)
        bytes_moved = big.size * 4 * 2
        print(f"HBM stream (512MB rw): {t*1e3:.2f} ms = "
              f"{bytes_moved/t/1e9:.0f} GB/s", flush=True)

        # embedding-gather roofline: 8192 random rows of a [100k, 128] table
        table = jnp.asarray(rng.normal(size=(100_000, 128)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, 100_000, 8192).astype(np.int32))
        g_x = jax.jit(lambda t_, i_: jnp.take(t_, i_, axis=0))
        t = _time(g_x, table, ids)
        gb = 8192 * 128 * 4 * 2
        print(f"xla gather 8192x128: {t*1e6:.1f} us = {gb/t/1e9:.0f} GB/s", flush=True)
        from tfrec_tpu.kernels.gather_pallas import gather_pallas

        g_p = jax.jit(gather_pallas)
        t = _time(g_p, table, ids)
        print(f"pallas gather 8192x128: {t*1e6:.1f} us = {gb/t/1e9:.0f} GB/s",
              flush=True)
    except Exception:
        traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
