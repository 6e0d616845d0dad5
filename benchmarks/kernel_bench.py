"""Kernel microbenchmarks + roofline context (SURVEY.md §7 step 7).

MEASUREMENT CAVEAT: this uses repeat-dispatch timing, which the tunnel
terminal in this environment can elide/cache (physically impossible
rates observed — docs/PERF.md). Use benchmarks/exp_honest.py /
exp_ab.py patterns (fresh work + value fetches, interleaved blocks) for
trustworthy numbers; this script remains useful for relative smoke
comparisons on hardware that executes every dispatch.

Compares the Pallas kernels against their XLA reference paths on the
current backend, and reports achieved vs speed-of-light HBM bandwidth for
the bandwidth-bound ops (gather, cross stack). v5e reference numbers:
~819 GB/s HBM, ~197 bf16 TFLOP/s MXU.

Usage: python benchmarks/kernel_bench.py [--sizes small|full]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def _time(fn, *args, steps=20, warmup=3):
    """Per-call time with an elision-proof fence: every timed call fetches
    one scalar of its output (block_until_ready can return early on this
    relay — docs/PERF.md "The fence artifact"). Absolutes therefore
    include one host RTT per call; the xla-vs-pallas RATIOS this script
    exists for are unaffected (the RTT constant is common to both)."""
    import jax.numpy as jnp

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


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", default="small", choices=["small", "full"])
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tfrec_tpu.kernels.cross import cross_stack_xla
    from tfrec_tpu.kernels.cross_pallas import cross_stack_pallas
    from tfrec_tpu.kernels.gather_pallas import gather_pallas

    platform = jax.default_backend()
    if args.sizes == "full":
        v, d, n = 1_000_000, 128, 65_536
        b, cd, layers = 8192, 512, 3
    else:
        v, d, n = 10_000, 64, 4096
        b, cd, layers = 1024, 128, 3

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, v, n).astype(np.int32))
    take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    gp = jax.jit(gather_pallas)
    t_take = _time(take, table, ids)
    t_gp = _time(gp, table, ids)
    gather_bytes = n * d * 4 * 2  # read rows + write out

    x0 = jnp.asarray(rng.normal(size=(b, cd)).astype(np.float32))
    params = {
        "w": jnp.asarray(rng.normal(size=(layers, cd)).astype(np.float32)) / cd**0.5,
        "b": jnp.asarray(rng.normal(size=(layers, cd)).astype(np.float32)) * 0.1,
    }
    cx = jax.jit(lambda x, p: cross_stack_xla(x, p))
    cp = jax.jit(lambda x, p: cross_stack_pallas(x, p))
    t_cx = _time(cx, x0, params)
    t_cp = _time(cp, x0, params)
    cross_bytes = b * cd * 4 * 2  # fused ideal: read x0 once, write xL once

    hbm_gbs = 819.0 if platform == "tpu" else None
    report = {
        "platform": platform,
        "gather": {
            "n_rows": n, "dim": d,
            "xla_take_us": round(t_take * 1e6, 1),
            "pallas_us": round(t_gp * 1e6, 1),
            "speedup": round(t_take / t_gp, 3),
            "pallas_gbs": round(gather_bytes / t_gp / 1e9, 1),
            "pct_of_hbm_peak": round(100 * gather_bytes / t_gp / 1e9 / hbm_gbs, 1)
            if hbm_gbs else None,
        },
        "cross_stack": {
            "batch": b, "dim": cd, "layers": layers,
            "xla_us": round(t_cx * 1e6, 1),
            "pallas_us": round(t_cp * 1e6, 1),
            "speedup": round(t_cx / t_cp, 3),
            "pallas_gbs": round(cross_bytes / t_cp / 1e9, 1),
            "pct_of_hbm_peak": round(100 * cross_bytes / t_cp / 1e9 / hbm_gbs, 1)
            if hbm_gbs else None,
        },
        "note": "CPU numbers are interpret-mode (pallas) — only TPU numbers "
                "are meaningful" if platform != "tpu" else "",
    }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
