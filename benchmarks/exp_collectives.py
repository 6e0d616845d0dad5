"""Measured collective costs on the available chip(s) (VERDICT r1 item 6).

Grounds the docs/PERF.md multi-chip scaling model with MEASURED
coefficients instead of assumed bandwidths. On a 1-device mesh the
collectives are degenerate (no ICI traffic), so what this measures is the
per-op floor the model adds to the wire time: XLA op dispatch + the
HBM-copy component (all_to_all/all_gather on one device still move the
buffer). The fit t(bytes) = a + bytes/bw yields:
  a  — per-collective overhead floor (s)
  bw — effective on-chip copy bandwidth (B/s); ICI wire time at N>1 is
       modeled separately as volume * (N-1)/N / ici_bw with ici_bw from
       hardware specs, since no multi-chip link exists here to measure.

Interleaved blocks (A/B design), value-fetch fenced per block; catches
everything; exits 0.
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
from jax.sharding import Mesh, PartitionSpec as P


def main() -> int:
    try:
        devs = jax.devices()
        n = len(devs)
        mesh = Mesh(np.asarray(devs).reshape(n), ("data",))
        print(f"collectives: {n} device(s), {devs[0].platform}", flush=True)

        # [rows, 128] f32 arrays; rows scales the byte size.
        sizes_kb = [64, 256, 1024, 4096, 16384, 65536]
        ops = {}

        def mk(op_name):
            def a2a(x):
                return jax.lax.all_to_all(
                    x, "data", split_axis=0, concat_axis=0, tiled=True
                )

            def ag(x):
                return jax.lax.all_gather(x, "data", axis=0, tiled=True)

            def ps(x):
                return jax.lax.psum(x, "data")

            def copy(x):
                return x + 1.0  # non-collective baseline: launch + HBM rw

            body = {"all_to_all": a2a, "all_gather": ag, "psum": ps,
                    "copy": copy}[op_name]

            def fn(x):
                return jax.shard_map(
                    body, mesh=mesh, in_specs=P("data"),
                    out_specs=P() if op_name in ("psum", "all_gather") else P("data"),
                    check_vma=False,
                )(x)

            return jax.jit(fn)

        for op_name in ("copy", "psum", "all_gather", "all_to_all"):
            ops[op_name] = mk(op_name)

        results = {}
        for kb in sizes_kb:
            rows = max(kb * 1024 // (128 * 4), n)
            rows = -(-rows // n) * n
            x = jnp.asarray(
                np.random.default_rng(0).normal(size=(rows, 128)).astype(np.float32)
            )
            nbytes = rows * 128 * 4
            for op_name, fn in ops.items():  # compile
                jax.block_until_ready(fn(x))
            times = {k: [] for k in ops}
            reps = max(2, min(20, (4 << 20) // max(nbytes // 16, 1)))
            for _ in range(5):  # interleaved rounds
                for op_name, fn in ops.items():
                    t0 = time.perf_counter()
                    for _ in range(reps):
                        out = fn(x)
                    jax.block_until_ready(out)
                    times[op_name].append((time.perf_counter() - t0) / reps)
            results[nbytes] = {k: statistics.median(v) for k, v in times.items()}
            line = " ".join(
                f"{k}={v*1e6:.0f}us" for k, v in results[nbytes].items()
            )
            print(f"size={nbytes/1e6:.2f}MB reps={reps}: {line}", flush=True)

        # Linear fit t = a + bytes/bw per op (least squares over sizes).
        for op_name in ops:
            xs = np.array(sorted(results))
            ys = np.array([results[b][op_name] for b in xs])
            slope, floor = np.polyfit(xs.astype(np.float64), ys, 1)
            bw = 1.0 / slope if slope > 0 else float("inf")
            print(
                f"FIT {op_name}: floor={floor*1e6:.1f}us "
                f"bw={bw/1e9:.1f}GB/s", flush=True,
            )
    except Exception:
        print("collectives EXCEPTION:", flush=True)
        traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
