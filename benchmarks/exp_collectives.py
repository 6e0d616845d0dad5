"""Measured collective costs on the available chip(s) (VERDICT r1 item 6).

Grounds the docs/PERF.md multi-chip scaling model with MEASURED
coefficients instead of assumed bandwidths. On a 1-device mesh the
collectives are degenerate (no ICI traffic), so what this measures is the
per-op floor the model adds to the wire time: XLA op dispatch + the
HBM-copy component (all_to_all on one device still moves the buffer).
The fit t(bytes) = a + bytes/bw yields:
  a  — per-collective overhead floor (s)
  bw — effective on-chip copy bandwidth (B/s); ICI wire time at N>1 is
       modeled separately as volume * (N-1)/N / ici_bw with ici_bw from
       hardware specs, since no multi-chip link exists here to measure.

Round-3 protocol: the round-2 version free-ran reps and fenced with one
block_until_ready — exactly the fence-artifact class docs/PERF.md
documents. Each measurement is now a fetch-fenced SLOPE over chained
in-program iterations (lax.fori_loop of the data-dependent op, K-small
vs K-big), so neither elision nor the tunnel RTT can contaminate the
per-op time. Catches everything; exits 0.
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
        K_SMALL, K_BIG = 4, 32

        def mk(op_name, k):
            """One dispatch = K chained, data-dependent op applications
            inside shard_map (shape-preserving bodies so the chain is a
            pure fori_loop); returns a scalar the host fetches."""

            def a2a(x):
                return jax.lax.all_to_all(
                    x, "data", split_axis=0, concat_axis=0, tiled=True
                )

            def ag(x):
                g = jax.lax.all_gather(x, "data", axis=0, tiled=True)
                return g[: x.shape[0]]  # restore the local shape to chain

            def ps(x):
                return jax.lax.psum(x, "data") * (1.0 / n)

            def copy(x):
                return x + 1.0  # non-collective baseline: launch + HBM rw

            body = {"all_to_all": a2a, "all_gather": ag, "psum": ps,
                    "copy": copy}[op_name]

            def chained(x):
                def inner(i, acc):
                    # The i-dependent nudge makes every iteration's input
                    # unique; the result feeds the next (no elision/CSE).
                    return body(acc + i * 1e-30)

                out = jax.lax.fori_loop(0, k, inner, x)
                return out[0, 0]

            def fn(x):
                return jax.shard_map(
                    chained, mesh=mesh, in_specs=P("data"), out_specs=P(),
                    check_vma=False,
                )(x)

            return jax.jit(fn)

        op_names = ("copy", "psum", "all_gather", "all_to_all")
        results = {}
        for kb in sizes_kb:
            rows = max(kb * 1024 // (128 * 4), n)
            rows = -(-rows // n) * n
            x = jnp.asarray(
                np.random.default_rng(0).normal(size=(rows, 128)).astype(np.float32)
            )
            nbytes = rows * 128 * 4
            fns = {
                (name, k): mk(name, k)
                for name in op_names for k in (K_SMALL, K_BIG)
            }
            for f in fns.values():  # compile + warm, fetched
                float(f(x))
            times = {key: [] for key in fns}
            for _ in range(5):  # interleaved rounds, every dispatch fetched
                for key, f in fns.items():
                    t0 = time.perf_counter()
                    float(f(x))
                    times[key].append(time.perf_counter() - t0)
            results[nbytes] = {}
            for name in op_names:
                t_small = min(times[(name, K_SMALL)])
                t_big = min(times[(name, K_BIG)])
                per_op = max(t_big - t_small, 0.0) / (K_BIG - K_SMALL)
                results[nbytes][name] = per_op
            line = " ".join(
                f"{k}={v*1e6:.0f}us" for k, v in results[nbytes].items()
            )
            print(f"size={nbytes/1e6:.2f}MB slope(K={K_SMALL}->{K_BIG}): {line}",
                  flush=True)

        # Linear fit t = a + bytes/bw per op (least squares over sizes).
        for name in op_names:
            xs = np.array(sorted(results))
            ys = np.array([results[b][name] for b in xs])
            slope, floor = np.polyfit(xs.astype(np.float64), ys, 1)
            bw = 1.0 / slope if slope > 0 else float("inf")
            print(
                f"FIT {name}: floor={floor*1e6:.1f}us "
                f"bw={bw/1e9:.1f}GB/s", flush=True,
            )
    except Exception:
        print("collectives EXCEPTION:", flush=True)
        traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
