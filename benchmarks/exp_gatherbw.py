"""Effective HBM bandwidth of the embedding row gather at d in {32, 128}
(the flagship config-4 shape is d=32 — VERDICT r1 weak-3 follow-up).

The streaming-peak HBM number (819 GB/s) overestimates what scattered
row reads can reach: a random d=32 row is a 128 B read against a much
larger HBM transaction granule, so the EFFECTIVE gather bandwidth — not
the MXU — is the binding bound for the d=32 train step. This experiment
measures it directly: chained fetched gathers (elision-proof slope
design: K-small vs K-big `lax.scan` where each gather's result perturbs
the next iteration's ids, so no two gathers are identical and the chain
cannot be elided), reporting effective GB/s counting only useful bytes
(N x D x 4).

Run via: python benchmarks/tpu_experiments.py --only gatherbw
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


def _slope_gather(v: int, d: int, n: int, k_small=4, k_big=64, reps=3,
                  rounds=3, gather=None):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    ids0 = jnp.asarray(rng.integers(0, v, n).astype(np.int32))
    if gather is None:
        gather = lambda t, i: jnp.take(t, i, axis=0, mode="clip")

    def multi(table, ids0, k):
        def body(ids, _):
            rows = gather(table, ids)
            # Data-dependent next ids: the sum of each row perturbs the id
            # (mod v), chaining the gathers so none can be elided.
            nxt = (ids + (rows.sum(axis=1).astype(jnp.int32) & 0x7) + 1) % v
            return nxt, rows[0, 0]

        ids, last = jax.lax.scan(body, ids0, None, length=k)
        return last.sum()

    fns = {
        k: jax.jit(lambda t, i, k=k: multi(t, i, k)) for k in (k_small, k_big)
    }
    times = {k: [] for k in fns}
    for k, fn in fns.items():  # compile+warm
        float(fn(table, ids0))
    for _ in range(rounds):
        for k, fn in fns.items():
            t0 = time.perf_counter()
            for _ in range(reps):
                float(fn(table, ids0))
            times[k].append(time.perf_counter() - t0)
    t_step = (statistics.median(times[k_big]) - statistics.median(times[k_small])) / (
        reps * (k_big - k_small)
    )
    useful = n * d * 4
    return t_step, useful / max(t_step, 1e-12)


def main() -> int:
    print(f"gatherbw: backend={jax.default_backend()}", flush=True)
    smoke = bool(_os.environ.get("GATHERBW_SMOKE"))  # CPU CI smoke
    shapes = ((100_000, 32, 26 * 8192), (100_000, 128, 26 * 8192),
              (1_000_000, 32, 26 * 8192), (1_000_000, 128, 26 * 8192))
    if smoke:
        shapes = ((1000, 32, 256),)
    for v, d, n in shapes:
        try:
            t, bw = _slope_gather(v, d, n)
            print(
                f"gather v={v} d={d} n={n}: {t*1e6:.0f} us/gather, "
                f"effective {bw/1e9:.1f} GB/s (useful bytes only)",
                flush=True,
            )
        except Exception:
            print(f"gather v={v} d={d}: EXCEPTION", flush=True)
            traceback.print_exc()

    # Strategy variants at the measured cliff point (v=1M, d=32 ran at
    # 3.6 GB/s effective vs 44 GB/s at v=100k — 2026-08-17): can sorting
    # the ids (locality) or the packed Pallas group-row gather recover the
    # bandwidth? Interleaved per-variant slopes in this one session.
    _os.environ["TFREC_PACK_SUBDIM"] = "1"
    from tfrec_tpu.kernels.gather_pallas import gather_pallas

    def take(t, i):
        return jnp.take(t, i, axis=0, mode="clip")

    def take_sorted(t, i):
        # Full cost of the locality transform: sort, gather, un-permute.
        order = jnp.argsort(i)
        rows = jnp.take(t, i[order], axis=0, mode="clip")
        inv = jnp.argsort(order)
        return jnp.take(rows, inv, axis=0)

    def take_packed(t, i):
        # Pure-XLA packed-view gather: a [V, D<128] table viewed as
        # [V/p, 128] (free — row-major reshape), gather full 128-lane
        # rows at ids//p, select the D-lane sub-row ids%p on the VPU.
        # Trades 128/D x fetch volume for 128-byte-row DMA efficiency —
        # the cliff is per-row latency-bound, so this should win when
        # 128/D x useful bytes still beats the narrow-row rate.
        vv, dd = t.shape
        p = 128 // dd
        packed = t.reshape(vv // p, p * dd)
        rows = jnp.take(packed, i // p, axis=0, mode="clip")
        return jnp.take_along_axis(
            rows.reshape(i.shape[0], p, dd), (i % p)[:, None, None], axis=1
        )[:, 0]

    variants = {"take": take, "take_sorted": take_sorted,
                "take_packed": take_packed, "packed_pallas": gather_pallas}
    cliff_shapes = (
        ((1000, 32, 256),) if smoke
        else ((1_000_000, 32, 26 * 8192), (1_000_000, 64, 26 * 8192))
    )
    for v, d, n in cliff_shapes:
        for name, fn in variants.items():
            if name == "packed_pallas" and d != 32:
                continue
            try:
                t, bw = _slope_gather(v, d, n, gather=fn)
                print(
                    f"gather-variant {name} v={v} d={d}: {t*1e6:.0f} us, "
                    f"effective {bw/1e9:.1f} GB/s",
                    flush=True,
                )
            except Exception:
                print(f"gather-variant {name} v={v} d={d}: EXCEPTION", flush=True)
                traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
