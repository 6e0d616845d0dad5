"""Attribute the DCN train step's ~24 ms (strict slope, docs/PERF.md):
which phase binds — per-table gathers, the 26 sorted dedups, forward+
backward, or the sparse update?

Each probe is an isolated chained-scan slope (per-dispatch value fetch,
K-small/K-big pair — nothing elidable) over the exact bench shapes
(b=8192, 26 fields x 100k vocab). Probes:

  full_step    the real jitted step (reference)
  gather26     26 per-table takes of 8192 random ids (data-chained)
  dedup26      26 x combine_duplicate_ids (sort + segment-sum) on 8192 ids
  sort1        ONE jnp.sort over the concatenated 26*8192 ids (what a
               fused cross-table dedup would cost)
  fwd_bwd      lookup + forward + backward (grads materialized), no update
  update26     26 x rowwise-adagrad sparse applies on pre-deduped ids

full_step ~= fwd_bwd + update26 + (dedup is inside update's combine);
gather26/dedup26/sort1 size the candidate optimizations. Catches
everything; exits 0.

Run via: python benchmarks/tpu_experiments.py --only step_breakdown
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import statistics
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

D = int(_os.environ.get("BREAKDOWN_DIM", "32"))
B = int(_os.environ.get("BREAKDOWN_BATCH", "8192"))
V, F = 100_000, 26
SMOKE = bool(_os.environ.get("BREAKDOWN_SMOKE"))
K_PAIR = (1, 2) if SMOKE else (4, 32)
REPS, ROUNDS = (1, 2) if SMOKE else (2, 3)


def _slope(fn, args, work_desc):
    """fn(args, k) -> scalar; returns per-unit seconds via the K-pair slope."""
    k_small, k_big = K_PAIR
    fns = {k: jax.jit(lambda a, k=k: fn(a, k)) for k in K_PAIR}
    for f in fns.values():
        float(f(args))
    times = {k: [] for k in K_PAIR}
    for _ in range(ROUNDS):
        for k, f in fns.items():
            t0 = time.perf_counter()
            for _ in range(REPS):
                float(f(args))
            times[k].append(time.perf_counter() - t0)
    t = (statistics.median(times[k_big]) - statistics.median(times[k_small])) / (
        REPS * (k_big - k_small)
    )
    print(f"breakdown {work_desc}: {t*1e3:.2f} ms/iter", flush=True)
    return t


def main() -> int:
    try:
        rng = np.random.default_rng(0)
        tables = [
            jnp.asarray(rng.normal(size=(V, D)).astype(np.float32) * 0.01)
            for _ in range(F)
        ]
        ids0 = jnp.asarray(rng.integers(0, V, (F, B)).astype(np.int32))
        grads0 = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

        # -- gather26 (tables threaded as args: a 333MB closure constant
        # would bloat the compile payload — CLAUDE.md bug class) --
        def gather26(args, k):
            tabs, ids_init = args

            def body(ids, _):
                s = jnp.zeros((B,), jnp.float32)
                for f in range(F):
                    rows = jnp.take(tabs[f], ids[f], axis=0, mode="clip")
                    s = s + rows.sum(axis=1)
                nxt = (ids + (s.astype(jnp.int32) & 0x7)[None, :] + 1) % V
                return nxt, s[0]

            ids, last = jax.lax.scan(body, ids_init, None, length=k)
            return last.sum()

        _slope(gather26, (tables, ids0), f"gather26 d={D}")

        # -- dedup26 --
        from tfrec_tpu.ops.embedding import combine_duplicate_ids

        def dedup26(args, k):
            ids_init = args

            def body(ids, _):
                s = jnp.zeros((), jnp.float32)
                for f in range(F):
                    uids, g = combine_duplicate_ids(ids[f], grads0, sentinel=V)
                    s = s + g[0, 0] + uids[0].astype(jnp.float32)
                nxt = (ids + (s.astype(jnp.int32) & 0x7) + 1) % V
                return nxt, s

            ids, last = jax.lax.scan(body, ids_init, None, length=k)
            return last.sum()

        _slope(dedup26, ids0, "dedup26 (sort+segsum per table)")

        # -- sort1: one sort over the concatenated ids --
        def sort1(args, k):
            ids_init = args

            def body(ids, _):
                flat = ids.reshape(-1)
                srt = jnp.sort(flat)
                nxt = (ids + (srt[0] & 0x7) + 1) % V
                return nxt, srt[0].astype(jnp.float32)

            ids, last = jax.lax.scan(body, ids_init, None, length=k)
            return last.sum()

        _slope(sort1, ids0, f"sort1 ({F*B} ids)")

        # -- update26: sparse adagrad applies on pre-deduped ids --
        from tfrec_tpu.ops.sparse_optim import make_sparse_optimizer

        opt = make_sparse_optimizer("rowwise_adagrad", adagrad_init=0.05)
        states = [opt.init(t) for t in tables]

        def update26(args, k):
            tabs, sts = args

            def body(carry, _):
                tabs, sts = carry
                new_t, new_s = [], []
                for f in range(F):
                    t2, s2 = opt.apply(tabs[f], sts[f], ids0[f], grads0, 0.01)
                    new_t.append(t2)
                    new_s.append(s2)
                return (new_t, new_s), new_t[0][0, 0]

            (tabs, sts), last = jax.lax.scan(body, (tabs, sts), None, length=k)
            return last.sum()

        _slope(update26, (tables, states), "update26 (rowwise adagrad incl dedup)")

        # -- full step + fwd_bwd via the bench builder --
        sys.path.insert(0, ".")
        from bench import _stack, build_dcn_bench

        step, state, batches, builder = build_dcn_bench(B, "xla", D)

        def full_step(args, k):
            st = args
            st, m = jax.lax.scan(lambda s, b: builder.step(s, b), st,
                                 _stack(batches, k))
            return m["loss"][-1]

        _slope(full_step, state, f"full_step d={D}")

        def fwd_bwd(args, k):
            st = args

            def body(carry, batch):
                ids = builder.model.lookup_ids(batch)
                gathered, _ = builder.lookup(st["tables"], ids)

                def objective(dense, g):
                    logits = builder.model.forward(dense, g, batch, rng=None)
                    return builder.loss_fn(logits, batch)

                loss, (dg, gg) = jax.value_and_grad(objective, (0, 1))(
                    st["dense"], gathered
                )
                # chain: perturb carry with the loss so scan can't elide
                return carry + loss * 1e-9, loss

            c, losses = jax.lax.scan(body, jnp.zeros(()), _stack(batches, k))
            return losses[-1] + c

        _slope(fwd_bwd, state, "fwd_bwd (lookup+grads, no update)")
    except Exception:
        traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
