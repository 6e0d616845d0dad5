"""Decompose the post-hints sparse-update residue at REAL scale (26
tables), where the tunnel noise floor (~0.3-0.5 ms) is amplified 26x
into measurable signal.

After the sorted/unique scatter hints the d=32 DCN step is ~14.9 ms
with fwd+bwd+dense at 1.8 ms — the sparse path still costs ~13 ms.
Candidate splits per table: argsort machinery (~0.18 ms), hinted table
scatter-add, hinted acc take/set, and the segment-sum. Variants, each a
26-table chained-scan slope over fresh ids (V=100k, n=8192, D from
BREAKDOWN_DIM):

  sorts26       26 x (argsort + take ids) only
  combine26     26 x full combine_duplicate_ids (adds grad gather+segsum)
  sgd26         combine + ONE hinted scatter-add per table
  adagrad26     combine + hinted take/add/set per table (the prod path)
  adagrad26_grouped  grouped combine (1 batched sort) + per-table apply

Differences attribute each op class; `adagrad26` should reproduce the
step_ablate sparse residue. Catches everything; exits 0.

Run via: python benchmarks/tpu_experiments.py --only sparse_residue
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import traceback

import jax
import jax.numpy as jnp
import numpy as np

if _os.environ.get("BREAKDOWN_CPU"):
    jax.config.update("jax_platforms", "cpu")

D = int(_os.environ.get("BREAKDOWN_DIM", "32"))
N = int(_os.environ.get("BREAKDOWN_BATCH", "8192"))
V, F = 100_000, 26


def main() -> int:
    try:
        from exp_step_breakdown import _slope
        from tfrec_tpu.ops.embedding import (
            combine_duplicate_ids,
            combine_duplicate_ids_grouped,
        )
        from tfrec_tpu.ops.sparse_optim import make_sparse_optimizer

        rng = np.random.default_rng(0)
        tables0 = tuple(
            jnp.asarray(rng.normal(size=(V, D)).astype(np.float32) * 0.01)
            for _ in range(F)
        )
        accs0 = tuple(jnp.full((V,), 0.1, jnp.float32) for _ in range(F))
        ids0 = jnp.asarray(rng.integers(0, V, (F, N)).astype(np.int32))
        rows0 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
        opt = make_sparse_optimizer("rowwise_adagrad", adagrad_init=0.1)

        def fresh(ids, salt):
            return (ids * 1664525 + salt + 1013904223) % V

        def run_variant(name, body, state0):
            """body(state, ids [F,N]) -> (state, chain scalar)."""

            def fn(args, k):
                st, ids = args

                def step(carry, _):
                    st, ids = carry
                    st, chain = body(st, ids)
                    return (st, fresh(ids, chain.astype(jnp.int32) & 0xFF)), chain

                (st, ids), chains = jax.lax.scan(step, (st, ids), None, length=k)
                return chains[-1]

            _slope(fn, (state0, ids0), f"residue {name} d={D}")

        def body_sorts(st, ids):
            c = jnp.zeros((), jnp.float32)
            for f in range(F):
                order = jnp.argsort(ids[f])
                sids = jnp.take(ids[f], order)
                c = c + sids[0].astype(jnp.float32)
            return st, c

        run_variant("sorts26", body_sorts, ())

        def body_combine(st, ids):
            c = jnp.zeros((), jnp.float32)
            for f in range(F):
                uids, g = combine_duplicate_ids(ids[f], rows0, sentinel=V)
                c = c + g[0, 0] + uids[0].astype(jnp.float32)
            return st, c

        run_variant("combine26", body_combine, ())

        def body_sgd(tabs, ids):
            new = []
            for f in range(F):
                uids, g = combine_duplicate_ids(ids[f], rows0, sentinel=V)
                t2, _ = opt_sgd.apply_deduped(tabs[f], {}, uids, g, 0.01)
                new.append(t2)
            return tuple(new), new[0][0, 0]

        opt_sgd = make_sparse_optimizer("sgd")
        run_variant("sgd26", body_sgd, tables0)

        def body_adagrad(st, ids):
            tabs, accs = st
            nt, na = [], []
            for f in range(F):
                uids, g = combine_duplicate_ids(ids[f], rows0, sentinel=V)
                t2, s2 = opt.apply_deduped(tabs[f], {"acc": accs[f]}, uids, g, 0.01)
                nt.append(t2)
                na.append(s2["acc"])
            return (tuple(nt), tuple(na)), nt[0][0, 0]

        run_variant("adagrad26", body_adagrad, (tables0, accs0))

        def body_adagrad_grouped(st, ids):
            tabs, accs = st
            g_st = jnp.broadcast_to(rows0, (F,) + rows0.shape)
            uids, comb = combine_duplicate_ids_grouped(ids, g_st, [V] * F)
            nt, na = [], []
            for f in range(F):
                t2, s2 = opt.apply_deduped(
                    tabs[f], {"acc": accs[f]}, uids[f], comb[f], 0.01
                )
                nt.append(t2)
                na.append(s2["acc"])
            return (tuple(nt), tuple(na)), nt[0][0, 0]

        run_variant("adagrad26_grouped", body_adagrad_grouped, (tables0, accs0))
    except Exception:
        traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
