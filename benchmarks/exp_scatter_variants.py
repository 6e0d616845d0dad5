"""Attack the step's real bottleneck: the table-update scatters.

step_ablate attribution (strict slopes, 2026-08-17): of the ~23-25 ms
DCN step, fwd+bwd+dense is only 2-5 ms; 26 raw `.at[ids].add` scatters
cost ~14-15 ms (~0.58 ms each — consistent with XLA lowering scatter as
a serial per-index row loop) and the dedup machinery ~6 ms. So the
lever is the scatter, not the sort.

Hypothesis: `combine_duplicate_ids` returns uids that are globally
SORTED (unique ids ascending, then sentinel = vocab repeated), so the
final scatters qualify for XLA's `indices_are_sorted` (+`unique_indices`
for the real prefix; duplicate sentinels are out-of-bounds and dropped,
so no two surviving writes collide). If the hints move the scatter off
the serial path this is a ~2x whole-step win for one line of code.

Variants (ONE table, V=100k, n=8192 fresh ids per scan iter; multiply
by 26 for the step):

  combine_only        sort+segsum machinery, scatter-free (the baseline
                      to difference against)
  combine_add         + table.at[uids].add(-g) — today's sgd shape
  combine_add_sort    + indices_are_sorted=True
  combine_add_both    + indices_are_sorted=True, unique_indices=True
  adagrad             current opt.apply (2 scatters + take)
  adagrad_hints       same math, hinted scatters/take
  pallas_fused        combine + fused_rowwise_adagrad (D%128==0 only)

Each variant checks bit-equality of its final table against the
unhinted reference before timing (a wrong-hint miscompile would show up
here). Catches everything; exits 0. BREAKDOWN_DIM selects D.

Run via: python benchmarks/tpu_experiments.py --only scatter_variants
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
V = 100_000


def main() -> int:
    try:
        from exp_step_breakdown import _slope
        from tfrec_tpu.ops.embedding import combine_duplicate_ids

        rng = np.random.default_rng(0)
        table0 = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32) * 0.01)
        acc0 = jnp.full((V,), 0.1, jnp.float32)
        ids0 = jnp.asarray(rng.integers(0, V, (N,)).astype(np.int32))
        rows0 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))

        def fresh_ids(ids, salt):
            return (ids * 1664525 + salt + 1013904223) % V

        def _chained(new_table):
            # Chain through the written table so scan cannot DCE the scatter.
            return new_table, new_table[0, 0]

        def run_variant(name, body, state0):
            """body(state, uids, g) -> (state, chain_scalar)."""

            def fn(args, k):
                st, ids = args

                def step(carry, _):
                    st, ids = carry
                    uids, g = combine_duplicate_ids(ids, rows0, sentinel=V)
                    st, chain = body(st, uids, g)
                    ids = fresh_ids(ids, chain.astype(jnp.int32) & 0xFF)
                    return (st, ids), chain

                (st, ids), chains = jax.lax.scan(
                    step, (st, ids), None, length=k
                )
                return chains[-1]

            _slope(fn, (state0, ids0), f"scatter {name} d={D}")

        # ---- equivalence gates (one application, vs unhinted reference) ----
        uids, g = jax.jit(
            lambda i, r: combine_duplicate_ids(i, r, sentinel=V)
        )(ids0, rows0)
        ref_add = jax.jit(lambda t: t.at[uids].add(-0.01 * g, mode="drop"))(table0)
        hint_add = jax.jit(
            lambda t: t.at[uids].add(
                -0.01 * g, mode="drop", indices_are_sorted=True,
                unique_indices=True,
            )
        )(table0)
        eq = bool(jnp.all(ref_add == hint_add))
        print(f"equiv add hints == plain: {eq}", flush=True)

        from tfrec_tpu.ops.sparse_optim import make_sparse_optimizer

        opt = make_sparse_optimizer("rowwise_adagrad", adagrad_init=0.1)

        def adagrad_hinted(table, acc, uids, g, lr, eps=1e-8):
            g2 = jnp.sum(g * g, axis=-1) / g.shape[-1]
            acc_rows = (
                jnp.take(acc, uids, mode="fill", fill_value=1.0,
                         indices_are_sorted=True) + g2
            )
            scale = lr / (jnp.sqrt(acc_rows) + eps)
            new_table = table.at[uids].add(
                -scale[:, None] * g, mode="drop",
                indices_are_sorted=True, unique_indices=True,
            )
            new_acc = acc.at[uids].set(
                acc_rows, mode="drop",
                indices_are_sorted=True, unique_indices=True,
            )
            return new_table, new_acc

        rt, rs = jax.jit(
            lambda t, a: opt.apply_deduped(t, {"acc": a}, uids, g, 0.01)
        )(table0, acc0)
        ht, ha = jax.jit(
            lambda t, a: adagrad_hinted(t, a, uids, g, 0.01, opt.eps)
        )(table0, acc0)
        eq2 = bool(jnp.all(rt == ht)) and bool(jnp.all(rs["acc"] == ha))
        print(f"equiv adagrad hints == plain: {eq2}", flush=True)

        # ---- slopes ----
        run_variant(
            "combine_only",
            lambda t, uids, g: (t, g[0, 0] + uids[0].astype(jnp.float32)),
            table0,
        )
        run_variant(
            "combine_add",
            lambda t, uids, g: _chained(
                t.at[uids].add(-0.01 * g, mode="drop")
            ),
            table0,
        )
        run_variant(
            "combine_add_sort",
            lambda t, uids, g: _chained(
                t.at[uids].add(-0.01 * g, mode="drop", indices_are_sorted=True)
            ),
            table0,
        )
        run_variant(
            "combine_add_both",
            lambda t, uids, g: _chained(
                t.at[uids].add(
                    -0.01 * g, mode="drop", indices_are_sorted=True,
                    unique_indices=True,
                )
            ),
            table0,
        )

        def body_adagrad(st, uids, g):
            t, a = st
            nt, ns = opt.apply_deduped(t, {"acc": a}, uids, g, 0.01)
            return (nt, ns["acc"]), nt[0, 0]

        run_variant("adagrad", body_adagrad, (table0, acc0))

        def body_adagrad_hints(st, uids, g):
            t, a = st
            nt, na = adagrad_hinted(t, a, uids, g, 0.01, opt.eps)
            return (nt, na), nt[0, 0]

        run_variant("adagrad_hints", body_adagrad_hints, (table0, acc0))

        # ---- packed-reshape scatter: same bytes, full 128-lane rows ----
        # Theory (step_ablate_parts 2026-08-17): the hinted scatter sweeps
        # the table footprint, and at D=32 the sweep runs at quarter lane
        # rate. [V, D] -> [V/G, 128] is the SAME row-major memory (free
        # reshape); packing each update row into its lane quarter and
        # summing quarters that share a packed row (exact: unique uids ->
        # disjoint lanes, additions with zeros) makes the sweep full-width.
        if D < 128 and 128 % D == 0 and V % (128 // D) == 0:
            G = 128 // D

            def adagrad_packed(table, acc, uids, g, lr, eps=1e-8):
                n = g.shape[0]
                g2 = jnp.sum(g * g, axis=-1) / g.shape[-1]
                acc_rows = (
                    jnp.take(acc, uids, mode="fill", fill_value=1.0,
                             indices_are_sorted=True) + g2
                )
                scale = lr / (jnp.sqrt(acc_rows) + eps)
                upd = -scale[:, None] * g  # [N, D]
                pid = uids // G  # nondecreasing (uids ascending)
                q = uids % G
                upd128 = (
                    jax.nn.one_hot(q, G, dtype=g.dtype)[:, :, None]
                    * upd[:, None, :]
                ).reshape(n, G * D)
                starts = jnp.concatenate(
                    [jnp.ones((1,), jnp.int32),
                     (pid[1:] != pid[:-1]).astype(jnp.int32)]
                )
                seg = jnp.cumsum(starts) - 1
                upd128c = jax.ops.segment_sum(
                    upd128, seg, num_segments=n, indices_are_sorted=True
                )
                vp = table.shape[0] // G
                pidc = jnp.full((n,), vp, pid.dtype).at[seg].set(pid)
                t2 = table.reshape(vp, G * D).at[pidc].add(
                    upd128c, mode="drop", indices_are_sorted=True,
                    unique_indices=True,
                )
                new_acc = acc.at[uids].set(
                    acc_rows, mode="drop", indices_are_sorted=True,
                    unique_indices=True,
                )
                return t2.reshape(table.shape), new_acc

            pt, pa = jax.jit(
                lambda t, a: adagrad_packed(t, a, uids, g, 0.01, opt.eps)
            )(table0, acc0)
            eq3 = bool(jnp.all(rt == pt)) and bool(jnp.all(rs["acc"] == pa))
            print(f"equiv adagrad packed == plain: {eq3}", flush=True)

            def body_adagrad_packed(st, uids, g):
                t, a = st
                nt, na = adagrad_packed(t, a, uids, g, 0.01, opt.eps)
                return (nt, na), nt[0, 0]

            run_variant("adagrad_packed", body_adagrad_packed, (table0, acc0))

        if D % 128 == 0:
            from tfrec_tpu.kernels.scatter_pallas import fused_rowwise_adagrad

            def body_pallas(st, uids, g):
                t, a = st
                nt, na = fused_rowwise_adagrad(t, a, uids, g, 0.01, opt.eps)
                return (nt, na), nt[0, 0]

            run_variant("pallas_fused", body_pallas, (table0, acc0))
    except Exception:
        traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
