"""Ablate the REAL DCN bench step to attribute its per-step time.

exp_step_breakdown's isolated probes undercount two ways: its fwd_bwd
probe only consumed the loss (XLA DCE'd the whole backward) and its
update26 probe used loop-invariant ids (XLA hoisted the sorts out of the
scan). This experiment instead measures variants of the actual
builder.step, each a full chained-scan slope:

  pertable     group_dedup=False — the round-1 default (26 per-table sorts)
  grouped      group_dedup=True  — ONE batched sort for all 26 tables
  raw_scatter  sparse update without dedup: table.at[ids].add(-lr*g)
               (duplicates accumulate — perf bound only, wrong math)
  no_sparse    grads consumed by a 1-row scatter per table (backward and
               dense update run; sparse path ~free)
  dedup_only   combine_duplicate_ids runs per table, but its outputs are
               consumed by a 1-row scatter (isolates the in-situ sort+
               segsum cost; optimizer trio skipped — wrong math)
  trio_arange  the optimizer trio (take acc + scatter-add table + scatter
               acc) runs on STATIC sorted-unique ids (iota), combine
               skipped (isolates the in-situ trio cost — wrong math)

Attribution: sparse total = pertable - no_sparse; dedup sorts =
pertable - raw_scatter; grouped win = pertable - grouped. Catches
everything; exits 0. BREAKDOWN_DIM selects embed_dim (default 32).

Run via: python benchmarks/tpu_experiments.py --only step_ablate
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import traceback

import jax

if _os.environ.get("BREAKDOWN_CPU"):
    # The env-var route (JAX_PLATFORMS=cpu) can hang under the axon
    # sitecustomize (CLAUDE.md gotcha #1); this is the sanctioned way.
    jax.config.update("jax_platforms", "cpu")

D = int(_os.environ.get("BREAKDOWN_DIM", "32"))
B = int(_os.environ.get("BREAKDOWN_BATCH", "8192"))


def _variant_builder(variant: str):
    """A fresh bench builder with the variant's sparse path patched in."""
    import bench
    import tfrec_tpu.ops.sparse_optim as _so

    # Every variant starts from the env-derived packed-scatter default
    # (a prior packed_on/packed_off variant must not leak forward — the
    # flag is read at trace time).
    _so._PACKED_SCATTER = _os.environ.get("TFREC_PACKED_SCATTER", "0") == "1"

    # "lanepack" / "lanepack_<suffix>" compose the packed layout with any
    # suffix variant below ("lanepack" alone = the packed real step).
    # 128/d fields per physical table: P-fold fewer optimizer sweeps
    # (the dominant, dim-independent sparse-path term) and P-fold fewer
    # dedup sorts, each P-fold larger. Exact per-table math
    # (tests/test_lane_pack.py); models/ctr_base.enable_lane_packing.
    packed = variant.startswith("lanepack")
    _, state, batches, builder = bench.build_dcn_bench(
        B, "xla", D, lane_pack=packed,
        host_dedup=variant.endswith("hostdedup"),
    )
    if packed:
        variant = variant[len("lanepack_"):] or "pertable"
    if variant == "hostdedup":
        # Host-precomputed dedup sorts ride in the batch ("_sort_<t>"
        # keys, train.host_dedup); the step skips its device argsorts.
        builder.group_dedup = False
    elif variant == "pertable":
        builder.group_dedup = False
    elif variant == "flat":
        # ONE keyed sort over disjoint per-table ranges
        # (combine_duplicate_ids_multi), statically sliced back.
        builder.group_dedup = "flat"
    elif variant == "dedup_only_flat":
        import jax.numpy as jnp

        from tfrec_tpu.ops.embedding import combine_duplicate_ids_multi

        def sparse_update_all(state, ids, grads, lr, _b=builder):
            new_tables = dict(state["tables"])
            new_sparse = dict(state["sparse_opt"])
            names = [n for n in grads]
            sentinels = [state["tables"][n].shape[0] for n in names]
            uids, comb = combine_duplicate_ids_multi(
                [ids[n] for n in names], [grads[n] for n in names], sentinels
            )
            for i, name in enumerate(names):
                new_tables[name] = new_tables[name].at[:1].add(
                    comb[i, :1] * 1e-30 + uids[i, 0] * 1e-30
                )
            return new_tables, new_sparse

        builder.sparse_update_all = sparse_update_all
    elif variant in ("pertable_packed_off", "pertable_packed_on"):
        # A/B partners for pertable: force the packed-reshape scatter-add
        # lowering off/on (tracing reads the module global, so this takes
        # effect at this variant's first jit call).
        import tfrec_tpu.ops.sparse_optim as so

        so._PACKED_SCATTER = variant.endswith("_on")
        builder.group_dedup = False
    elif variant == "grouped":
        builder.group_dedup = True
    elif variant == "raw_scatter":

        def sparse_update_all(state, ids, grads, lr, _b=builder):
            new_tables = dict(state["tables"])
            new_sparse = dict(state["sparse_opt"])
            for name, g in grads.items():
                new_tables[name] = new_tables[name].at[ids[name]].add(
                    -lr * g, mode="drop"
                )
            return new_tables, new_sparse

        builder.sparse_update_all = sparse_update_all
    elif variant == "no_sparse":

        def sparse_update_all(state, ids, grads, lr, _b=builder):
            new_tables = dict(state["tables"])
            new_sparse = dict(state["sparse_opt"])
            for name, g in grads.items():
                # Consume the gradient (keeps the backward alive against
                # DCE) at negligible scatter cost.
                new_tables[name] = new_tables[name].at[:1].add(g[:1] * 1e-30)
            return new_tables, new_sparse

        builder.sparse_update_all = sparse_update_all
    elif variant == "dedup_only":
        from tfrec_tpu.ops.embedding import combine_duplicate_ids

        def sparse_update_all(state, ids, grads, lr, _b=builder):
            new_tables = dict(state["tables"])
            new_sparse = dict(state["sparse_opt"])
            for name, g in grads.items():
                uids, comb = combine_duplicate_ids(
                    ids[name], g, sentinel=state["tables"][name].shape[0]
                )
                # Consume combine's outputs without the optimizer trio.
                new_tables[name] = new_tables[name].at[:1].add(
                    comb[:1] * 1e-30 + uids[0] * 1e-30
                )
            return new_tables, new_sparse

        builder.sparse_update_all = sparse_update_all
    elif variant == "pertable_pallas_trio":
        # XLA gathers + Pallas fused RMW trio (one op per table instead of
        # the take/scatter/scatter chain; touches 8k rows, never sweeps V).
        # d % 128 == 0 direct; d in {32, 64} needs TFREC_PACK_SUBDIM=1.
        from tfrec_tpu.kernels.scatter_pallas import fused_scatter_supported

        builder._fused_scatter_ok = (
            lambda t, name="": fused_scatter_supported(t.shape[0], t.shape[1])
        )
    elif variant == "dedup_only_grouped":
        import jax.numpy as jnp

        from tfrec_tpu.ops.embedding import combine_duplicate_ids_grouped

        def sparse_update_all(state, ids, grads, lr, _b=builder):
            new_tables = dict(state["tables"])
            new_sparse = dict(state["sparse_opt"])
            names = [n for n in grads]
            ids_st = jnp.stack([ids[n] for n in names])
            g_st = jnp.stack([grads[n] for n in names])
            sentinels = [state["tables"][n].shape[0] for n in names]
            uids, comb = combine_duplicate_ids_grouped(ids_st, g_st, sentinels)
            for i, name in enumerate(names):
                new_tables[name] = new_tables[name].at[:1].add(
                    comb[i, :1] * 1e-30 + uids[i, 0] * 1e-30
                )
            return new_tables, new_sparse

        builder.sparse_update_all = sparse_update_all
    elif variant == "trio_arange":
        import jax.numpy as jnp

        def sparse_update_all(state, ids, grads, lr, _b=builder):
            new_tables = dict(state["tables"])
            new_sparse = dict(state["sparse_opt"])
            for name, g in grads.items():
                uids = jnp.arange(g.shape[0], dtype=jnp.int32)
                new_tables[name], new_sparse[name] = _b.sparse_update_deduped(
                    name, state["tables"][name], state["sparse_opt"][name],
                    uids, g, lr,
                )
            return new_tables, new_sparse

        builder.sparse_update_all = sparse_update_all
    else:
        raise ValueError(variant)
    return state, batches, builder


def main() -> int:
    try:
        from bench import _stack
        from exp_step_breakdown import _slope

        variants = _os.environ.get(
            "ABLATE_VARIANTS", "pertable,grouped,raw_scatter,no_sparse"
        ).split(",")
        for variant in variants:
            state, batches, builder = _variant_builder(variant)

            def stepk(args, k, _b=builder, _batches=batches):
                st, m = jax.lax.scan(
                    lambda s, b: _b.step(s, b), args, _stack(_batches, k)
                )
                return m["loss"][-1]

            _slope(stepk, state, f"ablate {variant} d={D}")
            # Release before the next variant compiles (333MB of tables).
            del state, batches, builder
    except Exception:
        traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
