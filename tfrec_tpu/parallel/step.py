"""Distributed train step: pjit over the mesh with the explicit
all-to-all embedding path plugged into the generic step (SURVEY.md §3b).

Sharding layout (R3/R4):
- batch             P('data')       — data parallel
- dense params/opt  P()             — replicated; grad all-reduce is
                                      inserted by GSPMD from the sharded
                                      batch + replicated-param contraction
- tables (row mode) P('data', None) — contiguous row blocks; lookups and
                                      gradient combine via shard_map
                                      all_to_all (parallel/embedding.py)
- tables (col mode) P(None,'table') — feature blocks; all_gather lookups
- sparse opt state  sharded like its table (rowwise scalars P('data'))

The returned step is the SAME pure function signature as the single-device
one; Trainer swaps builders based on config.mesh.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tfrec_tpu.configs import MeshConfig, OptimConfig
from tfrec_tpu.models.base import RecModel
from tfrec_tpu.parallel.embedding import ColShardedTable, RowShardedTable
from tfrec_tpu.train.step import State, TrainStepBuilder


class ShardedTrainStepBuilder(TrainStepBuilder):
    """TrainStepBuilder with sharded tables + explicit collective lookups."""

    def __init__(
        self,
        model: RecModel,
        loss_name: str,
        optim_cfg: OptimConfig,
        mesh: Mesh,
        mesh_cfg: MeshConfig | None = None,
        *,
        l2_reg: float = 0.0,
        kernels: str = "xla",
        seed: int = 0,
        device_negatives: bool = False,
        num_items: int = 0,
    ):
        super().__init__(
            model, loss_name, optim_cfg, l2_reg=l2_reg, kernels=kernels,
            seed=seed, device_negatives=device_negatives, num_items=num_items,
            # Sharded tables update through per-table collective plans
            # (RowShardedTable.update does its dedup inside shard_map);
            # the batched cross-table dedup would bypass them.
            group_dedup=False,
        )
        self.mesh = mesh
        self.mesh_cfg = mesh_cfg or MeshConfig()
        mode = self.mesh_cfg.table_sharding
        if mode not in ("row", "col", "gspmd", "replicated"):
            raise ValueError(f"unknown mesh.table_sharding {mode!r}")
        if self.mesh_cfg.dense_sharding not in ("replicated", "fsdp"):
            raise ValueError(
                f"unknown mesh.dense_sharding {self.mesh_cfg.dense_sharding!r}"
            )
        self.plans: Dict[str, object] = {}
        self._gspmd_row = mode == "gspmd"
        if self.mesh_cfg.row_permute:
            if mode != "row":
                raise ValueError(
                    "mesh.row_permute applies to table_sharding='row' only"
                )
            if model.dot_decomposition() is not None:
                # The sharded retrieval evaluator scores the LIVE sharded
                # item table; under a permuted layout its top-k would
                # return physical rows as item ids. Refusing beats a
                # silently-wrong eval (the repo's named bug class).
                raise ValueError(
                    "mesh.row_permute is for CTR workloads: retrieval "
                    "models score the live sharded item table and would "
                    "return permuted (physical) item ids from top-k"
                )
        for spec in model.table_specs():
            if spec.lane_groups > 1 and mode == "col":
                raise ValueError(
                    f"table {spec.name!r} is lane-packed "
                    f"(lane_groups={spec.lane_groups}); column sharding "
                    "would split across lane groups — use row/gspmd/"
                    "replicated table_sharding"
                )
            if mode == "row":
                wire = (
                    jnp.bfloat16
                    if self.mesh_cfg.a2a_dtype == "bfloat16"
                    else None
                )
                self.plans[spec.name] = RowShardedTable(
                    mesh,
                    spec.vocab,
                    spec.dim,
                    capacity_factor=self.mesh_cfg.a2a_capacity_factor,
                    kernels=kernels,
                    wire_dtype=wire,
                    # Lane-packed tables take the lane-sliced wire path
                    # (d lanes per (id, slot) key — no 128/d regression).
                    lane_groups=spec.lane_groups,
                    recv_combine=self.mesh_cfg.recv_combine,
                    permute=self.mesh_cfg.row_permute,
                )
            elif mode == "col":
                t_axis = mesh.shape["table"]
                if t_axis <= 1:
                    # Degenerate col (t=1): full machinery, zero memory
                    # scaling — allowed (warned) so the 1-chip bench can
                    # measure the col path's per-chip cost exactly like
                    # the row path's (1,1)-mesh A/B (VERDICT r4 item 4).
                    import warnings

                    warnings.warn(
                        "table_sharding='col' on a table axis of size 1: "
                        "all the machinery, none of the memory scaling — "
                        "benchmark/degenerate-mesh use only", stacklevel=2,
                    )
                if spec.dim % t_axis != 0:
                    # Scalar/bias tables (dim 1, e.g. item_bias) replicate by
                    # design — V floats is negligible next to V x D and a
                    # feature split of one column is meaningless. Only warn
                    # about real feature tables losing their memory scaling.
                    if spec.dim > 1:
                        import warnings

                        warnings.warn(
                            f"table {spec.name!r}: dim {spec.dim} not divisible "
                            f"by table axis {t_axis}; REPLICATING instead of "
                            "column-sharding (memory cost!)", stacklevel=2,
                        )
                    self.plans[spec.name] = None
                else:
                    self.plans[spec.name] = ColShardedTable(
                        mesh, spec.vocab, spec.dim,
                        capacity_factor=self.mesh_cfg.a2a_capacity_factor,
                    )
            elif mode == "gspmd":
                # Row-sharded layout but lookups/updates via plain gather/
                # scatter — the XLA SPMD partitioner inserts the collectives.
                # The A/B reference for the explicit all-to-all path.
                self.plans[spec.name] = "gspmd_row"
            else:  # replicated: GSPMD handles it
                self.plans[spec.name] = None

    # ---- layout helpers ----

    def table_spec_sharding(self, name: str) -> NamedSharding:
        plan = self.plans[name]
        if isinstance(plan, RowShardedTable) or plan == "gspmd_row":
            return NamedSharding(self.mesh, P("data", None))
        if isinstance(plan, ColShardedTable):
            return NamedSharding(self.mesh, P(None, "table"))
        return NamedSharding(self.mesh, P())

    def _opt_state_sharding(self, name: str, leaf) -> NamedSharding:
        plan = self.plans[name]
        if isinstance(plan, RowShardedTable) or plan == "gspmd_row":
            return NamedSharding(self.mesh, P("data", *([None] * (leaf.ndim - 1))))
        if isinstance(plan, ColShardedTable) and leaf.ndim == 2:
            return NamedSharding(self.mesh, P(None, "table"))
        return NamedSharding(self.mesh, P())

    def _dense_sharding(self, leaf) -> NamedSharding:
        """Placement for one dense-param/optimizer leaf. "fsdp" shards the
        first dim divisible by the data axis (GSPMD inserts the
        all-gather-for-use / reduce-scatter-for-grad pair — math-identical
        to replication); scalars and indivisible leaves replicate."""
        if self.mesh_cfg.dense_sharding == "fsdp":
            n_sh = self.mesh.shape["data"]
            shape = getattr(leaf, "shape", ())
            for axis, dim in enumerate(shape):
                if dim % n_sh == 0 and dim >= n_sh:
                    spec = [None] * len(shape)
                    spec[axis] = "data"
                    return NamedSharding(self.mesh, P(*spec))
        return NamedSharding(self.mesh, P())

    def state_shardings(self, state: State):
        """Pytree of NamedShardings matching ``state`` (for pjit/checkpoint)."""
        rep = NamedSharding(self.mesh, P())
        return {
            "step": rep,
            "tables": {
                name: self.table_spec_sharding(name) for name in state["tables"]
            },
            "dense": jax.tree_util.tree_map(self._dense_sharding, state["dense"]),
            "sparse_opt": {
                name: jax.tree_util.tree_map(
                    lambda leaf, n=name: self._opt_state_sharding(n, leaf), st
                )
                for name, st in state["sparse_opt"].items()
            },
            "dense_opt": jax.tree_util.tree_map(
                self._dense_sharding, state["dense_opt"]
            ),
        }

    def batch_shardings(self, batch: Dict[str, jnp.ndarray], stacked: bool = False):
        """Per-leaf shardings: batch dim over 'data'; with ``stacked`` the
        leading [K] scan axis (steps_per_dispatch) stays unsharded."""
        if stacked:
            return {
                k: NamedSharding(
                    self.mesh, P(None, "data", *([None] * (np.ndim(v) - 2)))
                )
                for k, v in batch.items()
            }
        return {
            k: NamedSharding(self.mesh, P("data", *([None] * (np.ndim(v) - 1))))
            for k, v in batch.items()
        }

    # ---- state construction (padded + placed on the mesh) ----

    def _init_padded(self, rng: jax.Array) -> State:
        state = super().init_state(rng)
        # Pad row-sharded tables (and their opt state) to V_pad; permuted
        # plans then reorder rows into the physical layout (phys =
        # logical[inv_perm]) so seeded init streams stay layout-invariant
        # (the lane-pack precedent: same logical rows, different homes).
        for name, plan in self.plans.items():
            if not isinstance(plan, RowShardedTable):
                continue
            pad = plan.vocab_padded - plan.vocab
            if pad:
                state["tables"][name] = jnp.pad(state["tables"][name], ((0, pad), (0, 0)))
                state["sparse_opt"][name] = jax.tree_util.tree_map(
                    lambda leaf: jnp.pad(
                        leaf, ((0, pad),) + ((0, 0),) * (leaf.ndim - 1)
                    ),
                    state["sparse_opt"][name],
                )
            if plan.permute:
                inv = plan.inv_perm_rows()
                state["tables"][name] = jnp.take(
                    state["tables"][name], inv, axis=0
                )
                state["sparse_opt"][name] = jax.tree_util.tree_map(
                    lambda leaf: (
                        jnp.take(leaf, inv, axis=0)
                        if leaf.shape[:1] == (plan.vocab_padded,) else leaf
                    ),
                    state["sparse_opt"][name],
                )
        return state

    def init_state(self, rng: jax.Array) -> State:
        # jit with out_shardings so each device/process materializes ONLY
        # its own table shards — tables are never built on one host
        # (SURVEY.md §3b "tables created sharded").
        shapes = jax.eval_shape(self._init_padded, rng)
        shardings = self.state_shardings(shapes)
        return jax.jit(self._init_padded, out_shardings=shardings)(rng)

    # ---- seams ----

    def _fused_names(self, names):
        """Tables whose exchanges can share ONE shard_map region: all
        RowShardedTable plans (any lane_groups) on the 'data' axis."""
        if not self.mesh_cfg.fused_tables:
            return []
        out = [n for n in names if isinstance(self.plans.get(n), RowShardedTable)]
        return out if len(out) > 1 else []

    def lookup(self, tables, ids, want_route: bool = False):
        # Route reuse (VERDICT r4 item 1): train steps ask for the
        # exchange route so the update half skips its duplicate dedup
        # argsort / bucket scatter / id all-to-all. Eval forwards
        # (want_route=False) keep the lean two-output shard_map.
        want = want_route and self.mesh_cfg.route_reuse
        fused = self._fused_names(ids)
        gathered, routes = {}, {}
        overflow_total = jnp.zeros((), jnp.int32)
        for name, t_ids in ids.items():
            if name in fused:
                continue
            plan = self.plans[name]
            if plan is None or plan == "gspmd_row":
                gathered[name] = jnp.take(tables[name], t_ids, axis=0, mode="clip")
                continue
            if isinstance(plan, ColShardedTable):
                # Col lookups have no exchange route to reuse (local
                # gather + feature all_gather).
                gathered[name], ovf = plan.lookup(tables[name], t_ids)
                overflow_total = overflow_total + ovf
                continue
            slots = (
                self._slots_for(name, t_ids.shape[0])
                if plan.lane_groups > 1
                else None
            )
            if want:
                gathered[name], ovf, routes[name] = plan.lookup(
                    tables[name], t_ids, slots=slots, with_route=True
                )
            else:
                gathered[name], ovf = plan.lookup(
                    tables[name], t_ids, slots=slots
                )
            overflow_total = overflow_total + ovf
        if fused:
            if want:
                f_out, ovf, f_routes = self._fused_lookup(
                    tables, ids, fused, want_route=True
                )
                routes.update(f_routes)
            else:
                f_out, ovf = self._fused_lookup(tables, ids, fused)
            gathered.update(f_out)
            overflow_total = overflow_total + ovf
        aux = {"lookup_overflow": overflow_total}
        if want and routes:
            aux["_route"] = routes
        return gathered, aux

    def _fused_lookup(self, tables, ids, names, want_route: bool = False):
        """ALL fusable tables' a2a exchanges inside ONE shard_map region.

        The round-4 on-chip breakdown (docs/PERF.md "Round-4 on-chip
        results") attributed the row-sharded step's ~2x overhead vs the
        single-device step to the per-table shard_map regions themselves
        — 26 lookup + 26 update regions per step — not to the dedup/
        bucket work inside them. One region per step side removes that
        multiplier; the per-table math is byte-identical (the bodies are
        the SAME RowShardedTable.local_* methods the per-table path
        wraps)."""
        axis = "data"
        slots = {
            n: self._slots_for(n, ids[n].shape[0])
            for n in names
            if self.plans[n].lane_groups > 1
        }

        def body(tbls, lids, lslots):
            outs, routes = {}, {}
            ovf = jnp.zeros((), jnp.int32)
            for n in names:
                plan = self.plans[n]
                if plan.lane_groups > 1:
                    r = plan.local_lookup_grouped(
                        tbls[n], lids[n], lslots[n], with_route=want_route
                    )
                else:
                    r = plan.local_lookup(
                        tbls[n], lids[n], with_route=want_route
                    )
                if want_route:
                    outs[n], v, routes[n] = r
                else:
                    outs[n], v = r
                ovf = ovf + v
            if want_route:
                return outs, ovf, routes
            return outs, ovf

        d_spec = {n: P(axis, None) for n in names}
        i_spec = {n: P(axis) for n in names}
        s_spec = {n: P(axis) for n in slots}
        out_specs = (d_spec, P())
        if want_route:
            out_specs = out_specs + (
                {n: self.plans[n]._route_specs() for n in names},
            )
        res = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(d_spec, i_spec, s_spec),
            out_specs=out_specs,
            check_vma=False,
        )(
            {n: tables[n] for n in names},
            {n: ids[n] for n in names},
            slots,
        )
        return res

    def sparse_update_all(self, state, ids, gathered_grad, lr,
                          host_sort=None, route=None):
        fused = self._fused_names(gathered_grad)
        if not fused:
            return super().sparse_update_all(
                state, ids, gathered_grad, lr, host_sort=host_sort,
                route=route,
            )
        assert not host_sort, "host_dedup is not supported on the mesh path"
        route = route or {}
        new_tables = dict(state["tables"])
        new_sparse = dict(state["sparse_opt"])
        for name in gathered_grad:
            if name in fused:
                continue
            new_tables[name], new_sparse[name] = self.sparse_update(
                name, state["tables"][name], state["sparse_opt"][name],
                ids[name], gathered_grad[name], lr,
                route=route.get(name),
            )
        axis = "data"
        names = fused
        slots = {
            n: self._slots_for(n, ids[n].shape[0])
            for n in names
            if self.plans[n].lane_groups > 1
        }
        # Route reuse on the fused path: every fused table has a route
        # exactly when the fused lookup produced them (same `names`).
        f_route = {n: route[n] for n in names if n in route}
        use_route = len(f_route) == len(names)

        def body(tbls, osts, lids, lgrads, lslots, rts):
            nt, ns = {}, {}
            for n in names:
                plan = self.plans[n]
                rt = rts.get(n) if use_route else None
                if plan.lane_groups > 1:
                    t, s, _ = plan.local_update_grouped(
                        tbls[n], osts[n], lids[n], lgrads[n], lslots[n],
                        self.sparse_opt, lr, route=rt,
                    )
                else:
                    t, s, _ = plan.local_update(
                        tbls[n], osts[n], lids[n], lgrads[n],
                        self.sparse_opt, lr, route=rt,
                    )
                nt[n], ns[n] = t, s
            return nt, ns

        d_spec = {n: P(axis, None) for n in names}
        o_spec = {
            n: jax.tree_util.tree_map(
                lambda leaf: P(axis, *([None] * (leaf.ndim - 1))),
                state["sparse_opt"][n],
            )
            for n in names
        }
        i_spec = {n: P(axis) for n in names}
        s_spec = {n: P(axis) for n in slots}
        r_spec = (
            {n: self.plans[n]._route_specs() for n in names}
            if use_route else {}
        )
        f_tables, f_sparse = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(d_spec, o_spec, i_spec, d_spec, s_spec, r_spec),
            out_specs=(d_spec, o_spec),
            check_vma=False,
        )(
            {n: state["tables"][n] for n in names},
            {n: state["sparse_opt"][n] for n in names},
            {n: ids[n] for n in names},
            {n: gathered_grad[n] for n in names},
            slots,
            f_route if use_route else {},
        )
        new_tables.update(f_tables)
        new_sparse.update(f_sparse)
        return new_tables, new_sparse

    def sparse_update(self, name, table, opt_state, ids, grads, lr,
                      order=None, route=None):
        # order (host_dedup) is a single-device feature: host argsorts of
        # LOCAL ids are meaningless after the a2a re-bucketing, and the
        # trainer never generates them on a mesh.
        assert order is None, "host_dedup is not supported on the mesh path"
        plan = self.plans[name]
        grouped = self._lane_groups().get(name, 1) > 1
        if plan is None or plan == "gspmd_row":
            slots = (
                self._slots_for(name, ids.shape[0])
                if grouped and self.sparse_opt.name == "rowwise_adam"
                else None
            )
            return self.sparse_opt.apply(
                table, opt_state, ids, grads, lr, slots=slots
            )
        new_table, new_state, _ = plan.update(
            table, opt_state, ids, grads, self.sparse_opt, lr,
            slots=(self._slots_for(name, ids.shape[0]) if grouped else None),
            route=route,
        )
        return new_table, new_state

    # ---- compiled step ----

    def compile_step(
        self,
        state: State,
        example_batch: Dict[str, jnp.ndarray],
        stacked: bool = False,
    ):
        """jit the (multi-)step with explicit shardings; donates the input
        state. ``stacked`` selects multi_step over [K, B, ...] batches
        (train.steps_per_dispatch)."""
        out_shardings = (self.state_shardings(state), None)
        return jax.jit(
            self.multi_step if stacked else self.step,
            in_shardings=(
                self.state_shardings(state),
                self.batch_shardings(example_batch, stacked=stacked),
            ),
            out_shardings=out_shardings,
            donate_argnums=(0,),
        )

    # ---- eval helpers ----

    def unpadded_tables(self, state: State) -> Dict[str, jnp.ndarray]:
        """Logical (unpadded) views of the tables for eval paths —
        de-permuted when mesh.row_permute rearranged the physical rows
        (one [V, D] gather per eval call; eval always sees logical ids)."""
        out = {}
        for name, table in state["tables"].items():
            plan = self.plans[name]
            if isinstance(plan, RowShardedTable) and plan.permute:
                out[name] = jnp.take(table, plan.perm_rows(), axis=0)[
                    : plan.vocab
                ]
            elif isinstance(plan, RowShardedTable) and plan.vocab_padded != plan.vocab:
                out[name] = table[: plan.vocab]
            else:
                out[name] = table
        return out
