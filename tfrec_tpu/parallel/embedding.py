"""Sharded embedding subsystem: all-to-all ID exchange + gradient combine
(BASELINE.json R3 — the heart of the framework).

Row sharding (default, the DLRM/TPUEmbedding layout over the ``data`` axis):
every device owns a contiguous block of ``V_pad / N`` rows of each table
(matching ``NamedSharding(P('data', None))`` on the global array). The hot
path per step, all inside one XLA program:

  1. each device buckets its local batch ids by owning shard
     (static per-destination capacity — XLA needs static shapes);
  2. ``all_to_all`` over ICI sends id requests to owners;
  3. owners gather their local rows;
  4. a second ``all_to_all`` returns activations;
  5. un-bucketing scatters rows back to batch positions.

The gradient combine is the exact transpose: grads are bucketed with the
same send plan, all_to_all'd to owners, and the rowwise sparse optimizer
(ops/sparse_optim.py) applies the combined update to local rows only.

Capacity/overflow: per-destination capacity C = ceil((mean + 4*sqrt(mean)
+ 8) * factor/2) with mean = unique-ids/N (see capacity_for). Ids
beyond C are *dropped for that step* — their activations read as zero and
their gradients are not sent. This is never silent: lookups return the
global overflow count, the trainer logs a drop rate, and equivalence tests
assert overflow == 0 at factor=2 on uniform ids. (SURVEY.md §7 "hard
parts": ragged all-to-all under a static-shape compiler.)

Column sharding (over the ``table`` axis): each device holds all V rows of
a D/T feature slice. Ids are replicated within a table group, so lookup is
a local gather + feature all_gather; the gradient path combines local
duplicate ids, slices the local D/T feature block, all_gathers the
capacity-bounded (deduped) blocks over 'data', and applies the optimizer
with the rowwise statistic psum'd across feature shards
(ops/sparse_optim._row_stat).

Lane-packed tables (TableSpec.lane_groups > 1) row-shard with a
LANE-SLICED wire: the all-to-alls exchange (id, slot) keys and move only
the owning d = D/G lane group per key, so packing costs the same ICI
volume as unpacked per-field tables.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tfrec_tpu.ops.embedding import (
    combine_duplicate_ids,
    dedup_ids,
    merge_argsort_runs,
    run_first_index,
)
from tfrec_tpu.ops.sparse_optim import SparseOptimizer


def pad_vocab(vocab: int, num_shards: int, row_align: int = 8) -> int:
    """Round vocab up so every shard gets an equal row block (shard_map
    requires even shards). Shard blocks are additionally aligned to
    ``row_align`` rows so the packed sub-128-lane Pallas kernels (which
    view a [V, D<128] shard as [V*D/128, 128] group rows) always see a
    whole number of groups — 8 covers every dim >= 16 and costs at most
    8*N-1 pad rows."""
    chunk = num_shards * row_align
    return math.ceil(vocab / chunk) * chunk


def capacity_for(batch_per_device: int, num_shards: int, factor: float) -> int:
    """Per-destination send capacity, in UNIQUE ids.

    Balls-in-bins: with u unique ids over N destinations the max bin load
    concentrates around mean + O(sqrt(mean log N)), so a flat multiple of
    the mean underflows at small per-bin counts. factor=2.0 (the default)
    yields mean + 4*sqrt(mean) + 8 — overflow is then a rare event that is
    counted and logged, never silent (SURVEY.md §7 "hard parts").
    """
    mean = batch_per_device / num_shards
    cap = math.ceil((mean + 4.0 * math.sqrt(mean) + 8.0) * factor / 2.0)
    return min(cap, batch_per_device)


def bucket_by_dest(
    ids: jnp.ndarray, num_shards: int, rows_per_shard: int, capacity: int,
    sentinel: int, ids_sorted: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pack ids into a [N, C] send buffer by destination shard.

    Returns (send_ids [N, C] int32 sentinel-padded, send_pos [N, C] int32
    position-in-batch with n as the drop marker, overflow scalar).
    Out-of-range ids (negative or >= sentinel) are never sent; negatives
    count toward overflow (corrupt input, loudly dropped). ``ids_sorted``
    skips the destination sort when the caller's ids are already ascending
    (dedup_ids output) — saves an O(n log n) pass on the hot path.
    """
    n = ids.shape[0]
    invalid = (ids >= sentinel) | (ids < 0)
    dest = jnp.where(invalid, sentinel, ids // rows_per_shard)
    if ids_sorted:
        order = jnp.arange(n)
        sd, sids = dest, jnp.where(invalid, sentinel, ids)
    else:
        order = jnp.argsort(dest)  # stable: preserves batch order within a dest
        sd = jnp.take(dest, order)
        sids = jnp.take(jnp.where(invalid, sentinel, ids), order)
    # run_first_index == searchsorted(sd, sd, 'left') here, WITHOUT the
    # vmapped binary-search while-loop XLA:TPU emits for searchsorted
    # (~816 us/call at n=8192 — the round-4 mesh-overhead culprit).
    first = run_first_index(sd)
    rank = jnp.arange(n) - first
    real = sids < sentinel
    ok = (rank < capacity) & real
    slot = jnp.where(ok, sd * capacity + rank, num_shards * capacity)
    send_ids = (
        jnp.full((num_shards * capacity,), sentinel, jnp.int32)
        .at[slot]
        .set(sids.astype(jnp.int32), mode="drop")
    )
    send_pos = (
        jnp.full((num_shards * capacity,), n, jnp.int32)
        .at[slot]
        .set(order.astype(jnp.int32), mode="drop")
    )
    # Capacity drops of in-range ids + corrupt (negative) ids, both loud;
    # sentinel padding (>= sentinel) is legitimate and never counted.
    overflow = jnp.sum((~ok & real).astype(jnp.int32)) + jnp.sum(
        (ids < 0).astype(jnp.int32)
    )
    return (
        send_ids.reshape(num_shards, capacity),
        send_pos.reshape(num_shards, capacity),
        overflow,
    )


class RowShardedTable:
    """Lookup/update plan for one row-sharded table on a mesh axis."""

    def __init__(
        self,
        mesh: Mesh,
        vocab: int,
        dim: int,
        *,
        axis: str = "data",
        capacity_factor: float = 2.0,
        kernels: str = "xla",
        wire_dtype=None,
        lane_groups: int = 1,
        recv_combine: str = "sort",
        permute: bool = False,
    ):
        self.mesh = mesh
        self.axis = axis
        # Round-robin row permutation (mesh.row_permute): logical row i
        # lives at physical row (i % N) * rps + i // N, so the hot head
        # of a frequency-sorted vocab spreads across shards instead of
        # overflowing shard 0's capacity (skew tests, docs/PERF.md).
        # Applied at the TOP of every shard-local body; everything
        # downstream (dedup, bucket, optimizer) runs in physical ids.
        self.permute = permute
        # Receive-side duplicate combine: "sort" (general argsort inside
        # sparse_opt.apply) or "merge" (bitonic N-way merge of the
        # per-source-sorted received blocks — bit-identical; see
        # ops/embedding.merge_argsort_runs and configs.MeshConfig).
        if recv_combine not in ("sort", "merge"):
            raise ValueError(f"unknown recv_combine {recv_combine!r}")
        self.recv_combine = recv_combine
        self.num_shards = mesh.shape[axis]
        self.vocab = vocab
        self.vocab_padded = pad_vocab(vocab, self.num_shards)
        self.rows_per_shard = self.vocab_padded // self.num_shards
        self.dim = dim
        self.capacity_factor = capacity_factor
        self.kernels = kernels  # "pallas": fused local gather/update inside shard_map
        # Optional reduced-precision wire format for the activation/grad
        # all-to-alls (bf16 halves ICI volume; ids always stay int32).
        self.wire_dtype = wire_dtype
        # Lane-packed tables (TableSpec.lane_groups G > 1): each physical
        # row holds G logical sub-rows of d = dim/G lanes. The lane-sliced
        # wire path exchanges (id, slot) keys and moves only the owning
        # d-lane group through the activation/grad all-to-alls — wire
        # volume per id is d lanes, exactly the unpacked per-field cost,
        # so packing composes with row sharding with NO 128/d wire
        # regression (round-3 exclusion removed; VERDICT r3 item 1).
        self.lane_groups = lane_groups
        if lane_groups > 1:
            assert dim % lane_groups == 0, (dim, lane_groups)
            # (id, slot) keys are id*G + slot; they must fit int32.
            if self.vocab_padded * lane_groups >= 2**31:
                raise ValueError(
                    f"lane-packed sharded table too large for int32 "
                    f"(vocab_padded={self.vocab_padded} * G={lane_groups}); "
                    "disable lane_pack for this table"
                )
        self.sentinel = self.vocab_padded  # one past the padded end

    # ---- row permutation (mesh.row_permute) ----

    def _perm_ids(self, ids):
        """Logical -> physical row ids (identity when permute is off).
        Out-of-range ids (negative = corrupt, >= V_pad = sentinel) pass
        through untouched so the loud-drop accounting is unchanged."""
        if not self.permute:
            return ids
        n, rps = self.num_shards, self.rows_per_shard
        ok = (ids >= 0) & (ids < self.vocab_padded)
        return jnp.where(ok, (ids % n) * rps + (ids // n), ids)

    def perm_rows(self):
        """[V_pad] physical row index of each logical row (numpy-free
        jnp iota math; identity when permute is off). logical[i] lives at
        physical[perm_rows()[i]] — init scatters with it, eval gathers
        with it (parallel/step.py)."""
        i = jnp.arange(self.vocab_padded, dtype=jnp.int32)
        if not self.permute:
            return i
        return (i % self.num_shards) * self.rows_per_shard + (
            i // self.num_shards
        )

    def inv_perm_rows(self):
        """[V_pad] logical row index of each physical row (the inverse of
        perm_rows): physical p holds logical (p % rps) * N + p // rps.
        Init builds the physical layout with it: phys = logical[inv]."""
        p = jnp.arange(self.vocab_padded, dtype=jnp.int32)
        if not self.permute:
            return p
        return (p % self.rows_per_shard) * self.num_shards + (
            p // self.rows_per_shard
        )

    # ---- lane-sliced key helpers (lane_groups > 1) ----

    def _keys(self, lids, lslots):
        """(id, slot) wire keys: id*G + slot. Sentinel/oversized ids map to
        the key sentinel; corrupt (negative) ids keep their raw negative
        value so bucket_by_dest counts them loudly. dest = key //
        (rows_per_shard*G) == id // rows_per_shard, so routing is
        unchanged."""
        g = self.lane_groups
        key_sent = self.vocab_padded * g
        return jnp.where(
            lids < 0, lids,
            jnp.where(lids >= self.sentinel, key_sent, lids * g + lslots),
        ), key_sent

    # ---- forward ----

    def _route_specs(self):
        """shard_map specs of the route triple (inv, send_pos, recv_ids):
        the lookup's dedup inverse + send plan + received id requests,
        re-usable by the update half of the SAME step (route reuse —
        VERDICT r4 item 1: the update otherwise re-derives the identical
        argsort/bucket/id-a2a, which XLA does not CSE across the two
        shard_map regions)."""
        return (P(self.axis), P(self.axis, None), P(self.axis, None))

    def lookup(self, table: jnp.ndarray, ids: jnp.ndarray, slots=None,
               with_route: bool = False):
        """table: [V_pad, D] sharded P(axis, None); ids: [B] sharded P(axis).
        Returns (activations [B, D] sharded P(axis), overflow scalar) —
        plus, with ``with_route``, the route triple (inv, send_pos,
        recv_ids) for the same-step update to reuse (see _route_specs).

        ``slots`` ([B] int32, required iff lane_groups > 1): which d-lane
        group each id addresses (model.lane_slot_widths). The exchange then
        dedups (id, slot) keys and moves only d lanes per key; the output
        keeps the [B, D] interface with the untouched lane groups zero
        (the packed models only ever read a position's own slot group —
        models/ctr_base._field_rows)."""
        if self.lane_groups > 1:
            return self._lookup_grouped(table, ids, slots, with_route)
        out_specs = (P(self.axis, None), P())
        if with_route:
            out_specs = out_specs + (self._route_specs(),)
        return jax.shard_map(
            lambda tbl, lids: self.local_lookup(
                tbl, lids, with_route=with_route
            ),
            mesh=self.mesh,
            in_specs=(P(self.axis, None), P(self.axis)),
            out_specs=out_specs,
            check_vma=False,
        )(table, ids)

    def local_lookup(self, tbl, lids, with_route: bool = False):
        """Shard-LOCAL lookup body (runs inside shard_map over ``axis``).

        Factored out so the builder's fused path can run MANY tables'
        exchanges inside ONE shard_map region — the round-4 breakdown
        measured the per-table regions themselves (not the work inside)
        as the mesh step's dominant overhead (docs/PERF.md)."""
        axis, n_sh, rps = self.axis, self.num_shards, self.rows_per_shard
        lids = self._perm_ids(lids)
        b = lids.shape[0]
        cap = capacity_for(b, n_sh, self.capacity_factor)
        # Dedup before the exchange: capacity and wire volume scale with
        # UNIQUE ids per destination, not raw batch ids.
        uids, inv = dedup_ids(lids, self.sentinel)
        send_ids, send_pos, overflow = bucket_by_dest(
            uids, n_sh, rps, cap, self.sentinel, ids_sorted=True
        )
        recv_ids = jax.lax.all_to_all(
            send_ids, axis, split_axis=0, concat_axis=0, tiled=True
        )  # [N, C]: row j = ids requested by device j, owned by me
        base = jax.lax.axis_index(axis) * rps
        local_idx = jnp.clip(recv_ids - base, 0, rps - 1)
        valid = (recv_ids >= base) & (recv_ids < base + rps)
        if self.kernels == "pallas":
            from tfrec_tpu.kernels.gather_pallas import gather_pallas

            rows = gather_pallas(tbl, local_idx.reshape(-1)).reshape(
                n_sh, cap, -1
            )
        else:
            rows = jnp.take(tbl, local_idx.reshape(-1), axis=0).reshape(
                n_sh, cap, -1
            )
        rows = jnp.where(valid[:, :, None], rows, 0.0)
        if self.wire_dtype is not None:
            rows = rows.astype(self.wire_dtype)
        back = jax.lax.all_to_all(
            rows, axis, split_axis=0, concat_axis=0, tiled=True
        )  # [N, C, D]: row j = activations from owner j for my requests
        if self.wire_dtype is not None:
            back = back.astype(tbl.dtype)
        unique_rows = (
            jnp.zeros((b, tbl.shape[1]), tbl.dtype)
            .at[send_pos.reshape(-1)]
            .set(back.reshape(n_sh * cap, -1), mode="drop")
        )
        out = jnp.take(unique_rows, inv, axis=0)
        if with_route:
            return out, jax.lax.psum(overflow, axis), (inv, send_pos, recv_ids)
        return out, jax.lax.psum(overflow, axis)

    def _lookup_grouped(self, table: jnp.ndarray, ids: jnp.ndarray, slots,
                        with_route: bool = False):
        """Lane-sliced lookup: wire moves d = D/G lanes per (id, slot)."""
        if slots is None:
            raise ValueError(
                "lane-packed RowShardedTable.lookup needs the per-id slot "
                "array (model.lane_slot_widths)"
            )
        out_specs = (P(self.axis, None), P())
        if with_route:
            out_specs = out_specs + (self._route_specs(),)
        return jax.shard_map(
            lambda tbl, lids, lslots: self.local_lookup_grouped(
                tbl, lids, lslots, with_route=with_route
            ),
            mesh=self.mesh,
            in_specs=(P(self.axis, None), P(self.axis), P(self.axis)),
            out_specs=out_specs,
            check_vma=False,
        )(table, ids, slots)

    def local_lookup_grouped(self, tbl, lids, lslots,
                             with_route: bool = False):
        """Shard-LOCAL lane-sliced lookup body (see local_lookup)."""
        axis, n_sh, rps = self.axis, self.num_shards, self.rows_per_shard
        lids = self._perm_ids(lids)
        grp = self.lane_groups
        d = self.dim // grp
        b = lids.shape[0]
        cap = capacity_for(b, n_sh, self.capacity_factor)
        keys, key_sent = self._keys(lids, lslots)
        ukeys, inv = dedup_ids(keys, key_sent)
        send_ids, send_pos, overflow = bucket_by_dest(
            ukeys, n_sh, rps * grp, cap, key_sent, ids_sorted=True
        )
        recv = jax.lax.all_to_all(
            send_ids, axis, split_axis=0, concat_axis=0, tiled=True
        )  # [N, C] keys requested of me
        rid = recv // grp
        rslot = recv % grp
        base = jax.lax.axis_index(axis) * rps
        local_idx = jnp.clip(rid - base, 0, rps - 1)
        valid = (rid >= base) & (rid < base + rps)
        # Gather the full packed row (HBM reads whole 128-lane lines
        # either way), then slice the owning d-lane group for the wire.
        rows = jnp.take(tbl, local_idx.reshape(-1), axis=0).reshape(
            n_sh * cap, grp, d
        )
        sel = jnp.take_along_axis(
            rows, rslot.reshape(-1)[:, None, None], axis=1
        )[:, 0, :]  # [N*C, d]
        sel = jnp.where(valid.reshape(-1)[:, None], sel, 0.0)
        if self.wire_dtype is not None:
            sel = sel.astype(self.wire_dtype)
        back = jax.lax.all_to_all(
            sel.reshape(n_sh, cap, d), axis,
            split_axis=0, concat_axis=0, tiled=True,
        )
        if self.wire_dtype is not None:
            back = back.astype(tbl.dtype)
        unique_rows = (
            jnp.zeros((b, d), tbl.dtype)
            .at[send_pos.reshape(-1)]
            .set(back.reshape(n_sh * cap, d), mode="drop")
        )
        vals = jnp.take(unique_rows, inv, axis=0)  # [b, d]
        # Re-expand to the packed [b, G*d] interface: each position's
        # d lanes land in its slot group, other groups read zero.
        out = (
            jax.nn.one_hot(lslots, grp, dtype=tbl.dtype)[:, :, None]
            * vals[:, None, :]
        ).reshape(b, grp * d)
        if with_route:
            return out, jax.lax.psum(overflow, axis), (inv, send_pos, recv)
        return out, jax.lax.psum(overflow, axis)

    # ---- transpose: gradient combine + sparse update ----

    def update(
        self,
        table: jnp.ndarray,
        opt_state: Dict[str, jnp.ndarray],
        ids: jnp.ndarray,
        grads: jnp.ndarray,
        sparse_opt: SparseOptimizer,
        lr: float,
        slots=None,
        route=None,
    ):
        """Combine grads across devices onto owning shards and apply the
        rowwise optimizer locally. Returns (table, opt_state, overflow).

        ``route``: the same-step lookup's (inv, send_pos, recv_ids) triple
        (lookup(..., with_route=True)) — the update then skips its own
        dedup argsort, bucket scatter AND id all-to-all. Bit-identical:
        the skipped computation is deterministic on the same ids."""
        if self.lane_groups > 1:
            return self._update_grouped(
                table, opt_state, ids, grads, sparse_opt, lr, slots, route
            )
        state_spec = jax.tree_util.tree_map(
            lambda leaf: P(self.axis, *([None] * (leaf.ndim - 1))), opt_state
        )
        in_specs = (P(self.axis, None), state_spec, P(self.axis),
                    P(self.axis, None))
        args = (table, opt_state, ids, grads)
        if route is not None:
            in_specs += (self._route_specs(),)
            args += (route,)

        def body(tbl, ostate, lids, lgrads, rt=None):
            return self.local_update(
                tbl, ostate, lids, lgrads, sparse_opt, lr, route=rt
            )

        return jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=(P(self.axis, None), state_spec, P()),
            check_vma=False,
        )(*args)

    def local_update(self, tbl, ostate, lids, lgrads, sparse_opt, lr,
                     route=None):
        """Shard-LOCAL gradient-combine + optimizer body (see local_lookup)."""
        axis, n_sh, rps = self.axis, self.num_shards, self.rows_per_shard
        lids = self._perm_ids(lids)
        b = lids.shape[0]
        cap = capacity_for(b, n_sh, self.capacity_factor)
        if route is not None:
            # Route reuse: the lookup already dedup-sorted these ids,
            # bucketed them and exchanged the requests in THIS program —
            # reuse (inv, send_pos, recv_ids); overflow was counted and
            # reported by the lookup (the builder discards the update's).
            inv, send_pos, recv_ids = route
            overflow = jnp.zeros((), jnp.int32)
        else:
            # Combine local duplicate ids before sending (transpose of the
            # lookup's dedup): one gradient row per unique id on the wire.
            uids, inv = dedup_ids(lids, self.sentinel)
            send_ids, send_pos, overflow = bucket_by_dest(
                uids, n_sh, rps, cap, self.sentinel, ids_sorted=True
            )
            recv_ids = jax.lax.all_to_all(
                send_ids, axis, split_axis=0, concat_axis=0, tiled=True
            )
        combined = jax.ops.segment_sum(lgrads, inv, num_segments=b)
        flat_pos = send_pos.reshape(-1)
        send_g = jnp.where(
            (flat_pos < b)[:, None],
            jnp.take(combined, jnp.clip(flat_pos, 0, b - 1), axis=0),
            0.0,
        ).reshape(n_sh, cap, -1)
        if self.wire_dtype is not None:
            send_g = send_g.astype(self.wire_dtype)
        recv_g = jax.lax.all_to_all(
            send_g, axis, split_axis=0, concat_axis=0, tiled=True
        )
        if self.wire_dtype is not None:
            recv_g = recv_g.astype(tbl.dtype)
        base = jax.lax.axis_index(axis) * rps
        # Local row index; sentinel/foreign ids -> rps (dropped by the
        # optimizer's mode='drop' scatters).
        lrow = recv_ids.reshape(-1) - base
        lrow = jnp.where((lrow >= 0) & (lrow < rps), lrow, rps).astype(jnp.int32)
        flat_g = recv_g.reshape(n_sh * cap, -1)
        # local_update is the UNPACKED path (lane_groups > 1 routes to
        # local_update_grouped), so lane_grouped is statically False.
        from tfrec_tpu.ops.sparse_optim import fused_adagrad_gate

        fused_ok = fused_adagrad_gate(
            tbl.shape[0], tbl.shape[1], kernels=self.kernels,
            opt_name=sparse_opt.name, lane_grouped=False,
        )
        # Receive-side combine: the N received blocks are each already
        # sorted (sources send dedup-sorted ids), so "merge" replaces the
        # general argsort with a bitonic N-way merge — and on the
        # degenerate 1-shard mesh skips the sort entirely (1 run is
        # already sorted). Bit-identical (stable permutation).
        merge_order = (
            merge_argsort_runs(lrow, n_sh)
            if self.recv_combine == "merge" else None
        )
        if fused_ok:
            from tfrec_tpu.kernels.scatter_pallas import fused_rowwise_adagrad

            uids, combined = combine_duplicate_ids(
                lrow, flat_g, sentinel=rps, order=merge_order
            )
            new_tbl, new_acc = fused_rowwise_adagrad(
                tbl, ostate["acc"], uids, combined, lr, eps=sparse_opt.eps
            )
            new_state = {"acc": new_acc}
        elif merge_order is not None:
            uids, g = combine_duplicate_ids(
                lrow, flat_g, sentinel=rps, order=merge_order
            )
            new_tbl, new_state = sparse_opt.apply_deduped(
                tbl, ostate, uids, g, lr
            )
        else:
            new_tbl, new_state = sparse_opt.apply(tbl, ostate, lrow, flat_g, lr)
        return new_tbl, new_state, jax.lax.psum(overflow, axis)

    def _update_grouped(
        self, table, opt_state, ids, grads, sparse_opt: SparseOptimizer,
        lr, slots, route=None,
    ):
        """Lane-sliced gradient combine: grads travel as d-lane groups
        keyed by (id, slot); owners re-expand to packed rows (zeros in the
        untouched groups) and apply the per-group rowwise optimizer —
        grouped adagrad's zero-grad groups are exact no-ops, grouped adam
        derives its touch mask from the received slots."""
        if slots is None:
            raise ValueError(
                "lane-packed RowShardedTable.update needs the per-id slot "
                "array (model.lane_slot_widths)"
            )
        state_spec = jax.tree_util.tree_map(
            lambda leaf: P(self.axis, *([None] * (leaf.ndim - 1))), opt_state
        )
        in_specs = (P(self.axis, None), state_spec, P(self.axis),
                    P(self.axis, None), P(self.axis))
        args = (table, opt_state, ids, grads, slots)
        if route is not None:
            in_specs += (self._route_specs(),)
            args += (route,)

        def body(tbl, ostate, lids, lgrads, lslots, rt=None):
            return self.local_update_grouped(
                tbl, ostate, lids, lgrads, lslots, sparse_opt, lr, route=rt
            )

        return jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=(P(self.axis, None), state_spec, P()),
            check_vma=False,
        )(*args)

    def local_update_grouped(self, tbl, ostate, lids, lgrads, lslots,
                             sparse_opt, lr, route=None):
        """Shard-LOCAL lane-sliced gradient combine (see local_lookup)."""
        axis, n_sh, rps = self.axis, self.num_shards, self.rows_per_shard
        lids = self._perm_ids(lids)
        grp = self.lane_groups
        d = self.dim // grp
        b = lids.shape[0]
        cap = capacity_for(b, n_sh, self.capacity_factor)
        # Autodiff writes a position's gradient only into its own slot
        # group (models/ctr_base._field_rows slices it), so slicing
        # that group out is lossless.
        g_d = jnp.take_along_axis(
            lgrads.reshape(b, grp, d), lslots[:, None, None], axis=1
        )[:, 0, :]  # [b, d]
        if route is not None:
            # Route reuse (see local_update): the lookup's (id, slot)-key
            # dedup inverse, send plan and received keys, verbatim.
            inv, send_pos, recv_ids = route
            overflow = jnp.zeros((), jnp.int32)
        else:
            keys, key_sent = self._keys(lids, lslots)
            ukeys, inv = dedup_ids(keys, key_sent)
            send_ids, send_pos, overflow = bucket_by_dest(
                ukeys, n_sh, rps * grp, cap, key_sent, ids_sorted=True
            )
            recv_ids = jax.lax.all_to_all(
                send_ids, axis, split_axis=0, concat_axis=0, tiled=True
            )
        combined = jax.ops.segment_sum(g_d, inv, num_segments=b)
        flat_pos = send_pos.reshape(-1)
        send_g = jnp.where(
            (flat_pos < b)[:, None],
            jnp.take(combined, jnp.clip(flat_pos, 0, b - 1), axis=0),
            0.0,
        ).reshape(n_sh, cap, d)
        if self.wire_dtype is not None:
            send_g = send_g.astype(self.wire_dtype)
        recv_g = jax.lax.all_to_all(
            send_g, axis, split_axis=0, concat_axis=0, tiled=True
        )
        if self.wire_dtype is not None:
            recv_g = recv_g.astype(tbl.dtype)
        rid = recv_ids.reshape(-1) // grp
        rslot = recv_ids.reshape(-1) % grp
        base = jax.lax.axis_index(axis) * rps
        lrow = rid - base
        lrow = jnp.where((lrow >= 0) & (lrow < rps), lrow, rps).astype(
            jnp.int32
        )
        # Re-expand each received d-lane grad into its slot group of a
        # packed row; the optimizer's internal combine then merges
        # same-row keys (different slots -> disjoint lanes, additions
        # against zeros — exact).
        expanded = (
            jax.nn.one_hot(rslot, grp, dtype=recv_g.dtype)[:, :, None]
            * recv_g.reshape(n_sh * cap, d)[:, None, :]
        ).reshape(n_sh * cap, grp * d)
        new_tbl, new_state = sparse_opt.apply(
            tbl, ostate, lrow, expanded, lr, slots=rslot
        )
        return new_tbl, new_state, jax.lax.psum(overflow, axis)


class ColShardedTable:
    """Column (feature-dim) sharding over the ``table`` mesh axis: local
    full-vocab gather of a D/T slice + all_gather of features."""

    def __init__(self, mesh: Mesh, vocab: int, dim: int, *, axis: str = "table",
                 capacity_factor: float = 2.0):
        self.mesh = mesh
        self.axis = axis
        self.num_shards = mesh.shape[axis]
        assert dim % self.num_shards == 0, (dim, self.num_shards)
        self.vocab = vocab
        self.vocab_padded = vocab  # no row padding needed
        self.dim = dim
        # Per-process send capacity (in unique ids) for the update's
        # gradient all_gather — same counted-overflow semantics as the row
        # path (capacity_for with 1 destination ~= the local batch, so the
        # default factor never drops; smaller factors trade wire for
        # counted drops).
        self.capacity_factor = capacity_factor

    def lookup(self, table: jnp.ndarray, ids: jnp.ndarray):
        """table: [V, D] sharded P(None, axis); ids: [B] sharded P('data').
        Returns (activations [B, D] sharded P('data'), overflow scalar —
        the count of corrupt NEGATIVE ids, matching the row path's
        never-silent contract; >= V sentinel ids are legitimate bag
        padding and read as maskable clamped rows)."""

        def local(tbl, lids):
            # mode='clip': sentinel bag-padding ids must come back maskable
            # (jnp.take's default NaN fill poisons 0*NaN masking).
            rows = jnp.take(tbl, lids, axis=0, mode="clip")  # [b, D/T]
            # Corrupt negatives: zero the activation AND count loudly —
            # before round 4 they clamped to row 0 and trained against a
            # real embedding invisibly, while the same input under row
            # sharding was zeroed and counted (review finding).
            neg = lids < 0
            rows = jnp.where(neg[:, None], 0.0, rows)
            full = jax.lax.all_gather(rows, self.axis, axis=1, tiled=True)
            overflow = jax.lax.psum(
                jnp.sum(neg.astype(jnp.int32)), "data"
            )
            return full, overflow

        out, overflow = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(None, self.axis), P("data")),
            out_specs=(P("data", None), P()),
            check_vma=False,
        )(table, ids)
        return out, overflow

    def update(self, table, opt_state, ids, grads, sparse_opt: SparseOptimizer,
               lr, slots=None, route=None):
        # ``route`` accepted for seam uniformity; the col path's lookup
        # has no exchange route to reuse (builder never produces one).
        assert route is None, "col sharding has no lookup route"
        dim, t = self.dim, self.num_shards
        d_local = dim // t

        def local(tbl, ostate, lids, lgrads):
            # The table is replicated over 'data', so every device must see
            # ALL ids/grads or the replicas diverge. Row-path signature
            # discipline before the exchange (SURVEY.md §5 design rule):
            # 1. slice THIS feature shard's D/T columns first;
            # 2. combine local duplicate ids (segment-sum over the slice)
            #    — one D/T-wide grad row per unique id on the wire, and
            #    the combine itself costs D/T, not D;
            # 3. pack into a capacity-bounded [C] buffer with counted,
            #    never-silent overflow (bucket_by_dest, 1 destination).
            b = lids.shape[0]
            uids, inv = dedup_ids(lids, self.vocab)
            # Slice THIS shard's D/T columns BEFORE the combine: inv
            # depends only on ids, so segment-summing the slice is
            # equivalent and T-fold cheaper than combining full-width
            # then slicing (review finding, round 4).
            t_idx = jax.lax.axis_index(self.axis)
            lg_slice = jax.lax.dynamic_slice_in_dim(
                lgrads, t_idx * d_local, d_local, axis=1
            )
            g_slice = jax.ops.segment_sum(lg_slice, inv, num_segments=b)
            cap = capacity_for(b, 1, self.capacity_factor)
            send_ids, send_pos, overflow = bucket_by_dest(
                uids, 1, self.vocab, cap, self.vocab, ids_sorted=True
            )
            flat_pos = send_pos.reshape(-1)
            send_g = jnp.where(
                (flat_pos < b)[:, None],
                jnp.take(g_slice, jnp.clip(flat_pos, 0, b - 1), axis=0),
                0.0,
            )  # [C, D/T]
            all_ids = jax.lax.all_gather(
                send_ids.reshape(-1), "data", axis=0, tiled=True
            )  # [N*C]
            all_g = jax.lax.all_gather(send_g, "data", axis=0, tiled=True)
            # apply()'s internal combine merges same ids arriving from
            # different processes — deterministic and identical on every
            # feature shard, so the psum'd rowwise stat stays aligned.
            new_tbl, new_state = sparse_opt.apply(
                tbl, ostate, all_ids, all_g, lr, stat_axis=self.axis,
                full_dim=dim,
            )
            return new_tbl, new_state, jax.lax.psum(overflow, "data")

        def leaf_spec(leaf):
            # Per-element state (e.g. Adam m [V, D]) is feature-sharded;
            # rowwise scalars ([V]) are replicated across feature shards.
            return P(None, self.axis) if leaf.ndim == 2 else P(None)

        state_spec = jax.tree_util.tree_map(leaf_spec, opt_state)
        return jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(None, self.axis), state_spec, P("data"), P("data", None)),
            out_specs=(P(None, self.axis), state_spec, P()),
            check_vma=False,
        )(table, opt_state, ids, grads)
