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
a local gather + feature all_gather; the gradient path slices the local
feature block and applies the optimizer with the rowwise statistic psum'd
across feature shards (ops/sparse_optim._row_stat).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tfrec_tpu.ops.embedding import combine_duplicate_ids, dedup_ids
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
    first = jnp.searchsorted(sd, sd, side="left")
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
    ):
        self.mesh = mesh
        self.axis = axis
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
        self.sentinel = self.vocab_padded  # one past the padded end

    # ---- forward ----

    def lookup(self, table: jnp.ndarray, ids: jnp.ndarray):
        """table: [V_pad, D] sharded P(axis, None); ids: [B] sharded P(axis).
        Returns (activations [B, D] sharded P(axis), overflow scalar)."""
        axis, n_sh, rps = self.axis, self.num_shards, self.rows_per_shard

        def local(tbl, lids):
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
            return out, jax.lax.psum(overflow, axis)

        return jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(self.axis, None), P(self.axis)),
            out_specs=(P(self.axis, None), P()),
            check_vma=False,
        )(table, ids)

    # ---- transpose: gradient combine + sparse update ----

    def update(
        self,
        table: jnp.ndarray,
        opt_state: Dict[str, jnp.ndarray],
        ids: jnp.ndarray,
        grads: jnp.ndarray,
        sparse_opt: SparseOptimizer,
        lr: float,
    ):
        """Combine grads across devices onto owning shards and apply the
        rowwise optimizer locally. Returns (table, opt_state, overflow)."""
        axis, n_sh, rps = self.axis, self.num_shards, self.rows_per_shard

        def local(tbl, ostate, lids, lgrads):
            b = lids.shape[0]
            cap = capacity_for(b, n_sh, self.capacity_factor)
            # Combine local duplicate ids before sending (transpose of the
            # lookup's dedup): one gradient row per unique id on the wire.
            uids, inv = dedup_ids(lids, self.sentinel)
            combined = jax.ops.segment_sum(lgrads, inv, num_segments=b)
            send_ids, send_pos, overflow = bucket_by_dest(
                uids, n_sh, rps, cap, self.sentinel, ids_sorted=True
            )
            flat_pos = send_pos.reshape(-1)
            send_g = jnp.where(
                (flat_pos < b)[:, None],
                jnp.take(combined, jnp.clip(flat_pos, 0, b - 1), axis=0),
                0.0,
            ).reshape(n_sh, cap, -1)
            recv_ids = jax.lax.all_to_all(
                send_ids, axis, split_axis=0, concat_axis=0, tiled=True
            )
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
            fused_ok = False
            if (
                self.kernels == "pallas"
                and sparse_opt.name == "rowwise_adagrad"
                # lane-packed tables ([V, G] accumulator) need per-group
                # stats; the fused kernel keeps one rowwise scalar.
                and ostate["acc"].ndim == 1
            ):
                from tfrec_tpu.kernels.scatter_pallas import fused_scatter_supported

                fused_ok = fused_scatter_supported(tbl.shape[0], tbl.shape[1])
            if fused_ok:
                from tfrec_tpu.kernels.scatter_pallas import fused_rowwise_adagrad

                uids, combined = combine_duplicate_ids(lrow, flat_g, sentinel=rps)
                new_tbl, new_acc = fused_rowwise_adagrad(
                    tbl, ostate["acc"], uids, combined, lr, eps=sparse_opt.eps
                )
                new_state = {"acc": new_acc}
            else:
                new_tbl, new_state = sparse_opt.apply(tbl, ostate, lrow, flat_g, lr)
            return new_tbl, new_state, jax.lax.psum(overflow, axis)

        state_spec = jax.tree_util.tree_map(
            lambda leaf: P(self.axis, *([None] * (leaf.ndim - 1))), opt_state
        )
        return jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(self.axis, None), state_spec, P(self.axis), P(self.axis, None)),
            out_specs=(P(self.axis, None), state_spec, P()),
            check_vma=False,
        )(table, opt_state, ids, grads)


class ColShardedTable:
    """Column (feature-dim) sharding over the ``table`` mesh axis: local
    full-vocab gather of a D/T slice + all_gather of features."""

    def __init__(self, mesh: Mesh, vocab: int, dim: int, *, axis: str = "table"):
        self.mesh = mesh
        self.axis = axis
        self.num_shards = mesh.shape[axis]
        assert dim % self.num_shards == 0, (dim, self.num_shards)
        self.vocab = vocab
        self.vocab_padded = vocab  # no row padding needed
        self.dim = dim

    def lookup(self, table: jnp.ndarray, ids: jnp.ndarray):
        """table: [V, D] sharded P(None, axis); ids: [B] sharded P('data').
        Returns (activations [B, D] sharded P('data'), overflow=0)."""

        def local(tbl, lids):
            # mode='clip': sentinel bag-padding ids must come back maskable
            # (jnp.take's default NaN fill poisons 0*NaN masking).
            rows = jnp.take(tbl, lids, axis=0, mode="clip")  # [b, D/T]
            full = jax.lax.all_gather(rows, self.axis, axis=1, tiled=True)
            return full

        out = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(None, self.axis), P("data")),
            out_specs=P("data", None),
            check_vma=False,
        )(table, ids)
        return out, jnp.zeros((), jnp.int32)

    def update(self, table, opt_state, ids, grads, sparse_opt: SparseOptimizer, lr):
        dim, t = self.dim, self.num_shards
        d_local = dim // t

        def local(tbl, ostate, lids, lgrads):
            # The table is replicated over 'data', so every device must see
            # ALL ids/grads or the replicas diverge.
            all_ids = jax.lax.all_gather(lids, "data", axis=0, tiled=True)
            all_g = jax.lax.all_gather(lgrads, "data", axis=0, tiled=True)
            t_idx = jax.lax.axis_index(self.axis)
            g_local = jax.lax.dynamic_slice_in_dim(
                all_g, t_idx * d_local, d_local, axis=1
            )
            new_tbl, new_state = sparse_opt.apply(
                tbl, ostate, all_ids, g_local, lr, stat_axis=self.axis, full_dim=dim
            )
            return new_tbl, new_state

        def leaf_spec(leaf):
            # Per-element state (e.g. Adam m [V, D]) is feature-sharded;
            # rowwise scalars ([V]) are replicated across feature shards.
            return P(None, self.axis) if leaf.ndim == 2 else P(None)

        state_spec = jax.tree_util.tree_map(leaf_spec, opt_state)
        new_tbl, new_state = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(None, self.axis), state_spec, P("data"), P("data", None)),
            out_specs=(P(None, self.axis), state_spec),
            check_vma=False,
        )(table, opt_state, ids, grads)
        return new_tbl, new_state, jnp.zeros((), jnp.int32)
