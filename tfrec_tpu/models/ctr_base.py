"""Shared plumbing for CTR / feature-interaction models over multi-field
categorical + dense inputs (FM, DCN, DeepFM, Wide&Deep, DLRM).

Batch convention: {"dense": [B, Dd] f32 (Dd may be 0), "cat": [B, sum(W_f)]
i32, "label": [B] f32} — a width-W_f multi-hot field occupies W_f columns,
padded with the sentinel ``vocab_f`` (clamped on gather, masked out of the
combine, dropped by the sparse-optimizer scatter). One embedding table per
field ("field_{f}"), plus optional per-field linear (vocab x 1) tables.
Multi-hot embeddings use a masked MEAN combiner; linear terms use masked
SUM.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from tfrec_tpu.models.base import DataSpec, RecModel
from tfrec_tpu.ops.embedding import TableSpec


class CTRBase(RecModel):
    use_linear_tables = False
    # Models whose interaction needs EQUAL field dims (FM second-order,
    # DLRM dot-interactions, stacked [B, F, D]) set this False; concat-
    # based towers (DCN, Wide&Deep deep part) accept mixed dims.
    supports_mixed_dims = False

    def __init__(self, data_spec: DataSpec, embed_dim: int, field_dims=None):
        assert data_spec.kind == "ctr"
        self.data_spec = data_spec
        self.embed_dim = embed_dim
        nf = len(data_spec.field_vocabs)
        if field_dims:
            field_dims = tuple(field_dims)
            assert len(field_dims) == nf, (field_dims, nf)
            if not self.supports_mixed_dims and len(set(field_dims)) > 1:
                raise ValueError(
                    f"{type(self).__name__} needs equal field dims "
                    "(its interaction stacks/pairs field vectors); "
                    "mixed field_dims work with dcn/dcnv2/widedeep"
                )
            self.field_dims = field_dims
        else:
            self.field_dims = (embed_dim,) * nf
        self.widths = data_spec.field_widths or (1,) * nf
        self._offsets = []
        off = 0
        for w in self.widths:
            self._offsets.append(off)
            off += w
        self.cat_columns = off
        # Vocab offsets for the stacked-table mode (one [sum V_f, D] table
        # for all fields — model.stack_tables): field f's row r lives at
        # global row _voffsets[f] + r; the global sentinel is total_vocab.
        self.stack_tables = False
        self.lane_pack = False
        self._voffsets = []
        voff = 0
        for v in data_spec.field_vocabs:
            self._voffsets.append(voff)
            voff += v
        self.total_vocab = voff

    def enable_stacked_tables(self) -> "CTRBase":
        """Fuse all per-field tables into ONE [sum(V_f), D] table so the
        step performs 1 gather + 1 duplicate-combine + 1 sparse update
        (and, on a mesh, 1 all-to-all set) instead of F of each — the
        table-batching optimization of production DLRM systems, here as a
        layout change invisible to the math (per-row optimizers are
        row-local; field id spaces are disjoint after offsetting).
        Requires equal per-field dims."""
        if len(set(self.field_dims)) > 1:
            raise ValueError(
                "model.stack_tables requires equal per-field embedding "
                f"dims, got {self.field_dims}"
            )
        if self.lane_pack:
            raise ValueError("stack_tables and lane_pack are mutually exclusive")
        self.stack_tables = True
        return self

    def enable_lane_packing(self) -> "CTRBase":
        """Pack P = 128 // d fields side by side in one [maxV, P*d]
        physical table (plus all linear tables in <=128-lane packs).

        Why: TPU physical layout pads the minor (lane) dim to 128, so a
        d<128 table's rowwise-optimizer sweep costs the FULL 128 lanes —
        measured dim-independent ~270-290 us/table (docs/PERF.md "In-situ
        step attribution"). Packing P logical tables into the dead lanes
        divides the number of swept tables by P (the dominant sparse-path
        term at the flagship d=32) and the physical HBM footprint with it.

        Exactness: each pack keeps PER-GROUP rowwise optimizer state
        ([V, P] accumulators — TableSpec.lane_groups); a row touched by
        one field contributes exactly 0 gradient and 0 accumulator gain
        to its pack-mates (adagrad accumulation of zero is a no-op), so
        the update math is bit-for-bit the per-table rule. rowwise_adam
        is refused (its EMA decays on zero-grad updates) —
        ops/sparse_optim.py. Unlike the row-level packed-reshape scatter
        (measured loser: 26 extra per-table passes), packing is a pure
        LAYOUT change: no extra per-step work exists to pay for.
        """
        if self.stack_tables:
            raise ValueError("stack_tables and lane_pack are mutually exclusive")
        if len(set(self.field_dims)) > 1:
            raise ValueError(
                "model.lane_pack requires equal per-field embedding dims, "
                f"got {self.field_dims}"
            )
        d = self.field_dims[0]
        if d >= 128 or 128 % d != 0:
            raise ValueError(
                f"model.lane_pack needs embed_dim < 128 dividing 128 "
                f"(got {d}); at d >= 128 rows already fill their lane "
                "lines and packing buys nothing"
            )
        p = 128 // d
        # Group by descending vocab so pack row counts (max over the
        # group) waste the least memory under mixed vocabs.
        order = sorted(
            range(self.num_fields),
            key=lambda f: -self.data_spec.field_vocabs[f],
        )
        self._packs = [order[i : i + p] for i in range(0, len(order), p)]
        self._pack_of = {}
        for k, grp in enumerate(self._packs):
            for slot, f in enumerate(grp):
                self._pack_of[f] = (k, slot)
        if self.use_linear_tables:
            self._lin_packs = [
                order[i : i + 128] for i in range(0, len(order), 128)
            ]
            self._lin_pack_of = {}
            for k, grp in enumerate(self._lin_packs):
                for slot, f in enumerate(grp):
                    self._lin_pack_of[f] = (k, slot)
        self.lane_pack = True
        return self

    def _pack_vocab(self, grp) -> int:
        return max(self.data_spec.field_vocabs[f] for f in grp)

    def lane_slot_widths(self, name: str):
        """Slot layout of a lane-packed table's flat id vector: the tuple
        of per-slot bag widths in ``lookup_ids[name]`` concat order (slot
        s owns lanes [s*d, (s+1)*d) of the packed row; position blocks of
        B*W_s consecutive ids belong to slot s). None when ``name`` is not
        a lane-packed table. The sharded planners use this to move only
        the owning d-lane group over the all-to-all wire instead of the
        full 128-lane packed row, and grouped rowwise_adam uses it to
        decay exactly the touched lane groups."""
        if not self.lane_pack:
            return None
        if name.startswith("pack_"):
            grp = self._packs[int(name[len("pack_"):])]
        elif name.startswith("linpack_"):
            grp = self._lin_packs[int(name[len("linpack_"):])]
        else:
            return None
        return tuple(self.widths[f] for f in grp)

    def init(self, rng):
        """Layout-invariant init: the lane-packed layout draws the SAME
        per-field random streams as the per-field layout (each logical
        table's block is bit-identical), so flipping lane packing on or
        off never changes a seeded run's trajectory beyond fp
        reassociation. Pack rows above a member field's vocab are zeros
        (never gathered unmasked; sentinel scatters drop)."""
        if not self.lane_pack:
            return super().init(rng)
        import jax

        from tfrec_tpu.ops.embedding import init_tables

        k_tables, k_dense = jax.random.split(rng)
        saved, self.lane_pack = self.lane_pack, False
        try:
            logical = init_tables(k_tables, self.table_specs())
        finally:
            self.lane_pack = saved
        d = self.field_dims[0]
        tables = {}
        for k, grp in enumerate(self._packs):
            t = jnp.zeros((self._pack_vocab(grp), len(grp) * d), jnp.float32)
            for slot, f in enumerate(grp):
                vf = self.data_spec.field_vocabs[f]
                t = t.at[:vf, slot * d : (slot + 1) * d].set(
                    logical[f"field_{f}"]
                )
            tables[f"pack_{k}"] = t
        if self.use_linear_tables:
            for k, grp in enumerate(self._lin_packs):
                t = jnp.zeros((self._pack_vocab(grp), len(grp)), jnp.float32)
                for slot, f in enumerate(grp):
                    vf = self.data_spec.field_vocabs[f]
                    t = t.at[:vf, slot : slot + 1].set(logical[f"lin_{f}"])
                tables[f"linpack_{k}"] = t
        return {"tables": tables, "dense": self.init_dense(k_dense)}

    @property
    def num_fields(self) -> int:
        return len(self.data_spec.field_vocabs)

    @property
    def multi_hot(self) -> bool:
        return any(w > 1 for w in self.widths)

    def table_specs(self) -> Tuple[TableSpec, ...]:
        if self.lane_pack:
            d = self.field_dims[0]
            specs = [
                TableSpec(
                    f"pack_{k}", self._pack_vocab(grp), len(grp) * d,
                    lane_groups=len(grp),
                    # Per-field init scale (the spec default 1/sqrt(dim)
                    # would shrink with the PACKED width).
                    init_scale=1.0 / (d ** 0.5),
                )
                for k, grp in enumerate(self._packs)
            ]
            if self.use_linear_tables:
                specs += [
                    TableSpec(
                        f"linpack_{k}", self._pack_vocab(grp), len(grp),
                        lane_groups=len(grp), initializer="zeros",
                    )
                    for k, grp in enumerate(self._lin_packs)
                ]
            return tuple(specs)
        if self.stack_tables:
            specs = [TableSpec("fields", self.total_vocab, self.field_dims[0])]
            if self.use_linear_tables:
                specs.append(
                    TableSpec("lin", self.total_vocab, 1, initializer="zeros")
                )
            return tuple(specs)
        specs = [
            TableSpec(f"field_{f}", v, self.field_dims[f])
            for f, v in enumerate(self.data_spec.field_vocabs)
        ]
        if self.use_linear_tables:
            specs += [
                TableSpec(f"lin_{f}", v, 1, initializer="zeros")
                for f, v in enumerate(self.data_spec.field_vocabs)
            ]
        return tuple(specs)

    def _field_ids(self, batch, f: int) -> jnp.ndarray:
        """Flat ids for field f: [B * W_f] (sentinel-padded for bags)."""
        off, w = self._offsets[f], self.widths[f]
        cols = batch["cat"][:, off : off + w]
        return cols.reshape(-1)

    def _global_ids(self, batch, xp=jnp) -> jnp.ndarray:
        """[B * sum(W_f)] ids into the stacked table: field-local id +
        vocab offset; per-field sentinels (>= V_f) map to the GLOBAL
        sentinel (total_vocab) so clamp-gather and drop-scatter semantics
        carry over unchanged."""
        parts = []
        for f in range(self.num_fields):
            off, w = self._offsets[f], self.widths[f]
            cols = batch["cat"][:, off : off + w]
            v = self.data_spec.field_vocabs[f]
            parts.append(
                xp.where(cols < v, cols + self._voffsets[f], self.total_vocab)
            )
        return xp.concatenate(parts, axis=1).reshape(-1)

    def _pack_ids(self, batch, grp, xp=jnp) -> jnp.ndarray:
        """Concat of the group's per-field flat ids, per-field sentinels
        remapped to the PACK vocab (>= every member's V_f) so clamp-gather
        and drop-scatter semantics carry over."""
        vp = self._pack_vocab(grp)
        parts = []
        for f in grp:
            ids = self._field_ids(batch, f)
            parts.append(
                xp.where(ids < self.data_spec.field_vocabs[f], ids, vp)
            )
        return xp.concatenate(parts)

    def lookup_ids(self, batch, xp=jnp) -> Dict[str, jnp.ndarray]:
        """``xp=np`` runs the same extraction on host numpy batches (the
        input pipeline's host-dedup path — train.host_dedup — needs the
        per-table ids before device dispatch)."""
        if self.lane_pack:
            ids = {
                f"pack_{k}": self._pack_ids(batch, grp, xp)
                for k, grp in enumerate(self._packs)
            }
            if self.use_linear_tables:
                ids.update({
                    f"linpack_{k}": self._pack_ids(batch, grp, xp)
                    for k, grp in enumerate(self._lin_packs)
                })
            return ids
        if self.stack_tables:
            gids = self._global_ids(batch, xp)
            ids = {"fields": gids}
            if self.use_linear_tables:
                ids["lin"] = gids
            return ids
        ids = {f"field_{f}": self._field_ids(batch, f) for f in range(self.num_fields)}
        if self.use_linear_tables:
            ids.update(
                {f"lin_{f}": ids[f"field_{f}"] for f in range(self.num_fields)}
            )
        return ids

    def _combine(self, gathered_rows: jnp.ndarray, batch, f: int, mean: bool) -> jnp.ndarray:
        """[B*W, D] rows -> [B, D] masked mean/sum over the bag width."""
        w = self.widths[f]
        bsz = batch["cat"].shape[0]
        if w == 1:
            return gathered_rows
        vocab = self.data_spec.field_vocabs[f]
        ids = self._field_ids(batch, f).reshape(bsz, w)
        valid = ids < vocab  # [B, W]
        # where (not multiply): padded rows may be NaN-filled by the gather.
        rows = jnp.where(
            valid[:, :, None], gathered_rows.reshape(bsz, w, -1), 0.0
        )
        out = jnp.sum(rows, axis=1)
        if mean:
            denom = jnp.maximum(jnp.sum(valid.astype(out.dtype), axis=1), 1.0)
            out = out / denom[:, None]
        return out

    def _field_rows(self, gathered, batch, f: int, prefix: str = "field"):
        """[B*W_f, d] gathered rows for field f in any table layout."""
        if self.lane_pack:
            b = batch["cat"].shape[0]
            if prefix == "field":
                k, slot = self._pack_of[f]
                grp, d = self._packs[k], self.field_dims[0]
                rows = gathered[f"pack_{k}"]
            else:
                k, slot = self._lin_pack_of[f]
                grp, d = self._lin_packs[k], 1
                rows = gathered[f"linpack_{k}"]
            start = b * sum(self.widths[g] for g in grp[:slot])
            n = b * self.widths[f]
            return rows[start : start + n, slot * d : (slot + 1) * d]
        if self.stack_tables:
            key = "fields" if prefix == "field" else "lin"
            b = batch["cat"].shape[0]
            rows = gathered[key].reshape(b, self.cat_columns, -1)
            off, w = self._offsets[f], self.widths[f]
            return rows[:, off : off + w, :].reshape(b * w, -1)
        return gathered[f"{prefix}_{f}"]

    def field_list(self, gathered, batch) -> list:
        """Per-field combined embeddings: list of [B, d_f] (mixed dims ok)."""
        return [
            self._combine(self._field_rows(gathered, batch, f), batch, f, mean=True)
            for f in range(self.num_fields)
        ]

    def field_stack(self, gathered, batch) -> jnp.ndarray:
        """[B, F, D] combined field embeddings (equal dims required)."""
        return jnp.stack(self.field_list(gathered, batch), axis=1)

    def linear_sum(self, gathered, batch) -> jnp.ndarray:
        """[B] masked sum of per-field linear weights."""
        total = 0.0
        for f in range(self.num_fields):
            rows = self._field_rows(gathered, batch, f, prefix="lin")
            total = total + self._combine(rows, batch, f, mean=False)[:, 0]
        return total

    def flat_input(self, gathered, batch) -> jnp.ndarray:
        """[B, sum(d_f) + Dd]: concatenated field embeddings + dense
        features (supports mixed per-field dims)."""
        parts = self.field_list(gathered, batch)
        if self.data_spec.num_dense > 0:
            parts = parts + [batch["dense"]]
        return jnp.concatenate(parts, axis=-1)


def fm_second_order(field_vecs: jnp.ndarray) -> jnp.ndarray:
    """0.5 * (||sum_f v_f||^2 - sum_f ||v_f||^2): all pairwise interactions
    in O(F*D) — the classic FM identity. field_vecs: [B, F, D] -> [B]."""
    total = jnp.sum(field_vecs, axis=1)
    sum_sq = jnp.sum(total * total, axis=-1)
    sq_sum = jnp.sum(field_vecs * field_vecs, axis=(1, 2))
    return 0.5 * (sum_sq - sq_sum)
