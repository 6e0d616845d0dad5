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

    @property
    def num_fields(self) -> int:
        return len(self.data_spec.field_vocabs)

    @property
    def multi_hot(self) -> bool:
        return any(w > 1 for w in self.widths)

    def table_specs(self) -> Tuple[TableSpec, ...]:
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

    def lookup_ids(self, batch) -> Dict[str, jnp.ndarray]:
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

    def field_list(self, gathered, batch) -> list:
        """Per-field combined embeddings: list of [B, d_f] (mixed dims ok)."""
        return [
            self._combine(gathered[f"field_{f}"], batch, f, mean=True)
            for f in range(self.num_fields)
        ]

    def field_stack(self, gathered, batch) -> jnp.ndarray:
        """[B, F, D] combined field embeddings (equal dims required)."""
        return jnp.stack(self.field_list(gathered, batch), axis=1)

    def linear_sum(self, gathered, batch) -> jnp.ndarray:
        """[B] masked sum of per-field linear weights."""
        total = 0.0
        for f in range(self.num_fields):
            total = total + self._combine(gathered[f"lin_{f}"], batch, f, mean=False)[:, 0]
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
