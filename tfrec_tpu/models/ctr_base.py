"""Shared plumbing for CTR / feature-interaction models over multi-field
categorical + dense inputs (FM, DCN, DeepFM, Wide&Deep, DLRM).

Batch convention: {"dense": [B, Dd] f32 (Dd may be 0), "cat": [B, F] i32,
"label": [B] f32}. One embedding table per field ("field_{f}"), plus
optional per-field linear (vocab x 1) tables for models with a wide/FM
linear term.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from tfrec_tpu.models.base import DataSpec, RecModel
from tfrec_tpu.ops.embedding import TableSpec


class CTRBase(RecModel):
    use_linear_tables = False

    def __init__(self, data_spec: DataSpec, embed_dim: int):
        assert data_spec.kind == "ctr"
        self.data_spec = data_spec
        self.embed_dim = embed_dim

    @property
    def num_fields(self) -> int:
        return len(self.data_spec.field_vocabs)

    def table_specs(self) -> Tuple[TableSpec, ...]:
        specs = [
            TableSpec(f"field_{f}", v, self.embed_dim)
            for f, v in enumerate(self.data_spec.field_vocabs)
        ]
        if self.use_linear_tables:
            specs += [
                TableSpec(f"lin_{f}", v, 1, initializer="zeros")
                for f, v in enumerate(self.data_spec.field_vocabs)
            ]
        return tuple(specs)

    def lookup_ids(self, batch) -> Dict[str, jnp.ndarray]:
        cat = batch["cat"]
        ids = {f"field_{f}": cat[:, f] for f in range(self.num_fields)}
        if self.use_linear_tables:
            ids.update({f"lin_{f}": cat[:, f] for f in range(self.num_fields)})
        return ids

    def field_stack(self, gathered) -> jnp.ndarray:
        """[B, F, D] stacked field embeddings."""
        return jnp.stack(
            [gathered[f"field_{f}"] for f in range(self.num_fields)], axis=1
        )

    def linear_sum(self, gathered) -> jnp.ndarray:
        """[B] sum of per-field linear weights."""
        return sum(
            gathered[f"lin_{f}"][:, 0] for f in range(self.num_fields)
        )

    def flat_input(self, gathered, batch) -> jnp.ndarray:
        """[B, F*D + Dd]: concatenated embeddings + dense features."""
        flat = self.field_stack(gathered).reshape(batch["cat"].shape[0], -1)
        if self.data_spec.num_dense > 0:
            flat = jnp.concatenate([flat, batch["dense"]], axis=-1)
        return flat


def fm_second_order(field_vecs: jnp.ndarray) -> jnp.ndarray:
    """0.5 * (||sum_f v_f||^2 - sum_f ||v_f||^2): all pairwise interactions
    in O(F*D) — the classic FM identity. field_vecs: [B, F, D] -> [B]."""
    total = jnp.sum(field_vecs, axis=1)
    sum_sq = jnp.sum(total * total, axis=-1)
    sq_sum = jnp.sum(field_vecs * field_vecs, axis=(1, 2))
    return 0.5 * (sum_sq - sq_sum)
