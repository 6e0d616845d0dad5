"""Popularity baseline: score(u, i) = b_i (bias-only model).

The reference family ships a ``Pop`` non-personalized baseline; here it is
the degenerate bias-only member of the MF family — trained with any
objective it converges to item popularity, and it anchors eval sanity
checks (personalized models must beat it).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tfrec_tpu.models.base import DataSpec, RecModel
from tfrec_tpu.ops.embedding import TableSpec


class Pop(RecModel):
    def __init__(self, data_spec: DataSpec):
        assert data_spec.kind == "interaction"
        self.data_spec = data_spec

    def table_specs(self) -> Tuple[TableSpec, ...]:
        return (TableSpec("item_bias", self.data_spec.num_items, 1, initializer="zeros"),)

    def init_dense(self, rng: jax.Array):
        return {}

    def lookup_ids(self, batch) -> Dict[str, jnp.ndarray]:
        items = self.pair_item_ids(batch) if self.is_pairwise(batch) else batch["item"]
        return {"item_bias": items}

    def forward(self, dense, gathered, batch, *, rng=None) -> jnp.ndarray:
        b = gathered["item_bias"][:, 0]
        if self.is_pairwise(batch):
            bsz = batch["user"].shape[0]
            if "negs" in batch:
                k = batch["negs"].shape[1]
                return jnp.concatenate(
                    [b[:bsz, None], b[bsz:].reshape(bsz, k)], axis=1
                )
            if "neg" not in batch:  # in-batch negatives: [B, B] bias rows
                return jnp.broadcast_to(b[None, :], (bsz, bsz))
            return b[:bsz] - b[bsz:]
        return b

    def score_all(self, params, user_ids: jnp.ndarray) -> jnp.ndarray:
        bias = params["tables"]["item_bias"][:, 0]
        return jnp.broadcast_to(bias[None, :], (user_ids.shape[0], bias.shape[0]))
