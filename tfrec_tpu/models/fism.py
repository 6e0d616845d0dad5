"""FISM — factored item similarity (item-based retrieval without user
factors).

Capability target: the reference family's long-tail item-based
recommenders (FISM/NAIS lineage — SURVEY.md §2a "other zoo"). The user
representation is the aggregate of the P-embeddings of the user's train
history (excluding the scored item), dotted against the target item's
Q-embedding:

    score(u, i) = b_i + <(1 / n_{u,i}^alpha) * sum_{j in R_u \\ {i}} p_j, q_i>

TPU-native framing: histories arrive IN THE BATCH as sentinel-padded
[B, H] id matrices (data/samplers.py ``build_history`` /
``with_history``), so the step stays static-shaped and the history
gather rides the same sparse-table path as every other lookup (sentinel
= num_items rows are masked in the forward and dropped by the scatter,
exactly the multi-hot CTR convention). The self-exclusion ``R_u \\ {i}``
is a masked subtraction, not a dynamic filter.

Eval: ``score_all`` consumes the full history matrix attached by the
trainer (``attach_history``) — an O(U*H) buffer, the inherent footprint
of the item-based family, acceptable at the MovieLens scales this model
targets (it is jit-closure-captured; do not use FISM at 100M-user
scale).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tfrec_tpu.models.base import DataSpec, RecModel
from tfrec_tpu.ops.embedding import TableSpec


class FISM(RecModel):
    def __init__(self, data_spec: DataSpec, embed_dim: int,
                 alpha: float = 0.5, max_history: int = 50):
        assert data_spec.kind == "interaction"
        self.data_spec = data_spec
        self.embed_dim = embed_dim
        self.alpha = alpha
        self.max_history = max_history
        self._hist = None  # [U, H] jnp int32 (sentinel-padded), eval only
        self._hist_len = None

    # ---- protocol ----

    def table_specs(self) -> Tuple[TableSpec, ...]:
        v, d = self.data_spec.num_items, self.embed_dim
        return (
            TableSpec("item_p", v, d),
            TableSpec("item_q", v, d),
            TableSpec("item_bias", v, 1, initializer="zeros"),
        )

    def init_dense(self, rng: jax.Array):
        return {}

    def needs_history(self) -> bool:
        return True

    def attach_history(self, hist, hist_len) -> None:
        """Store the [U, H] train-history matrix for score_all (eval)."""
        self._hist = jnp.asarray(hist)
        self._hist_len = jnp.asarray(hist_len)

    def lookup_ids(self, batch) -> Dict[str, jnp.ndarray]:
        items = self.pair_item_ids(batch) if self.is_pairwise(batch) else batch["item"]
        return {
            "item_p": batch["hist"].reshape(-1),
            "item_q": items,
            "item_bias": items,
        }

    # ---- scoring ----

    def _user_terms(self, p_rows, hist):
        """(masked P rows [B, H, D], base sum [B, D], count [B])."""
        v = self.data_spec.num_items
        b, h = hist.shape
        rows = p_rows.reshape(b, h, -1)
        valid = (hist < v)[:, :, None]
        rows = jnp.where(valid, rows, 0.0)
        return rows, rows.sum(axis=1), valid[:, :, 0].sum(axis=1)

    def _score(self, rows, base_sum, n, hist, items, q, bias):
        """score(u, items) with self-exclusion of ``items`` from the
        history. All [B]-shaped."""
        hit = hist == items[:, None]  # [B, H]
        excl = jnp.einsum("bh,bhd->bd", hit.astype(rows.dtype), rows)
        n_eff = jnp.maximum(n - hit.sum(axis=1), 1).astype(rows.dtype)
        u_vec = (base_sum - excl) / (n_eff[:, None] ** self.alpha)
        return jnp.sum(u_vec * q, axis=-1) + bias[:, 0]

    def forward(self, dense, gathered, batch, *, rng=None) -> jnp.ndarray:
        hist = batch["hist"]
        rows, base_sum, n = self._user_terms(gathered["item_p"], hist)
        q = gathered["item_q"]
        bias = gathered["item_bias"]
        if self.is_pairwise(batch):
            if "negs" in batch or "neg" not in batch:
                raise NotImplementedError(
                    "FISM supports single-negative pairwise (bpr/hinge) "
                    "and pointwise batches"
                )
            bsz = hist.shape[0]
            s_pos = self._score(
                rows, base_sum, n, hist, batch["pos"], q[:bsz], bias[:bsz]
            )
            s_neg = self._score(
                rows, base_sum, n, hist, batch["neg"], q[bsz:], bias[bsz:]
            )
            return s_pos - s_neg
        return self._score(rows, base_sum, n, hist, batch["item"], q, bias)

    def score_all(self, params, user_ids: jnp.ndarray) -> jnp.ndarray:
        if self._hist is None:
            raise ValueError(
                "FISM.score_all needs attach_history(hist, hist_len) "
                "(the trainer does this from the train split)"
            )
        t = params["tables"]
        hist = jnp.take(self._hist, user_ids, axis=0)  # [B, H]
        p_rows = jnp.take(
            t["item_p"], hist.reshape(-1), axis=0, mode="clip"
        )
        rows, base_sum, n = self._user_terms(p_rows, hist)
        # Train items are excluded from eval top-k by the evaluator, so
        # the self-exclusion term is irrelevant for ranked candidates.
        u_vec = base_sum / (
            jnp.maximum(n, 1).astype(base_sum.dtype)[:, None] ** self.alpha
        )
        scores = jnp.dot(u_vec, t["item_q"].T, preferred_element_type=jnp.float32)
        return scores + t["item_bias"][:, 0][None, :]
