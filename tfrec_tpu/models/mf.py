"""Matrix factorization (MF) — the BPR-retrieval workhorse.

Capability target: the reference family's ``BPR``/``MF`` recommenders
(SURVEY.md §2a, [CONTRACT BASELINE.json:7]): score(u,i) = <p_u, q_i> + b_i,
trained pairwise (BPR) or pointwise. TPU-native framing: user/item factors
are embedding tables on the sparse-optimizer path; full-catalog scoring is a
single MXU matmul ``P[users] @ Q^T``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tfrec_tpu.models.base import DataSpec, RecModel
from tfrec_tpu.ops.embedding import TableSpec


class MF(RecModel):
    def __init__(self, data_spec: DataSpec, embed_dim: int, use_bias: bool = True):
        assert data_spec.kind == "interaction"
        self.data_spec = data_spec
        self.embed_dim = embed_dim
        self.use_bias = use_bias

    def table_specs(self) -> Tuple[TableSpec, ...]:
        u, v, d = self.data_spec.num_users, self.data_spec.num_items, self.embed_dim
        specs = [
            TableSpec("user_emb", u, d),
            TableSpec("item_emb", v, d),
        ]
        if self.use_bias:
            specs.append(TableSpec("item_bias", v, 1, initializer="zeros"))
        return tuple(specs)

    def init_dense(self, rng: jax.Array):
        return {}

    def lookup_ids(self, batch) -> Dict[str, jnp.ndarray]:
        items = self.pair_item_ids(batch) if self.is_pairwise(batch) else batch["item"]
        ids = {"user_emb": batch["user"], "item_emb": items}
        if self.use_bias:
            ids["item_bias"] = items
        return ids

    def _score(self, u_vec, i_vec, i_bias) -> jnp.ndarray:
        s = jnp.sum(u_vec * i_vec, axis=-1)
        if i_bias is not None:
            s = s + i_bias[:, 0]
        return s

    def forward(self, dense, gathered, batch, *, rng=None) -> jnp.ndarray:
        u = gathered["user_emb"]
        i = gathered["item_emb"]
        b = gathered.get("item_bias")
        if self.is_pairwise(batch):
            bsz = u.shape[0]
            if "negs" in batch:  # multi-negative: [B, 1+K] score matrix
                k = batch["negs"].shape[1]
                # items layout: [pos (B); negs.reshape(-1) (B*K, user-major)]
                u_rep = jnp.concatenate([u, jnp.repeat(u, k, axis=0)])
                s = self._score(u_rep, i, b)  # [B*(1+K)]
                return jnp.concatenate(
                    [s[:bsz, None], s[bsz:].reshape(bsz, k)], axis=1
                )
            if "neg" not in batch:  # in-batch negatives: [B, B] MXU matmul
                scores = jnp.dot(u, i.T, preferred_element_type=jnp.float32)
                if b is not None:
                    scores = scores + b[:, 0][None, :]
                return scores
            s_pos = self._score(u, i[:bsz], None if b is None else b[:bsz])
            s_neg = self._score(u, i[bsz:], None if b is None else b[bsz:])
            return s_pos - s_neg
        return self._score(u, i, b)

    def dot_decomposition(self):
        from tfrec_tpu.models.base import DotRetrieval

        return DotRetrieval(
            "user_emb", "item_emb", "item_bias" if self.use_bias else None
        )

    def score_all(self, params, user_ids: jnp.ndarray) -> jnp.ndarray:
        t = params["tables"]
        u = jnp.take(t["user_emb"], user_ids, axis=0)  # [B, D]
        scores = jnp.dot(
            u, t["item_emb"].T, preferred_element_type=jnp.float32
        )  # MXU
        if self.use_bias:
            scores = scores + t["item_bias"][:, 0][None, :]
        return scores
