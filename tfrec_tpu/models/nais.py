"""NAIS — neural attentive item similarity (He et al. 2018), the
attention upgrade of FISM in the reference family's long-tail zoo
(SURVEY.md §2a "other zoo": FISM/NAIS lineage).

    score(u, i) = b_i + sum_{j in R_u \\ {i}} a_ij * <p_j, q_i>
    f_ij  = h^T relu(W (p_j * q_i) + c)          (the "product" variant)
    a_ij  = exp(f_ij) / (sum_j exp(f_ij))^beta   (beta < 1 smooths the
                                                  softmax for long histories)

TPU-native framing: identical batch protocol to FISM — sentinel-padded
[B, H] histories ride the sparse-table path; self-exclusion and padding
are masks on the attention logits, never dynamic shapes. The attention
MLP is dense-param (W [D, A], c [A], h [A]) so it trains on the Adam
path.

Eval: ``score_all`` is O(B * H * V * A) — the price of target-aware
attention (no user vector can be precomputed). It is computed in
item chunks via ``lax.map`` with the C-independent tensor
``t = p * W`` ([B, H, A, D]) hoisted out of the chunk loop, bounding
peak memory at ~B*H*max(A*D, C*A) floats. Intended for MovieLens-scale
catalogs, like the rest of the item-similarity family.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tfrec_tpu.models.base import DataSpec, RecModel
from tfrec_tpu.ops.embedding import TableSpec

_F_CLIP = 12.0  # |f| bound: keeps exp() finite without a rank-breaking max-shift


class NAIS(RecModel):
    def __init__(self, data_spec: DataSpec, embed_dim: int,
                 attention_dim: int = 16, beta: float = 0.5,
                 max_history: int = 50):
        assert data_spec.kind == "interaction"
        self.data_spec = data_spec
        self.embed_dim = embed_dim
        self.attention_dim = attention_dim
        self.beta = beta
        self.max_history = max_history
        self._hist = None
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
        d, a = self.embed_dim, self.attention_dim
        k_w, k_h = jax.random.split(rng)
        lim = jnp.sqrt(6.0 / (d + a))
        return {
            "att_w": jax.random.uniform(k_w, (d, a), jnp.float32, -lim, lim),
            "att_c": jnp.zeros((a,)),
            "att_h": jax.random.uniform(
                k_h, (a,), jnp.float32, -1.0 / a**0.5, 1.0 / a**0.5
            ),
        }

    def needs_history(self) -> bool:
        return True

    def attach_history(self, hist, hist_len) -> None:
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

    def _attend(self, dense, rows, valid, q, items, hist):
        """Attention-pooled similarity for one (history, target) pairing.

        rows [B, H, D] masked P rows; valid [B, H] bool; q [B, D];
        items [B]; hist [B, H]. Returns scores [B] (without bias).
        """
        e = jnp.einsum("bhd,bd->bh", rows, q)  # <p_j, q_i>
        x = rows * q[:, None, :]
        f = jnp.einsum(
            "bha,a->bh", jax.nn.relu(jnp.einsum("bhd,da->bha", x, dense["att_w"])
                                     + dense["att_c"]),
            dense["att_h"],
        )
        f = jnp.clip(f, -_F_CLIP, _F_CLIP)
        keep = valid & (hist != items[:, None])  # pad + self-exclusion
        w = jnp.where(keep, jnp.exp(f), 0.0)
        denom = jnp.maximum(w.sum(axis=1), 1e-8) ** self.beta
        return jnp.sum(w * e, axis=1) / denom

    def forward(self, dense, gathered, batch, *, rng=None) -> jnp.ndarray:
        hist = batch["hist"]
        v = self.data_spec.num_items
        b, h = hist.shape
        rows = gathered["item_p"].reshape(b, h, -1)
        valid = hist < v
        rows = jnp.where(valid[:, :, None], rows, 0.0)
        q = gathered["item_q"]
        bias = gathered["item_bias"]
        if self.is_pairwise(batch):
            if "negs" in batch or "neg" not in batch:
                raise NotImplementedError(
                    "NAIS supports single-negative pairwise (bpr/hinge) "
                    "and pointwise batches"
                )
            s_pos = self._attend(dense, rows, valid, q[:b], batch["pos"], hist)
            s_neg = self._attend(dense, rows, valid, q[b:], batch["neg"], hist)
            return (s_pos + bias[:b, 0]) - (s_neg + bias[b:, 0])
        return self._attend(dense, rows, valid, q, batch["item"], hist) + bias[:, 0]

    def score_all(self, params, user_ids: jnp.ndarray) -> jnp.ndarray:
        if self._hist is None:
            raise ValueError(
                "NAIS.score_all needs attach_history(hist, hist_len) "
                "(the trainer does this from the train split)"
            )
        t = params["tables"]
        dense = params["dense"]
        v = self.data_spec.num_items
        hist = jnp.take(self._hist, user_ids, axis=0)  # [B, H]
        b, h = hist.shape
        rows = jnp.take(t["item_p"], hist.reshape(-1), axis=0, mode="clip")
        rows = rows.reshape(b, h, -1)
        valid = hist < v
        rows = jnp.where(valid[:, :, None], rows, 0.0)
        e_all = None  # computed per chunk
        # C-independent attention tensor: (p * q) @ W == contract(t, q)
        # with t[b,h,a,d] = p[b,h,d] * W[d,a] — hoists the only D-sized
        # work out of the item loop.
        tw = rows[:, :, None, :] * dense["att_w"].T[None, None, :, :]  # [B,H,A,D]
        chunk = min(512, v)
        n_chunks = -(-v // chunk)
        v_pad = n_chunks * chunk
        q_pad = jnp.pad(t["item_q"], ((0, v_pad - v), (0, 0)))
        bias_pad = jnp.pad(t["item_bias"][:, 0], (0, v_pad - v))
        q_chunks = q_pad.reshape(n_chunks, chunk, -1)
        b_chunks = bias_pad.reshape(n_chunks, chunk)
        base_ids = jnp.arange(chunk)

        def body(args):
            q_c, b_c, idx = args  # [C, D], [C], scalar chunk index
            item_ids = idx * chunk + base_ids  # [C]
            e = jnp.einsum("bhd,cd->bhc", rows, q_c)
            f = jnp.einsum(
                "bhca,a->bhc",
                jax.nn.relu(
                    jnp.einsum("bhad,cd->bhca", tw, q_c) + dense["att_c"]
                ),
                dense["att_h"],
            )
            f = jnp.clip(f, -_F_CLIP, _F_CLIP)
            keep = valid[:, :, None] & (hist[:, :, None] != item_ids[None, None, :])
            w = jnp.where(keep, jnp.exp(f), 0.0)
            denom = jnp.maximum(w.sum(axis=1), 1e-8) ** self.beta
            return jnp.sum(w * e, axis=1) / denom + b_c[None, :]  # [B, C]

        scores = jax.lax.map(
            body, (q_chunks, b_chunks, jnp.arange(n_chunks))
        )  # [n_chunks, B, C]
        return jnp.moveaxis(scores, 0, 1).reshape(b, v_pad)[:, :v]
