"""FPMC — factorized personalized Markov chains (Rendle et al. 2010),
the Markov-chain ancestor of the sequential family (SURVEY.md §1a
"sequential recommenders").

score(u, i | last item l) = <v_u, v_i> + <t_l, v_i>: a user-taste term
plus a factorized first-order transition from the previously consumed
item. On this framework's per-position protocol (models/seq_base.py)
that is the simplest causal encoder there is — hidden at position t is
``user_vec + transition(seq_t)`` — so FPMC trains on every position of
the sequence in one program, sharing the family's sampler, loss, and
last-hidden-state eval.

Tables: the shared item table serves targets/negatives (the <., v_i>
side); a second item-indexed table holds the transition factors t_l;
the user table holds v_u. All three ride the sparse-optimizer path.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tfrec_tpu.models.base import DataSpec
from tfrec_tpu.models.seq_base import SequentialRecModel
from tfrec_tpu.ops.embedding import TableSpec


class FPMC(SequentialRecModel):
    uses_user = True

    def __init__(self, data_spec: DataSpec, embed_dim: int,
                 max_history: int = 50):
        super().__init__(data_spec, embed_dim, max_history)
        self.user_dim = embed_dim

    def table_specs(self) -> Tuple[TableSpec, ...]:
        base = super().table_specs()  # item_emb + user_emb
        return base + (
            TableSpec("trans_emb", self.data_spec.num_items, self.embed_dim),
        )

    def lookup_ids(self, batch) -> Dict[str, jnp.ndarray]:
        ids = super().lookup_ids(batch)
        # Transition factors of the INPUT positions only ([B*L] prefix of
        # the item lookup; negatives/pointwise items never act as a
        # previous item).
        seq = batch["seq"] if "seq" in batch else self._pointwise_seq(batch)
        ids["trans_emb"] = seq.reshape(-1)
        return ids

    def init_dense(self, rng: jax.Array):
        return {}

    def _encode(self, dense, rows, seq, user_rows, *, rng, gathered=None):
        v = self.data_spec.num_items
        b, lx = seq.shape
        # Transition rows of the input positions, trimmed to this
        # encode's window (training looked up L = lx+1 positions,
        # pointwise exactly lx).
        flat = gathered["trans_emb"]
        trans = flat.reshape(b, flat.shape[0] // b, -1)[:, :lx]
        trans = jnp.where((seq < v)[:, :, None], trans, 0.0)
        return user_rows[:, None, :] + trans

    def _last_hidden(self, params, user_ids: jnp.ndarray) -> jnp.ndarray:
        # No full-sequence encode needed: the query is the user vector
        # plus the LAST valid item's transition vector.
        if self._hist is None:
            raise ValueError("FPMC eval needs attach_history(seq, seq_len)")
        t = params["tables"]
        v = self.data_spec.num_items
        seq = jnp.take(self._hist, user_ids, axis=0)
        lens = jnp.take(self._hist_len, user_ids)
        last_idx = jnp.maximum(lens - 1, 0)
        last_item = jnp.take_along_axis(seq, last_idx[:, None], axis=1)[:, 0]
        trans = jnp.take(t["trans_emb"], jnp.minimum(last_item, v - 1), axis=0)
        trans = jnp.where((last_item < v)[:, None], trans, 0.0)
        return jnp.take(t["user_emb"], user_ids, axis=0) + trans
