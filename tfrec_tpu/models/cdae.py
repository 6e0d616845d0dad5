"""CDAE — collaborative denoising autoencoder (Wu et al. 2016), the
one-hidden-layer denoising sibling of MultVAE in the reference family's
long-tail zoo (SURVEY.md §2a "other zoo": CDAE/VAE-CF lineage).

    z      = sigmoid(W^T y~_u + v_u + b)     y~_u = dropout-corrupted
    x_hat  = z W' + b'                       multi-hot history of u
    loss   = binary cross-entropy(x_hat, y_u) over ALL items

TPU-native framing mirrors MultVAE: the encoder W^T y over a multi-hot
user vector IS an embedding-bag — table "enc1" [V, H1] on the sparse
path, summed over the sentinel-padded [B, H] history ids; the
user-specific node v_u is its own [U, H1] table ("user_node", also
sparse). The decoder [H1, V] matmul stays a dense param (every output
column's gradient is dense under the full-items loss). Corruption =
Bernoulli keep-mask on history members with 1/(1-p) rescale, identical
mechanics to MultVAE's denoising input dropout.

Train with ``loss="cdae"`` (train/losses.py: full-catalog BCE against
the multi-hot history — the trainer coerces this automatically) on
``UserHistorySampler`` batches. Eval: ``score_all`` reconstructs from
the attached history (no corruption); same O(U*H) note as FISM/MultVAE.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tfrec_tpu.models.base import DataSpec, RecModel
from tfrec_tpu.ops.embedding import TableSpec


class CDAE(RecModel):
    def __init__(self, data_spec: DataSpec, hidden_dim: int = 256,
                 dropout: float = 0.2, max_history: int = 50):
        assert data_spec.kind == "interaction"
        self.data_spec = data_spec
        self.hidden_dim = hidden_dim
        self.dropout = dropout
        self.max_history = max_history
        self._hist = None
        self._hist_len = None

    # ---- protocol ----

    def table_specs(self) -> Tuple[TableSpec, ...]:
        v, u, h = self.data_spec.num_items, self.data_spec.num_users, self.hidden_dim
        return (
            TableSpec("enc1", v, h),
            TableSpec("user_node", u, h, init_scale=0.01),
        )

    def init_dense(self, rng: jax.Array):
        v, h = self.data_spec.num_items, self.hidden_dim
        lim = jnp.sqrt(6.0 / (h + v))
        return {
            "b1": jnp.zeros((h,)),
            "w_out": jax.random.uniform(rng, (h, v), jnp.float32, -lim, lim),
            "b_out": jnp.zeros((v,)),
        }

    def needs_history(self) -> bool:
        return True

    def attach_history(self, hist, hist_len) -> None:
        self._hist = jnp.asarray(hist)
        self._hist_len = jnp.asarray(hist_len)

    def lookup_ids(self, batch) -> Dict[str, jnp.ndarray]:
        return {
            "enc1": batch["hist"].reshape(-1),
            "user_node": batch["user"],
        }

    # ---- network ----

    def _reconstruct(self, dense, bag_rows, user_rows, hist, *, rng):
        v = self.data_spec.num_items
        b, h = hist.shape
        rows = bag_rows.reshape(b, h, -1)
        valid = (hist < v).astype(rows.dtype)
        if rng is not None and self.dropout > 0.0:
            keep = jax.random.bernoulli(
                rng, 1.0 - self.dropout, valid.shape
            ).astype(rows.dtype)
            valid = valid * keep / (1.0 - self.dropout)
        bag = jnp.einsum("bh,bhd->bd", valid, rows)
        z = jax.nn.sigmoid(bag + user_rows + dense["b1"])
        return (
            jnp.dot(z, dense["w_out"], preferred_element_type=jnp.float32)
            + dense["b_out"]
        )

    def forward(self, dense, gathered, batch, *, rng=None) -> jnp.ndarray:
        return self._reconstruct(
            dense, gathered["enc1"], gathered["user_node"], batch["hist"], rng=rng
        )

    def score_all(self, params, user_ids: jnp.ndarray) -> jnp.ndarray:
        if self._hist is None:
            raise ValueError(
                "CDAE.score_all needs attach_history(hist, hist_len) "
                "(the trainer does this from the train split)"
            )
        t = params["tables"]
        hist = jnp.take(self._hist, user_ids, axis=0)
        rows = jnp.take(t["enc1"], hist.reshape(-1), axis=0, mode="clip")
        user_rows = jnp.take(t["user_node"], user_ids, axis=0)
        return self._reconstruct(
            params["dense"], rows, user_rows, hist, rng=None
        )
