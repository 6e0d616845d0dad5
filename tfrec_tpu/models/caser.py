"""Caser — convolutional sequence embedding (Tang & Wang 2018), re-framed
onto this framework's sequential protocol (models/seq_base.py).

The original slides an L-item window over each user's sequence and emits
one training example per window (horizontal convs over the window, a
vertical conv across its time axis, user embedding concatenated into the
prediction layer). Here the SAME computation is expressed causally at
every position of a static [B, L] sequence — each position's features
see exactly its trailing window — so one batch row carries L-1 training
examples and the whole model is one fused XLA program (no per-window
host loop, no dynamic shapes).

TPU-native framing:
- Horizontal filters (heights ``caser_heights``, ``caser_h_filters``
  each) are causal 1-D convolutions over time with the embedding axis as
  input channels (left-padded h-1, so position t sees [t-h+1, t]).
- The vertical filters (the original's [L, 1] per-dim weighted sum over
  the window) become a lower-triangular banded matrix applied over time:
  out[t] = sum_k w[k] * x[t-k] — built once per shape and contracted on
  the MXU as an [L, L] x [L, D] matmul per filter.
- The user embedding (a second table on the sparse path) joins at the
  prediction layer, as in the paper; the final projection returns to the
  item-embedding width so hidden states dot against the shared item
  table (tied item outputs — the retrieval-eval convention of the whole
  family).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tfrec_tpu.models.base import DataSpec
from tfrec_tpu.models.seq_base import SequentialRecModel, glorot, make_dropout


class Caser(SequentialRecModel):
    uses_user = True

    def __init__(self, data_spec: DataSpec, embed_dim: int,
                 h_filters: int = 16, heights: Tuple[int, ...] = (2, 3, 4),
                 v_filters: int = 4, dropout: float = 0.2,
                 max_history: int = 50):
        super().__init__(data_spec, embed_dim, max_history)
        self.user_dim = embed_dim
        self.h_filters = h_filters
        self.heights = tuple(heights)
        self.v_filters = v_filters
        self.dropout = dropout

    def init_dense(self, rng: jax.Array):
        d = self.embed_dim
        nh = len(self.heights)
        keys = jax.random.split(rng, nh + 3)
        params = {
            "v_w": jax.random.normal(keys[0], (self.v_filters, self.max_history))
            * 0.02,
            "fc1": glorot(
                keys[1], nh * self.h_filters + self.v_filters * d, d
            ),
            "fc1_b": jnp.zeros((d,)),
            "fc2": glorot(keys[2], 2 * d, d),
            "fc2_b": jnp.zeros((d,)),
        }
        for i, h in enumerate(self.heights):
            params[f"h{h}"] = {
                "w": glorot(keys[3 + i], h * d, self.h_filters).reshape(
                    h, d, self.h_filters
                ),
                "b": jnp.zeros((self.h_filters,)),
            }
        return params

    def _encode(self, dense, rows, seq, user_rows, *, rng, gathered=None):
        b, lx, d = rows.shape
        drop = make_dropout(rng, self.dropout)

        # Horizontal: causal conv over time, D input channels.
        h_feats = []
        for h in self.heights:
            p = dense[f"h{h}"]
            y = jax.lax.conv_general_dilated(
                rows, p["w"], window_strides=(1,), padding=[(h - 1, 0)],
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
            h_feats.append(jax.nn.relu(y + p["b"]))  # [B, Lx, F]

        # Vertical: causal banded weighted sum over the trailing window,
        # contracted as [Lx, Lx] @ [B, Lx, D] per filter.
        w = dense["v_w"]  # [n_v, Lmax]
        delta = jnp.arange(lx)[:, None] - jnp.arange(lx)[None, :]
        in_band = (delta >= 0) & (delta < w.shape[1])
        band = jnp.take(w, jnp.clip(delta, 0, w.shape[1] - 1), axis=1)
        band = jnp.where(in_band[None, :, :], band, 0.0)  # [n_v, Lx, Lx]
        v_feat = jnp.einsum("vts,bsd->btvd", band, rows).reshape(b, lx, -1)

        z = jnp.concatenate(h_feats + [v_feat], axis=-1)
        z = jax.nn.relu(z.reshape(b * lx, -1) @ dense["fc1"] + dense["fc1_b"])
        z = drop(z.reshape(b, lx, d), 0)
        # Prediction layer: user embedding joins every position.
        u = jnp.broadcast_to(user_rows[:, None, :], (b, lx, d))
        zu = jnp.concatenate([z, u], axis=-1)
        return zu @ dense["fc2"] + dense["fc2_b"]
