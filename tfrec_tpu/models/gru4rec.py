"""GRU4Rec — recurrent next-item recommendation (Hidasi et al. 2016),
re-framed onto this framework's sequential protocol (models/seq_base.py):
instead of the original's session-parallel mini-batches (a GPU
stream-scheduling trick around ragged sessions), each batch row is one
user's time-ordered sequence at a static length, every position predicts
its successor, and the recurrence is causal by construction — the exact
same objective, without dynamic shapes.

TPU-native framing:
- The input half of all three gates is hoisted OUT of the recurrence:
  one big [B*L, D] @ [D, 3H] matmul runs on the MXU before the scan;
  the ``lax.scan`` over time then carries only the [B, H] hidden state
  and does one [B, H] @ [H, 3H] matmul per step — the minimum serial
  work a gated recurrence admits.
- Hidden width H may differ from the item-embedding width D
  (``gru_hidden``; 0 = D); a final projection returns to D so hidden
  states dot against the shared item table.
- Sentinel (pad) positions freeze the hidden state (carry-through), so
  the recurrence never ingests pad rows; pad targets are already
  excluded by the loss mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfrec_tpu.models.base import DataSpec
from tfrec_tpu.models.seq_base import SequentialRecModel, glorot, make_dropout


class GRU4Rec(SequentialRecModel):
    def __init__(self, data_spec: DataSpec, embed_dim: int,
                 hidden_dim: int = 0, num_layers: int = 1,
                 dropout: float = 0.0, max_history: int = 50):
        super().__init__(data_spec, embed_dim, max_history)
        self.hidden_dim = hidden_dim or embed_dim
        self.num_layers = num_layers
        self.dropout = dropout

    def init_dense(self, rng: jax.Array):
        d, h = self.embed_dim, self.hidden_dim
        keys = jax.random.split(rng, 2 * self.num_layers + 1)
        params = {"proj": glorot(keys[-1], h, d)}
        for i in range(self.num_layers):
            fan_in = d if i == 0 else h
            params[f"l{i}"] = {
                # gate order: [reset | update | candidate]
                "wx": glorot(keys[2 * i], fan_in, 3 * h),
                "wh": glorot(keys[2 * i + 1], h, 3 * h),
                "bx": jnp.zeros((3 * h,)),
                "bh": jnp.zeros((3 * h,)),
            }
        return params

    def _encode(self, dense, rows, seq, user_rows, *, rng, gathered=None):
        v = self.data_spec.num_items
        b, lx, _ = rows.shape
        h = self.hidden_dim
        valid = (seq < v).astype(rows.dtype)  # [B, Lx]
        drop = make_dropout(rng, self.dropout)
        x = drop(rows, 0)
        for i in range(self.num_layers):
            p = dense[f"l{i}"]
            # All input-side gate pre-activations in one MXU matmul.
            gx = (x.reshape(b * lx, -1) @ p["wx"] + p["bx"]).reshape(b, lx, 3 * h)

            def step(hid, t, p=p):
                gx_t, ok = t  # [B, 3H], [B]
                gh = hid @ p["wh"] + p["bh"]
                rx, zx, nx = jnp.split(gx_t, 3, axis=-1)
                rh, zh, nh = jnp.split(gh, 3, axis=-1)
                r = jax.nn.sigmoid(rx + rh)
                z = jax.nn.sigmoid(zx + zh)
                n = jnp.tanh(nx + r * nh)
                new = (1.0 - z) * n + z * hid
                # Pad positions carry the state through unchanged.
                new = ok[:, None] * new + (1.0 - ok[:, None]) * hid
                return new, new

            h0 = jnp.zeros((b, h), rows.dtype)
            _, hs = jax.lax.scan(
                step, h0, (gx.swapaxes(0, 1), valid.swapaxes(0, 1))
            )
            x = drop(hs.swapaxes(0, 1), 1 + i)  # [B, Lx, H]
        return x @ dense["proj"]
