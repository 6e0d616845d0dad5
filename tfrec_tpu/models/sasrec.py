"""SASRec — self-attentive sequential recommendation (Kang & McAuley
2018), the sequential-recommender family of the reference layer map
(SURVEY.md §1a: "general / sequential / social recommenders").

Next-item objective over time-ordered user sequences: positions 0..L-2
attend causally over the prefix and each predicts position t+1, trained
with per-position BCE against one sampled negative (the paper's
protocol; negatives arrive in the batch from ``SequenceSampler``).
Shared-family scaffolding (one-gather lookup, per-position loss shapes,
last-hidden-state eval) lives in models/seq_base.py.

TPU-native framing:
- Attention is plain einsum attention at static [B, L<=a few hundred, D]
  shapes — at recsys sequence lengths the whole score matrix is a few MB
  and XLA fuses the softmax chain; flash-style tiling would only add
  launch overhead (SURVEY.md §5 records the no-ring-attention decision).
- Causal + key-validity masking is additive -inf on logits; pad
  positions are excluded from the loss mask, never from shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfrec_tpu.models.base import DataSpec
from tfrec_tpu.models.seq_base import SequentialRecModel, glorot, make_dropout


def _layer_norm(x, scale, bias, eps=1e-6):
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


class SASRec(SequentialRecModel):
    def __init__(self, data_spec: DataSpec, embed_dim: int,
                 num_blocks: int = 2, num_heads: int = 1,
                 dropout: float = 0.2, max_history: int = 50):
        assert embed_dim % num_heads == 0, (embed_dim, num_heads)
        super().__init__(data_spec, embed_dim, max_history)
        self.num_blocks = num_blocks
        self.num_heads = num_heads
        self.dropout = dropout

    def init_dense(self, rng: jax.Array):
        d, l = self.embed_dim, self.max_history
        keys = jax.random.split(rng, 1 + 5 * self.num_blocks)
        params = {
            "pos_emb": jax.random.normal(keys[0], (l, d)) * 0.02,
            "ln_f_scale": jnp.ones((d,)),
            "ln_f_bias": jnp.zeros((d,)),
        }
        for b in range(self.num_blocks):
            k = keys[1 + 5 * b : 6 + 5 * b]
            params[f"b{b}"] = {
                "wq": glorot(k[0], d, d),
                "wk": glorot(k[1], d, d),
                "wv": glorot(k[2], d, d),
                "wo": glorot(k[3], d, d),
                "ln1_scale": jnp.ones((d,)), "ln1_bias": jnp.zeros((d,)),
                "ln2_scale": jnp.ones((d,)), "ln2_bias": jnp.zeros((d,)),
                "ffn1": glorot(k[4], d, d), "ffn1_b": jnp.zeros((d,)),
                "ffn2": jnp.zeros((d, d)), "ffn2_b": jnp.zeros((d,)),
            }
        return params

    def _encode(self, dense, rows, seq, user_rows, *, rng, gathered=None):
        """Causal attention; sentinel positions are masked as keys (and
        zeroed as values via the key mask)."""
        v = self.data_spec.num_items
        b, lx, d = rows.shape
        h = self.num_heads
        x = rows * jnp.sqrt(jnp.asarray(d, rows.dtype))
        x = x + dense["pos_emb"][:lx][None, :, :]
        key_ok = seq < v  # [B, Lx]
        causal = jnp.tril(jnp.ones((lx, lx), bool))
        mask = causal[None, :, :] & key_ok[:, None, :]  # [B, Lq, Lk]
        neg = jnp.asarray(-1e9, x.dtype)
        drop = make_dropout(rng, self.dropout)

        x = drop(x, 0)
        for blk in range(self.num_blocks):
            p = dense[f"b{blk}"]
            q = _layer_norm(x, p["ln1_scale"], p["ln1_bias"])
            qh = (q @ p["wq"]).reshape(b, lx, h, d // h)
            kh = (x @ p["wk"]).reshape(b, lx, h, d // h)
            vh = (x @ p["wv"]).reshape(b, lx, h, d // h)
            logits = jnp.einsum("bqhe,bkhe->bhqk", qh, kh) / jnp.sqrt(
                jnp.asarray(d // h, x.dtype)
            )
            logits = jnp.where(mask[:, None, :, :], logits, neg)
            att = jax.nn.softmax(logits, axis=-1)
            att = drop(att, 1 + 2 * blk)
            ctx = jnp.einsum("bhqk,bkhe->bqhe", att, vh).reshape(b, lx, d)
            x = x + ctx @ p["wo"]
            y = _layer_norm(x, p["ln2_scale"], p["ln2_bias"])
            y = jax.nn.relu(y @ p["ffn1"] + p["ffn1_b"])
            y = drop(y, 2 + 2 * blk)
            x = x + y @ p["ffn2"] + p["ffn2_b"]
            # Zero padded query positions so they contribute nothing
            # downstream (their keys are already masked).
            x = jnp.where(key_ok[:, :, None], x, 0.0)
        return _layer_norm(x, dense["ln_f_scale"], dense["ln_f_bias"])
