"""SASRec — self-attentive sequential recommendation (Kang & McAuley
2018), the sequential-recommender family of the reference layer map
(SURVEY.md §1a: "general / sequential / social recommenders").

Next-item objective over time-ordered user sequences: positions 0..L-2
attend causally over the prefix and each predicts position t+1, trained
with per-position BCE against one sampled negative (the paper's
protocol; negatives arrive in the batch from ``SequenceSampler``).

TPU-native framing:
- ONE item table on the sparse path serves input embeddings, positive
  targets (the same gathered [B, L, D] rows shifted by one), and the
  sampled negatives (concatenated into the same lookup) — one gather,
  one sparse update per step.
- Attention is plain einsum attention at static [B, L<=a few hundred, D]
  shapes — at recsys sequence lengths the whole score matrix is a few MB
  and XLA fuses the softmax chain; flash-style tiling would only add
  launch overhead (SURVEY.md §5 records the no-ring-attention decision).
- Causal + key-validity masking is additive -inf on logits; pad
  positions are excluded from the loss mask, never from shapes.

Eval: ``score_all`` encodes the user's full ordered sequence (attached
by the trainer via ``build_sequences`` — ``ordered_history`` selects the
time-ordered builder) and dots the LAST valid hidden state against the
item table.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tfrec_tpu.models.base import DataSpec, RecModel
from tfrec_tpu.ops.embedding import TableSpec


def _glorot(k, fan_in, fan_out):
    lim = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(k, (fan_in, fan_out), jnp.float32, -lim, lim)


def _layer_norm(x, scale, bias, eps=1e-6):
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


class SASRec(RecModel):
    # Trainer: attach time-ordered sequences (build_sequences), not the
    # unordered history sets.
    ordered_history = True

    def __init__(self, data_spec: DataSpec, embed_dim: int,
                 num_blocks: int = 2, num_heads: int = 1,
                 dropout: float = 0.2, max_history: int = 50):
        assert data_spec.kind == "interaction"
        assert embed_dim % num_heads == 0, (embed_dim, num_heads)
        self.data_spec = data_spec
        self.embed_dim = embed_dim
        self.num_blocks = num_blocks
        self.num_heads = num_heads
        self.dropout = dropout
        self.max_history = max_history
        self._hist = None
        self._hist_len = None

    # ---- protocol ----

    def table_specs(self) -> Tuple[TableSpec, ...]:
        return (TableSpec("item_emb", self.data_spec.num_items, self.embed_dim),)

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
                "wq": _glorot(k[0], d, d),
                "wk": _glorot(k[1], d, d),
                "wv": _glorot(k[2], d, d),
                "wo": _glorot(k[3], d, d),
                "ln1_scale": jnp.ones((d,)), "ln1_bias": jnp.zeros((d,)),
                "ln2_scale": jnp.ones((d,)), "ln2_bias": jnp.zeros((d,)),
                "ffn1": _glorot(k[4], d, d), "ffn1_b": jnp.zeros((d,)),
                "ffn2": jnp.zeros((d, d)), "ffn2_b": jnp.zeros((d,)),
            }
        return params

    def needs_history(self) -> bool:
        return True

    def attach_history(self, hist, hist_len) -> None:
        self._hist = jnp.asarray(hist)
        self._hist_len = jnp.asarray(hist_len)

    def lookup_ids(self, batch) -> Dict[str, jnp.ndarray]:
        ids = batch["seq"].reshape(-1)
        if "seq_negs" in batch:
            ids = jnp.concatenate([ids, batch["seq_negs"].reshape(-1)])
        return {"item_emb": ids}

    # ---- encoder ----

    def _encode(self, dense, rows, seq, *, rng):
        """rows [B, Lx, D] item rows for ``seq`` [B, Lx]; returns hidden
        [B, Lx, D]. Causal attention; sentinel positions are masked as
        keys (and zeroed as values via the key mask)."""
        v = self.data_spec.num_items
        b, lx, d = rows.shape
        h = self.num_heads
        x = rows * jnp.sqrt(jnp.asarray(d, rows.dtype))
        x = x + dense["pos_emb"][:lx][None, :, :]
        key_ok = seq < v  # [B, Lx]
        causal = jnp.tril(jnp.ones((lx, lx), bool))
        mask = causal[None, :, :] & key_ok[:, None, :]  # [B, Lq, Lk]
        neg = jnp.asarray(-1e9, x.dtype)

        def drop(t, key):
            if rng is None or self.dropout <= 0.0:
                return t
            keep = jax.random.bernoulli(
                jax.random.fold_in(rng, key), 1.0 - self.dropout, t.shape
            )
            return jnp.where(keep, t / (1.0 - self.dropout), 0.0)

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
            att = drop(att, 10 + blk)
            ctx = jnp.einsum("bhqk,bkhe->bqhe", att, vh).reshape(b, lx, d)
            x = x + ctx @ p["wo"]
            y = _layer_norm(x, p["ln2_scale"], p["ln2_bias"])
            y = jax.nn.relu(y @ p["ffn1"] + p["ffn1_b"])
            y = drop(y, 20 + blk)
            x = x + y @ p["ffn2"] + p["ffn2_b"]
            # Zero padded query positions so they contribute nothing
            # downstream (their keys are already masked).
            x = jnp.where(key_ok[:, :, None], x, 0.0)
        return _layer_norm(x, dense["ln_f_scale"], dense["ln_f_bias"])

    def forward(self, dense, gathered, batch, *, rng=None):
        seq = batch["seq"]  # [B, L]
        negs = batch["seq_negs"]  # [B, L-1]
        v = self.data_spec.num_items
        b, l = seq.shape
        rows_all = gathered["item_emb"]
        seq_rows = rows_all[: b * l].reshape(b, l, -1)
        neg_rows = rows_all[b * l :].reshape(b, l - 1, -1)
        valid = seq < v
        seq_rows = jnp.where(valid[:, :, None], seq_rows, 0.0)
        hidden = self._encode(
            dense, seq_rows[:, :-1], seq[:, :-1], rng=rng
        )  # [B, L-1, D]
        tgt_rows = seq_rows[:, 1:]
        pos_logits = jnp.sum(hidden * tgt_rows, axis=-1)
        neg_logits = jnp.sum(hidden * neg_rows, axis=-1)
        mask = valid[:, :-1] & valid[:, 1:]
        return {"pos": pos_logits, "neg": neg_logits, "mask": mask}

    def score_all(self, params, user_ids: jnp.ndarray) -> jnp.ndarray:
        if self._hist is None:
            raise ValueError(
                "SASRec.score_all needs attach_history(seq, seq_len) "
                "(the trainer does this from the time-ordered train split)"
            )
        t = params["tables"]["item_emb"]
        v = self.data_spec.num_items
        seq = jnp.take(self._hist, user_ids, axis=0)  # [B, L]
        lens = jnp.take(self._hist_len, user_ids)
        rows = jnp.take(t, seq.reshape(-1), axis=0, mode="clip").reshape(
            seq.shape + (-1,)
        )
        rows = jnp.where((seq < v)[:, :, None], rows, 0.0)
        hidden = self._encode(params["dense"], rows, seq, rng=None)
        last = jnp.take_along_axis(
            hidden, jnp.maximum(lens - 1, 0)[:, None, None], axis=1
        )[:, 0]  # [B, D]
        return jnp.dot(last, t.T, preferred_element_type=jnp.float32)
