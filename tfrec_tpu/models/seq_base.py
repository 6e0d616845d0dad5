"""Shared scaffolding for the sequential-recommender family (SURVEY.md
§1a: the reference family's "sequential recommenders" group).

All members train on the same protocol (``SequenceSampler`` batches:
time-ordered ``seq`` [B, L], per-position sampled negatives
``seq_negs`` [B, L-1], loss ``sasrec`` = per-position next-item BCE)
and differ only in the causal encoder mapping item rows [B, Lx, D] to
per-position hidden states [B, Lx, D]:

- SASRec  — causal self-attention (models/sasrec.py)
- GRU4Rec — gated recurrence via ``lax.scan`` (models/gru4rec.py)
- Caser   — causal horizontal/vertical convolutions (models/caser.py)
- FPMC    — user + factorized last-item transition (models/fpmc.py)

TPU-native framing shared by the family:
- ONE item table on the sparse path serves input embeddings, positive
  targets (the gathered [B, L, D] rows shifted by one), and the sampled
  negatives — one gather, one sparse update per step.
- Static [B, L] shapes; sentinel-padded tails; pad positions are
  excluded by the loss mask, never by shapes.
- Eval: encode the user's full ordered train sequence (attached by the
  trainer via ``build_sequences`` — ``ordered_history`` selects the
  time-ordered builder) and dot the LAST valid hidden state against the
  item table.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tfrec_tpu.models.base import DataSpec, RecModel
from tfrec_tpu.ops.embedding import TableSpec


def glorot(k, fan_in, fan_out):
    lim = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(k, (fan_in, fan_out), jnp.float32, -lim, lim)


def make_dropout(rng, rate: float):
    """Seed-keyed inverted dropout; identity when rng is None (eval)."""

    def drop(t, key: int):
        if rng is None or rate <= 0.0:
            return t
        keep = jax.random.bernoulli(
            jax.random.fold_in(rng, key), 1.0 - rate, t.shape
        )
        return jnp.where(keep, t / (1.0 - rate), 0.0)

    return drop


class SequentialRecModel(RecModel):
    """Base for next-item models over time-ordered sequences.

    Subclasses set ``embed_dim``/``max_history`` (+ ``uses_user`` and
    ``user_dim`` if they carry a user table) and implement
    ``_encode(dense, rows, seq, user_rows, *, rng, gathered=None)
    -> [B, Lx, D]`` as a CAUSAL map (position t may depend only on
    positions <= t); ``gathered`` carries the full lookup dict for
    encoders with extra tables.
    """

    # Trainer: attach time-ordered sequences (build_sequences), not the
    # unordered history sets.
    ordered_history = True
    uses_user = False
    user_dim = 0

    data_spec: DataSpec
    embed_dim: int
    max_history: int

    def __init__(self, data_spec: DataSpec, embed_dim: int, max_history: int):
        assert data_spec.kind == "interaction"
        self.data_spec = data_spec
        self.embed_dim = embed_dim
        self.max_history = max_history
        self._hist = None
        self._hist_len = None

    # ---- protocol ----

    def table_specs(self) -> Tuple[TableSpec, ...]:
        specs = (TableSpec("item_emb", self.data_spec.num_items, self.embed_dim),)
        if self.uses_user:
            specs += (TableSpec("user_emb", self.data_spec.num_users, self.user_dim),)
        return specs

    def needs_history(self) -> bool:
        return True

    def attach_history(self, hist, hist_len) -> None:
        self._hist = jnp.asarray(hist)
        self._hist_len = jnp.asarray(hist_len)

    def lookup_ids(self, batch) -> Dict[str, jnp.ndarray]:
        if "seq" not in batch:
            # Pointwise (user, item) scoring — the reference predict()
            # surface (serve.Recommender): encode the attached ordered
            # history, then dot with the requested item rows.
            seq = self._pointwise_seq(batch)
            ids = jnp.concatenate([seq.reshape(-1), batch["item"]])
        else:
            ids = batch["seq"].reshape(-1)
            if "seq_negs" in batch:
                ids = jnp.concatenate([ids, batch["seq_negs"].reshape(-1)])
        out = {"item_emb": ids}
        if self.uses_user:
            out["user_emb"] = batch["user"]
        return out

    def _pointwise_seq(self, batch) -> jnp.ndarray:
        # Prefer history rows carried IN the batch (serve passes them as
        # jit ARGUMENTS via pointwise_batch_extras — a [U, L] closure
        # constant would be baked into the compiled executable and go
        # stale if history is re-attached); fall back to the attached
        # matrix for direct/internal callers.
        if "hist_seq" in batch:
            return batch["hist_seq"]
        if self._hist is None:
            raise ValueError(
                f"{type(self).__name__} pointwise scoring needs "
                "attach_history(seq, seq_len) (the trainer does this from "
                "the time-ordered train split)"
            )
        return jnp.take(self._hist, batch["user"], axis=0)

    def _pointwise_lens(self, batch) -> jnp.ndarray:
        if "hist_len" in batch:
            return batch["hist_len"]
        return jnp.take(self._hist_len, batch["user"])

    def pointwise_batch_extras(self, user_ids) -> Dict[str, jnp.ndarray]:
        """Host-side batch extras for pointwise scoring: the per-user
        history rows, so jitted callers (serve.predict) pass them as
        arguments instead of baking the full [U, L] matrix in as a
        compile-time constant."""
        if self._hist is None:
            raise ValueError(
                f"{type(self).__name__} pointwise scoring needs "
                "attach_history(seq, seq_len)"
            )
        return {
            "hist_seq": jnp.take(self._hist, user_ids, axis=0),
            "hist_len": jnp.take(self._hist_len, user_ids),
        }

    # ---- encoder (subclass) ----

    def _encode(self, dense, rows, seq, user_rows, *, rng, gathered=None):
        """rows [B, Lx, D] item rows for ``seq`` [B, Lx] (sentinel rows
        already zeroed); user_rows [B, user_dim] or None; ``gathered`` is
        the full lookup dict for encoders with extra tables (None on
        paths that gather their own rows). Returns hidden [B, Lx, D].
        MUST be causal in the time axis."""
        raise NotImplementedError

    def forward(self, dense, gathered, batch, *, rng=None):
        if "seq" not in batch:
            v = self.data_spec.num_items
            seq = self._pointwise_seq(batch)
            lens = self._pointwise_lens(batch)
            b, l = seq.shape
            rows_all = gathered["item_emb"]
            seq_rows = rows_all[: b * l].reshape(b, l, -1)
            item_rows = rows_all[b * l :]
            seq_rows = jnp.where((seq < v)[:, :, None], seq_rows, 0.0)
            user_rows = gathered.get("user_emb") if self.uses_user else None
            hidden = self._encode(
                dense, seq_rows, seq, user_rows, rng=None, gathered=gathered
            )
            last = jnp.take_along_axis(
                hidden, jnp.maximum(lens - 1, 0)[:, None, None], axis=1
            )[:, 0]
            return jnp.sum(last * item_rows, axis=-1)
        seq = batch["seq"]  # [B, L]
        negs = batch["seq_negs"]  # [B, L-1]
        v = self.data_spec.num_items
        b, l = seq.shape
        rows_all = gathered["item_emb"]
        seq_rows = rows_all[: b * l].reshape(b, l, -1)
        neg_rows = rows_all[b * l :].reshape(b, l - 1, -1)
        valid = seq < v
        seq_rows = jnp.where(valid[:, :, None], seq_rows, 0.0)
        user_rows = gathered.get("user_emb") if self.uses_user else None
        hidden = self._encode(
            dense, seq_rows[:, :-1], seq[:, :-1], user_rows, rng=rng,
            gathered=gathered,
        )  # [B, L-1, D]
        tgt_rows = seq_rows[:, 1:]
        pos_logits = jnp.sum(hidden * tgt_rows, axis=-1)
        neg_logits = jnp.sum(hidden * neg_rows, axis=-1)
        mask = valid[:, :-1] & valid[:, 1:]
        return {"pos": pos_logits, "neg": neg_logits, "mask": mask}

    def _last_hidden(self, params, user_ids: jnp.ndarray) -> jnp.ndarray:
        """[B, D] last-valid-position hidden state of each user's
        attached ordered history — the query vector of every eval path."""
        if self._hist is None:
            raise ValueError(
                f"{type(self).__name__} eval needs attach_history(seq, "
                "seq_len) (the trainer does this from the time-ordered "
                "train split)"
            )
        t = params["tables"]["item_emb"]
        v = self.data_spec.num_items
        seq = jnp.take(self._hist, user_ids, axis=0)  # [B, L]
        lens = jnp.take(self._hist_len, user_ids)
        rows = jnp.take(t, seq.reshape(-1), axis=0, mode="clip").reshape(
            seq.shape + (-1,)
        )
        rows = jnp.where((seq < v)[:, :, None], rows, 0.0)
        user_rows = (
            jnp.take(params["tables"]["user_emb"], user_ids, axis=0)
            if self.uses_user
            else None
        )
        hidden = self._encode(params["dense"], rows, seq, user_rows, rng=None)
        return jnp.take_along_axis(
            hidden, jnp.maximum(lens - 1, 0)[:, None, None], axis=1
        )[:, 0]  # [B, D]

    def score_all(self, params, user_ids: jnp.ndarray) -> jnp.ndarray:
        last = self._last_hidden(params, user_ids)
        t = params["tables"]["item_emb"]
        return jnp.dot(last, t.T, preferred_element_type=jnp.float32)

    def score_user_items(self, params, user_ids: jnp.ndarray,
                         item_ids: jnp.ndarray) -> jnp.ndarray:
        """[B, W] scores of per-user candidate lists: encode each user's
        history ONCE and dot with the W candidate rows — the sampled-eval
        fast path (flattening through pointwise forward would re-run the
        encoder W times per user)."""
        last = self._last_hidden(params, user_ids)
        t = params["tables"]["item_emb"]
        rows = jnp.take(t, item_ids.reshape(-1), axis=0, mode="clip").reshape(
            item_ids.shape + (-1,)
        )
        return jnp.einsum("bd,bwd->bw", last, rows)
