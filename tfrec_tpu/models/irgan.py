"""IRGAN — generative adversarial retrieval (Wang et al. 2017), the
GAN member of the reference family's zoo (SURVEY.md §2a "other zoo
models": the IRGAN/APR adversarial group; APR lives in models/apr.py).

Two MF scorers play a minimax game over implicit feedback:

- the **generator** G(u, i) models which items a user would pick and is
  trained by policy gradient (REINFORCE) to fool the discriminator;
- the **discriminator** D(u, i) is trained to separate true positives
  from G's sampled items.

TPU-native framing (differs from the reference family's alternating
TF-session phases):

- ONE jitted step trains both players simultaneously. The two gradient
  flows are structurally disjoint: G reaches the loss only through
  ``log p_G`` of a *discrete* sample (no gradient through the sample
  itself), D only through its scores, and the REINFORCE reward is
  ``stop_gradient``-ed — so simultaneous descent computes exactly the
  same per-player gradients as one D-phase plus one G-phase on the same
  batch, without a second XLA program or a phase scheduler.
- G samples from a **uniform candidate pool** (the batch's ``negs``
  [B, K] columns) instead of the full catalog: static shapes, gathered
  rows only (the sparse-update path stays O(batch), not O(vocab)) —
  the standard large-scale IRGAN approximation; pool size is the
  sampler's ``train.num_negatives``.
- the categorical draw is a Gumbel-max over the pool inside the step
  (per-step SPMD rng), not a host-side np.random.choice.

Eval/serving score with the GENERATOR (the paper's recommender for the
item-recommendation task); ``dot_decomposition`` exposes it to the
sharded top-k path.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tfrec_tpu.models.base import DataSpec, DotRetrieval, RecModel
from tfrec_tpu.ops.embedding import TableSpec


class IRGAN(RecModel):
    def __init__(self, data_spec: DataSpec, embed_dim: int,
                 temperature: float = 1.0, use_bias: bool = True):
        assert data_spec.kind == "interaction"
        self.data_spec = data_spec
        self.embed_dim = embed_dim
        self.temperature = temperature
        self.use_bias = use_bias

    def table_specs(self) -> Tuple[TableSpec, ...]:
        u, v, d = self.data_spec.num_users, self.data_spec.num_items, self.embed_dim
        specs = [
            TableSpec("user_g", u, d),
            TableSpec("item_g", v, d),
            TableSpec("user_d", u, d),
            TableSpec("item_d", v, d),
        ]
        if self.use_bias:
            specs.append(TableSpec("bias_g", v, 1, initializer="zeros"))
            specs.append(TableSpec("bias_d", v, 1, initializer="zeros"))
        return tuple(specs)

    def init_dense(self, rng: jax.Array):
        return {}

    def lookup_ids(self, batch) -> Dict[str, jnp.ndarray]:
        if not self.is_pairwise(batch):
            # Eval/serving score with the generator only — gathering the
            # discriminator tables here would double eval lookup traffic
            # (and a2a volume on the sharded path) for rows forward never
            # reads.
            ids = {"user_g": batch["user"], "item_g": batch["item"]}
            if self.use_bias:
                ids["bias_g"] = batch["item"]
            return ids
        items = self.pair_item_ids(batch)
        ids = {
            "user_g": batch["user"], "item_g": items,
            "user_d": batch["user"], "item_d": items,
        }
        if self.use_bias:
            ids["bias_g"] = items
            ids["bias_d"] = items
        return ids

    @staticmethod
    def _pair_scores(u, i, b, bsz: int, k: int) -> jnp.ndarray:
        """[B, 1+K] score matrix from user rows and [pos; negs] item rows."""
        u_rep = jnp.concatenate([u, jnp.repeat(u, k, axis=0)])
        s = jnp.sum(u_rep * i, axis=-1)
        if b is not None:
            s = s + b[:, 0]
        return jnp.concatenate([s[:bsz, None], s[bsz:].reshape(bsz, k)], axis=1)

    def forward(self, dense, gathered, batch, *, rng=None):
        if not self.is_pairwise(batch):
            # Pointwise predict: generator score (the recommender).
            s = jnp.sum(gathered["user_g"] * gathered["item_g"], axis=-1)
            if self.use_bias:
                s = s + gathered["bias_g"][:, 0]
            return s

        # Training: a multi-negative pairwise batch; "neg" [B] degenerates
        # to a 1-item pool (G's log-prob is then constant 0 and only D
        # trains — presets set train.num_negatives >= 8).
        if "negs" in batch:
            k = batch["negs"].shape[1]
        elif "neg" in batch:
            k = 1
        else:
            raise ValueError(
                "IRGAN trains on explicit negative pools; in-batch-negative "
                "batches are not supported (set train.loss='irgan' and "
                "train.num_negatives >= 8)"
            )
        bsz = batch["user"].shape[0]
        bg = gathered.get("bias_g")
        bd = gathered.get("bias_d")
        s_g = self._pair_scores(gathered["user_g"], gathered["item_g"], bg, bsz, k)
        s_d = self._pair_scores(gathered["user_d"], gathered["item_d"], bd, bsz, k)

        # Generator's categorical over the K-item pool (columns 1..K).
        logits_g = s_g[:, 1:] / self.temperature
        if rng is not None:
            gumbel = jax.random.gumbel(
                jax.random.fold_in(rng, 0x1269A7), logits_g.shape,
                dtype=logits_g.dtype,
            )
        else:  # eval-style call on a pairwise batch: greedy pick
            gumbel = jnp.zeros_like(logits_g)
        j = jnp.argmax(jax.lax.stop_gradient(logits_g) + gumbel, axis=-1)  # [B]
        logp = jnp.take_along_axis(
            jax.nn.log_softmax(logits_g, axis=-1), j[:, None], axis=1
        )[:, 0]

        d_pos = s_d[:, 0]
        d_sel = jnp.take_along_axis(s_d[:, 1:], j[:, None], axis=1)[:, 0]
        # REINFORCE reward for picking item j (paper's item-rec reward:
        # log(1 + e^{D}) of the sampled item); never differentiated.
        reward = jax.lax.stop_gradient(jax.nn.softplus(d_sel))
        return {"d_pos": d_pos, "d_sel": d_sel, "logp": logp, "reward": reward,
                "sample": j}

    def warm_start_aliases(self):
        # Paper protocol: BOTH players pretrain from BPR-MF
        # (train.init_from = an mf run's checkpoint dir).
        return {
            "user_g": "user_emb", "item_g": "item_emb",
            "user_d": "user_emb", "item_d": "item_emb",
            "bias_g": "item_bias", "bias_d": "item_bias",
        }

    def dot_decomposition(self) -> DotRetrieval:
        return DotRetrieval("user_g", "item_g", "bias_g" if self.use_bias else None)

    def score_all(self, params, user_ids: jnp.ndarray) -> jnp.ndarray:
        t = params["tables"]
        u = jnp.take(t["user_g"], user_ids, axis=0)
        scores = jnp.dot(u, t["item_g"].T, preferred_element_type=jnp.float32)
        if self.use_bias:
            scores = scores + t["bias_g"][:, 0][None, :]
        return scores
