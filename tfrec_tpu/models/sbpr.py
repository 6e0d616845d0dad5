"""SBPR — social Bayesian personalized ranking (Zhao et al. 2014), the
social-recommender family of the reference layer map (SURVEY.md §1a:
"general / sequential / social recommenders").

Preference assumption: items a user's friends consumed (social feedback)
rank between the user's own positives and unobserved items:
x_pos >= x_soc >= x_neg, trained as two BPR terms with the positive-vs-
social gap tempered by the social coefficient ``suk`` (how many friends
consumed the item). Users without social candidates train plain BPR.

The scorer IS matrix factorization — SBPR changes only the sampler
(data/samplers.SBPRSampler routes triples with a social column) and the
objective (train/losses.sbpr) — so the model subclasses MF: same tables
on the sparse-optimizer path, same full-catalog MXU scoring, same
dot-product decomposition for the sharded top-k eval/serving path.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from tfrec_tpu.models.mf import MF


class SBPR(MF):
    def lookup_ids(self, batch) -> Dict[str, jnp.ndarray]:
        if "soc" not in batch:
            return super().lookup_ids(batch)
        items = jnp.concatenate([batch["pos"], batch["soc"], batch["neg"]])
        ids = {"user_emb": batch["user"], "item_emb": items}
        if self.use_bias:
            ids["item_bias"] = items
        return ids

    def forward(self, dense, gathered, batch, *, rng=None):
        if "soc" not in batch:
            return super().forward(dense, gathered, batch, rng=rng)
        u = gathered["user_emb"]
        iv = gathered["item_emb"]
        b = gathered.get("item_bias")
        bsz = u.shape[0]

        def score(k):
            vec = iv[k * bsz : (k + 1) * bsz]
            s = jnp.sum(u * vec, axis=-1)
            if b is not None:
                s = s + b[k * bsz : (k + 1) * bsz, 0]
            return s

        return {
            "pos": score(0), "soc": score(1), "neg": score(2),
            "suk": batch["suk"], "has": batch["has_social"],
        }
