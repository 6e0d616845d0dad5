"""APR — adversarial personalized ranking (He et al. 2018), the
adversarial-training member of the reference family's zoo (SURVEY.md
§2a "other zoo models": IRGAN/APR group).

BPR-MF hardened by a minimax objective: each step constructs the
worst-case L2-bounded perturbation of the (user, pos, neg) embedding
rows — the normalized gradient of the BPR loss w.r.t. those rows, the
fast-gradient method — and trains on the clean AND perturbed losses.

TPU-native framing: the inner maximization is a nested ``jax.grad``
over the gathered rows INSIDE the jitted step (the perturbation is
``stop_gradient``-ed, per the paper, so the outer backward does not
differentiate through the attack construction). No separate adversarial
phase, no second session: one XLA program per step, same sparse path as
MF. Eval is untouched MF scoring (adversarial training changes the
objective, not the scorer).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from tfrec_tpu.models.mf import MF


class APR(MF):
    def __init__(self, data_spec, embed_dim: int, eps: float = 0.5,
                 adv_lambda: float = 1.0, use_bias: bool = True):
        super().__init__(data_spec, embed_dim, use_bias=use_bias)
        self.eps = eps
        self.adv_lambda = adv_lambda

    def forward(self, dense, gathered, batch, *, rng=None):
        if not self.is_pairwise(batch) or "neg" not in batch:
            # Pointwise / eval paths score as plain MF.
            return super().forward(dense, gathered, batch, rng=rng)

        def diff_fn(emb: Dict[str, jnp.ndarray]) -> jnp.ndarray:
            u = emb["user_emb"]
            bsz = u.shape[0]
            i = emb["item_emb"]
            b = emb.get("item_bias")
            s_pos = jnp.sum(u * i[:bsz], axis=-1)
            s_neg = jnp.sum(u * i[bsz:], axis=-1)
            if b is not None:
                s_pos = s_pos + b[:bsz, 0]
                s_neg = s_neg + b[bsz:, 0]
            return s_pos - s_neg

        diff = diff_fn(gathered)

        # Perturb only the factor rows; biases stay clean (the paper
        # perturbs the embedding parameters).
        factors = {k: gathered[k] for k in ("user_emb", "item_emb")}

        def bpr_loss(f):
            return jnp.sum(jax.nn.softplus(-diff_fn({**gathered, **f})))

        grads = jax.grad(bpr_loss)(factors)
        adv = dict(gathered)
        for k, g in grads.items():
            norm = jnp.sqrt(jnp.sum(g * g, axis=-1, keepdims=True))
            delta = self.eps * g / jnp.maximum(norm, 1e-12)
            adv[k] = gathered[k] + jax.lax.stop_gradient(delta)
        diff_adv = diff_fn(adv)
        return {
            "diff": diff, "diff_adv": diff_adv,
            "adv_weight": jnp.asarray(self.adv_lambda, diff.dtype),
        }
