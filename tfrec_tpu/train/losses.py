"""Training objectives (BASELINE.json R5).

Pairwise losses consume the model's pairwise output s(u,pos)-s(u,neg);
pointwise losses consume logits + batch labels. All are numerically stable
mean-reduced scalars.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp


def _as_pair_diff(x: jnp.ndarray) -> jnp.ndarray:
    """1D inputs are already s_pos - s_neg; 2D [B, 1+K] score matrices
    (multi-negative batches) become per-negative diffs [B, K]."""
    if x.ndim == 2:
        return x[:, :1] - x[:, 1:]
    return x


def bpr(pair_logits: jnp.ndarray, batch: Dict) -> jnp.ndarray:
    """BPR: -mean log sigmoid(s_pos - s_neg) = mean softplus(-diff)."""
    return jnp.mean(jnp.logaddexp(0.0, -_as_pair_diff(pair_logits)))


def hinge(pair_logits: jnp.ndarray, batch: Dict) -> jnp.ndarray:
    """Pairwise hinge with unit margin."""
    return jnp.mean(jnp.maximum(0.0, 1.0 - _as_pair_diff(pair_logits)))


def sampled_softmax(scores: jnp.ndarray, batch: Dict) -> jnp.ndarray:
    """Sampled softmax over [B, 1+K] score matrices (column 0 is the
    positive): -mean log softmax(scores)[:, 0]."""
    assert scores.ndim == 2, "sampled_softmax needs multi-negative batches"
    return -jnp.mean(jax.nn.log_softmax(scores, axis=-1)[:, 0])


def in_batch_softmax(scores: jnp.ndarray, batch: Dict) -> jnp.ndarray:
    """In-batch-negatives softmax over a [B, B] score matrix (row u scored
    against every positive item in the batch; the diagonal is u's own
    positive) — the standard two-tower production retrieval loss. Rows
    whose positive collides with another row's positive are still valid
    softmax targets (the duplicate column simply shares probability mass).
    """
    assert scores.ndim == 2 and scores.shape[0] == scores.shape[1], (
        "in_batch_softmax needs the [B, B] user-x-batch-items score matrix"
    )
    return -jnp.mean(jnp.diag(jax.nn.log_softmax(scores, axis=-1)))


def logloss(logits: jnp.ndarray, batch: Dict) -> jnp.ndarray:
    """Binary cross-entropy from logits."""
    labels = batch["label"]
    return jnp.mean(
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def multvae(out: Dict, batch: Dict) -> jnp.ndarray:
    """Mult-VAE ELBO: multinomial NLL of the user's history under the
    reconstruction softmax + the (model-pre-scaled) KL term. ``out`` is
    MultVAE.forward's {"logits": [B, V], "kl": [B]}; the reconstruction
    target is the sentinel-padded batch["hist"] itself."""
    logits, kl = out["logits"], out["kl"]
    logp = jax.nn.log_softmax(logits, axis=-1)
    hist = batch["hist"]
    v = logits.shape[-1]
    valid = hist < v
    picked = jnp.take_along_axis(logp, jnp.minimum(hist, v - 1), axis=1)
    nll = -jnp.sum(jnp.where(valid, picked, 0.0), axis=1)
    return jnp.mean(nll + kl)


def sasrec(out: Dict, batch: Dict) -> jnp.ndarray:
    """Per-position next-item BCE (SASRec): positive target vs one
    sampled negative at every valid sequence position. ``out`` is
    SASRec.forward's {"pos" [B,L-1], "neg" [B,L-1], "mask" [B,L-1]}."""
    mask = out["mask"].astype(out["pos"].dtype)
    per_pos = jax.nn.softplus(-out["pos"]) + jax.nn.softplus(out["neg"])
    return jnp.sum(per_pos * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def apr(out: Dict, batch: Dict) -> jnp.ndarray:
    """Adversarial personalized ranking: clean BPR plus lambda-weighted
    BPR on the fast-gradient-perturbed embeddings. ``out`` is
    APR.forward's {"diff" [B], "diff_adv" [B], "adv_weight" scalar}."""
    return jnp.mean(
        jax.nn.softplus(-out["diff"])
        + out["adv_weight"] * jax.nn.softplus(-out["diff_adv"])
    )


def sbpr(out: Dict, batch: Dict) -> jnp.ndarray:
    """Social BPR (SBPR): x_pos >= x_soc >= x_neg as two BPR terms, the
    positive-vs-social gap tempered by the social coefficient suk; rows
    without social candidates (has == 0) train plain BPR. ``out`` is
    SBPR.forward's {"pos", "soc", "neg", "suk", "has"} (all [B])."""
    has = out["has"].astype(out["pos"].dtype)
    d_ps = (out["pos"] - out["soc"]) / (1.0 + out["suk"])
    d_sn = out["soc"] - out["neg"]
    social = jax.nn.softplus(-d_ps) + jax.nn.softplus(-d_sn)
    plain = jax.nn.softplus(-(out["pos"] - out["neg"]))
    return jnp.mean(has * social + (1.0 - has) * plain)


def irgan(out: Dict, batch: Dict) -> jnp.ndarray:
    """IRGAN minimax step: discriminator BCE (true positive up, the
    generator's sampled item down) plus the generator's REINFORCE term
    (batch-mean baseline for variance reduction). ``out`` is
    IRGAN.forward's {"d_pos", "d_sel", "logp", "reward"} (all [B];
    "reward" is already stop_gradient-ed by the model). The two players'
    gradient flows are disjoint, so one simultaneous step equals one
    D-phase + one G-phase on the same batch (models/irgan.py)."""
    d_loss = jax.nn.softplus(-out["d_pos"]) + jax.nn.softplus(out["d_sel"])
    advantage = out["reward"] - jnp.mean(out["reward"])
    g_loss = -(advantage * out["logp"])
    return jnp.mean(d_loss) + jnp.mean(g_loss)


def cdae(logits: jnp.ndarray, batch: Dict) -> jnp.ndarray:
    """CDAE reconstruction: binary cross-entropy of the full-catalog
    logits [B, V] against the user's multi-hot history (sentinel-padded
    batch["hist"]). Stable formulation: BCE(x, t) = softplus(x) - t*x,
    summed over items, averaged over the batch."""
    v = logits.shape[-1]
    hist = batch["hist"]
    valid = hist < v
    target = (
        jnp.zeros(logits.shape, logits.dtype)
        .at[
            jnp.arange(hist.shape[0])[:, None],
            jnp.minimum(hist, v - 1),
        ]
        .max(valid.astype(logits.dtype))
    )
    per_elem = jax.nn.softplus(logits) - target * logits
    return jnp.mean(jnp.sum(per_elem, axis=-1))


def mse(logits: jnp.ndarray, batch: Dict) -> jnp.ndarray:
    """Squared error against (possibly real-valued) labels — explicit-rating MF."""
    return jnp.mean((logits - batch["label"]) ** 2)


_LOSSES: Dict[str, Callable] = {
    "bpr": bpr,
    "hinge": hinge,
    "logloss": logloss,
    "mse": mse,
    "sampled_softmax": sampled_softmax,
    "in_batch_softmax": in_batch_softmax,
    "multvae": multvae,
    "cdae": cdae,
    "sasrec": sasrec,
    "sbpr": sbpr,
    "apr": apr,
    "irgan": irgan,
}

# "apr" consumes the same (user, pos, neg) triples as bpr/hinge;
# "irgan" consumes multi-negative pools like sampled_softmax.
PAIRWISE_LOSSES = ("bpr", "hinge", "sampled_softmax", "in_batch_softmax",
                   "apr", "irgan")
MULTI_NEG_LOSSES = ("sampled_softmax", "irgan")
# Losses needing only (user, pos) rows; negatives come from the batch itself.
IN_BATCH_LOSSES = ("in_batch_softmax",)


def make_loss(name: str) -> Callable[[jnp.ndarray, Dict], jnp.ndarray]:
    if name not in _LOSSES:
        raise ValueError(f"unknown loss {name!r}; options: {sorted(_LOSSES)}")
    return _LOSSES[name]
