"""Training objectives (BASELINE.json R5).

Pairwise losses consume the model's pairwise output s(u,pos)-s(u,neg);
pointwise losses consume logits + batch labels. All are numerically stable
mean-reduced scalars.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp


def bpr(pair_diff: jnp.ndarray, batch: Dict) -> jnp.ndarray:
    """BPR: -mean log sigmoid(s_pos - s_neg) = mean softplus(-diff)."""
    return jnp.mean(jnp.logaddexp(0.0, -pair_diff))


def hinge(pair_diff: jnp.ndarray, batch: Dict) -> jnp.ndarray:
    """Pairwise hinge with unit margin."""
    return jnp.mean(jnp.maximum(0.0, 1.0 - pair_diff))


def logloss(logits: jnp.ndarray, batch: Dict) -> jnp.ndarray:
    """Binary cross-entropy from logits."""
    labels = batch["label"]
    return jnp.mean(
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def mse(logits: jnp.ndarray, batch: Dict) -> jnp.ndarray:
    """Squared error against (possibly real-valued) labels — explicit-rating MF."""
    return jnp.mean((logits - batch["label"]) ** 2)


_LOSSES: Dict[str, Callable] = {
    "bpr": bpr,
    "hinge": hinge,
    "logloss": logloss,
    "mse": mse,
}

PAIRWISE_LOSSES = ("bpr", "hinge")


def make_loss(name: str) -> Callable[[jnp.ndarray, Dict], jnp.ndarray]:
    if name not in _LOSSES:
        raise ValueError(f"unknown loss {name!r}; options: {sorted(_LOSSES)}")
    return _LOSSES[name]
