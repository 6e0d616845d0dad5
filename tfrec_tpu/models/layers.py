"""Shared dense building blocks (MLP towers) as pure init/apply pairs.

Kept deliberately framework-free (plain pytrees, no flax) so the trainer can
pjit over them with explicit shardings and nothing hides parameters.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

MLPParams = List[Tuple[jnp.ndarray, jnp.ndarray]]


def glorot(rng: jax.Array, shape: Tuple[int, int]) -> jnp.ndarray:
    fan_in, fan_out = shape
    scale = (2.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.normal(rng, shape) * scale


def init_mlp(
    rng: jax.Array, in_dim: int, widths: Sequence[int], out_dim: int | None = None
) -> MLPParams:
    """Hidden layers of the given widths, plus an optional linear head."""
    dims = [in_dim, *widths] + ([out_dim] if out_dim is not None else [])
    keys = jax.random.split(rng, max(len(dims) - 1, 1))
    return [
        (glorot(keys[i], (dims[i], dims[i + 1])), jnp.zeros((dims[i + 1],)))
        for i in range(len(dims) - 1)
    ]


def apply_mlp(
    params: MLPParams,
    x: jnp.ndarray,
    *,
    final_linear: bool = True,
    dropout: float = 0.0,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """ReLU MLP; if final_linear, the last layer has no activation (a head).

    Dropout (inverted scaling) is applied after each ReLU only when an rng
    is supplied — eval paths simply omit the rng.
    """
    n = len(params)
    for i, (w, b) in enumerate(params):
        x = x @ w + b
        if not (final_linear and i == n - 1):
            x = jax.nn.relu(x)
            if dropout > 0.0 and rng is not None:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 1.0 - dropout, x.shape)
                x = jnp.where(keep, x / (1.0 - dropout), 0.0)
    return x
