"""Distributed top-k candidate retrieval (BASELINE.json R7; SURVEY.md §3c).

The TPU-native replacement for the reference family's threaded C++ top-k
evaluator: the full pipeline — per-shard MXU scoring U @ V_shard^T, train-
item masking, per-shard ``lax.top_k``, all_gather merge, global re-top-k —
is one XLA program over the mesh. The item table stays in its training
layout P('data', None); no resharding between train and eval.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def sharded_topk_dot(
    mesh: Mesh,
    user_vecs: jnp.ndarray,  # [B, D], replicated
    item_table: jnp.ndarray,  # [V_pad, D], sharded P('data', None)
    k: int,
    num_items: int,
    item_bias: jnp.ndarray | None = None,  # [V_pad], sharded P('data')
    exclude_padded: jnp.ndarray | None = None,  # [B, W] global ids, replicated
    exclude_counts: jnp.ndarray | None = None,  # [B], replicated
    axis: str = "data",
    method: str = "exact",
    recall_target: float = 0.99,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k (values [B,k], global item ids [B,k]) for dot-product scorers.

    ``method="approx"`` uses the TPU-native ``lax.approx_max_k`` for the
    per-shard candidate selection (eval/retrieval.candidate_topk — the
    sort-based exact lowering is ~250x off the MXU ceiling at 131k-row
    shards); the cross-shard merge stays exact."""
    n_sh = mesh.shape[axis]
    v_pad = item_table.shape[0]
    rps = v_pad // n_sh
    k_local = min(k, rps)

    if item_bias is None:
        item_bias = jnp.zeros((v_pad,), jnp.float32)
    if exclude_padded is None:
        exclude_padded = jnp.full((user_vecs.shape[0], 1), num_items, jnp.int32)
        exclude_counts = jnp.zeros((user_vecs.shape[0],), jnp.int32)
    elif exclude_counts is None:
        raise ValueError("exclude_padded requires exclude_counts")

    def local(u, items, bias, exc_p, exc_c):
        base = jax.lax.axis_index(axis) * rps
        scores = jnp.dot(u, items.T, preferred_element_type=jnp.float32)  # [B, rps]
        scores = scores + bias[None, :]
        ids = base + jax.lax.broadcasted_iota(jnp.int32, (1, rps), 1)
        scores = jnp.where(ids < num_items, scores, NEG_INF)
        b = u.shape[0]
        valid = jnp.arange(exc_p.shape[1])[None, :] < exc_c[:, None]
        local_pos = exc_p - base
        hit = valid & (local_pos >= 0) & (local_pos < rps)
        cols = jnp.where(hit, local_pos, rps)
        rows = jnp.broadcast_to(jnp.arange(b)[:, None], cols.shape)
        scores = scores.at[rows, cols].set(NEG_INF, mode="drop")
        from tfrec_tpu.eval.retrieval import candidate_topk

        vals, idx = candidate_topk(scores, k_local, method, recall_target)
        gids = base + idx.astype(jnp.int32)
        # Merge across shards: [B, N*k_local] -> top-k (replicated compute).
        all_vals = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
        all_ids = jax.lax.all_gather(gids, axis, axis=1, tiled=True)
        mvals, midx = jax.lax.top_k(all_vals, k)
        mids = jnp.take_along_axis(all_ids, midx, axis=1)
        # Fewer than k real candidates (tiny catalog / heavy exclusions):
        # mark the empty slots with the documented sentinel num_items
        # instead of leaking padded-row ids.
        mids = jnp.where(mvals <= NEG_INF * 0.5, num_items, mids)
        return mvals, mids

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(user_vecs, item_table, item_bias, exclude_padded, exclude_counts)
