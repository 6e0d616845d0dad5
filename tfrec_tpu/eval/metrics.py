"""Ranking and classification metrics, computed on device.

Covers the reference family's evaluator metric set — Precision/Recall/MAP/
NDCG/MRR @k plus AUC for CTR (SURVEY.md §2a "eval-native") — as pure jnp
functions over static-shape inputs so they fuse into the jitted eval program.
Host numpy oracles live in tests/test_metrics.py.

Conventions:
- ``topk_items``: [U, K] int32 ranked item ids (best first).
- ``test_padded``: [U, T] int32 per-user test positives padded with an
  out-of-range sentinel (>= num_items); ``test_counts``: [U] int32.
- Users with zero test items are excluded from metric means.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp


def _hit_matrix(topk_items: jnp.ndarray, test_padded: jnp.ndarray, test_counts: jnp.ndarray) -> jnp.ndarray:
    """[U, K] float32: 1 where the ranked item is a test positive."""
    valid = (
        jnp.arange(test_padded.shape[1])[None, :] < test_counts[:, None]
    )  # [U, T]
    eq = topk_items[:, :, None] == test_padded[:, None, :]  # [U, K, T]
    return jnp.any(eq & valid[:, None, :], axis=-1).astype(jnp.float32)


def ranking_metrics_from_topk(
    topk_items: jnp.ndarray,
    test_padded: jnp.ndarray,
    test_counts: jnp.ndarray,
    ks: Sequence[int],
) -> Dict[str, jnp.ndarray]:
    """Compute Precision/Recall/MAP/NDCG/MRR @k for each k in ``ks``.

    Definitions follow the standard full-ranking evaluation protocol
    (binary relevance, ideal DCG over min(k, |test|) positives).
    """
    hits = _hit_matrix(topk_items, test_padded, test_counts)  # [U, K]
    counts = test_counts.astype(jnp.float32)
    has_test = counts > 0
    denom_users = jnp.maximum(jnp.sum(has_test.astype(jnp.float32)), 1.0)
    ranks = jnp.arange(1, hits.shape[1] + 1, dtype=jnp.float32)  # [K]
    log2_discount = 1.0 / jnp.log2(ranks + 1.0)
    cum_hits = jnp.cumsum(hits, axis=1)  # hits within top-r

    out: Dict[str, jnp.ndarray] = {}
    for k in ks:
        h = hits[:, :k]
        hits_at_k = cum_hits[:, k - 1]
        recall = jnp.where(has_test, hits_at_k / jnp.maximum(counts, 1.0), 0.0)
        precision = jnp.where(has_test, hits_at_k / k, 0.0)
        # MAP@k: mean over min(k, |test|) of precision-at-hit-positions.
        prec_at_r = cum_hits[:, :k] / ranks[:k][None, :]
        ap = jnp.sum(prec_at_r * h, axis=1) / jnp.maximum(
            jnp.minimum(counts, float(k)), 1.0
        )
        # NDCG@k with binary gains; IDCG over min(k, |test|) ones.
        dcg = jnp.sum(h * log2_discount[:k][None, :], axis=1)
        ideal_len = jnp.minimum(counts, float(k))
        # idcg(u) = sum_{r<ideal_len} 1/log2(r+2): use cumsum lookup.
        idcg_table = jnp.concatenate(
            [jnp.zeros(1), jnp.cumsum(log2_discount[:k])]
        )  # [k+1]
        idcg = idcg_table[jnp.minimum(ideal_len, k).astype(jnp.int32)]
        ndcg = jnp.where(has_test, dcg / jnp.maximum(idcg, 1e-12), 0.0)
        # MRR@k: reciprocal rank of the first hit.
        first_hit = jnp.argmax(h, axis=1)
        any_hit = jnp.any(h > 0, axis=1)
        mrr = jnp.where(any_hit, 1.0 / (first_hit + 1.0), 0.0)

        out[f"recall@{k}"] = jnp.sum(recall) / denom_users
        out[f"precision@{k}"] = jnp.sum(precision) / denom_users
        out[f"map@{k}"] = jnp.sum(jnp.where(has_test, ap, 0.0)) / denom_users
        out[f"ndcg@{k}"] = jnp.sum(ndcg) / denom_users
        out[f"mrr@{k}"] = jnp.sum(jnp.where(has_test, mrr, 0.0)) / denom_users
    return out


def auc(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mann-Whitney AUC over a batch of binary labels, with proper tie
    handling via average ranks (matches sklearn.roc_auc_score)."""
    order = jnp.argsort(logits)
    sorted_logits = logits[order]
    # Average rank for ties: rank = mean of positions with equal value.
    n = logits.shape[0]
    # For each position, find the span of equal values. O(n) run scans,
    # not jnp.searchsorted — its XLA:TPU lowering is a vmapped
    # binary-search while-loop (round-4 device trace, docs/PERF.md).
    from tfrec_tpu.ops.embedding import run_first_index, run_last_index_plus1

    lo = run_first_index(sorted_logits).astype(jnp.float32)
    hi = run_last_index_plus1(sorted_logits).astype(jnp.float32)
    avg_rank_sorted = (lo + hi - 1.0) / 2.0 + 1.0  # 1-based average ranks
    ranks = jnp.zeros(n, dtype=jnp.float32).at[order].set(avg_rank_sorted)
    pos = labels > 0.5
    n_pos = jnp.sum(pos.astype(jnp.float32))
    n_neg = n - n_pos
    rank_sum_pos = jnp.sum(jnp.where(pos, ranks, 0.0))
    u = rank_sum_pos - n_pos * (n_pos + 1.0) / 2.0
    return jnp.where((n_pos > 0) & (n_neg > 0), u / jnp.maximum(n_pos * n_neg, 1.0), 0.5)


def logloss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy from logits (numerically stable)."""
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
