"""Top-k candidate retrieval and full-catalog ranking evaluation.

The reference family evaluates by scoring every item per user, masking train
items, taking top-k, and computing ranking metrics in a threaded C++ backend
(SURVEY.md §2a "eval-native", §3a). The TPU-native default here runs the
whole pipeline on device: MXU-batched scoring in item chunks with a running
top-k merge, -inf masking of train items, and jnp metrics — compiled to
native TPU code by XLA (SURVEY.md §2c item 1). The sharded multi-device
variant lives in tfrec_tpu/parallel/topk.py; the host C++ parity evaluator
in tfrec_tpu/eval/native.py.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from tfrec_tpu.eval.metrics import ranking_metrics_from_topk

NEG_INF = -1e30

# Widest row an exact lax.top_k may sort in one piece. The full bitonic
# sort of a [1024, 1M] f32 matrix CRASHED the v5e worker outright
# (2026-08-19, bench_topk_exact_record — the sort materializes multiples
# of the 4 GB input); rows wider than this are split into column chunks
# whose per-chunk top-k results merge exactly. Approx (PartialReduce)
# consumes any width tile-by-tile and needs no split.
EXACT_SORT_MAX_WIDTH = 262_144


def candidate_topk(
    scores: jnp.ndarray, k: int, method: str = "exact",
    recall_target: float = 0.99,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row top-k candidate selection over wide score rows.

    ``exact`` = ``lax.top_k`` (full sort lowering — measured ~250x off the
    MXU ceiling at 131k-wide rows on v5e, docs/PERF.md; rows wider than
    EXACT_SORT_MAX_WIDTH are column-chunked and merged exactly, because
    the monolithic sort crashes the worker at [1024, 1M]); ``approx`` =
    ``lax.approx_max_k`` (the TPU PartialReduce op built for exactly this;
    per-row recall guarantee ``recall_target``, falls back to exact
    sorting on CPU). Production serving/bench default is approx; metric
    parity bands use exact."""
    if method == "approx":
        return jax.lax.approx_max_k(scores, k, recall_target=recall_target)
    if method != "exact":
        raise ValueError(f"unknown topk method {method!r}")
    v = scores.shape[-1]
    if v > EXACT_SORT_MAX_WIDTH:
        n_chunks = -(-v // EXACT_SORT_MAX_WIDTH)
        vals, ids = [], []
        for c in range(n_chunks):
            lo = c * EXACT_SORT_MAX_WIDTH
            blk = scores[..., lo : lo + EXACT_SORT_MAX_WIDTH]
            bv, bi = jax.lax.top_k(blk, min(k, blk.shape[-1]))
            vals.append(bv)
            ids.append(bi + lo)
        mv, mi = jnp.concatenate(vals, -1), jnp.concatenate(ids, -1)
        fv, fi = jax.lax.top_k(mv, k)
        return fv, jnp.take_along_axis(mi, fi, axis=-1)
    return jax.lax.top_k(scores, k)


def padded_positives(
    csr: sp.csr_matrix, pad_to: int | None = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-row positive-item lists padded to a static width with the
    out-of-range sentinel ``num_items``. Returns (padded [U,W] i32, counts [U] i32)."""
    num_users, num_items = csr.shape
    lengths = np.diff(csr.indptr).astype(np.int32)
    width = int(pad_to if pad_to is not None else max(1, lengths.max(initial=1)))
    padded = np.full((num_users, width), num_items, dtype=np.int32)
    for u in range(num_users):
        row = csr.indices[csr.indptr[u] : csr.indptr[u + 1]][:width]
        padded[u, : len(row)] = row
    return padded, np.minimum(lengths, width)


def mask_items(
    scores: jnp.ndarray, exclude_padded: jnp.ndarray, exclude_counts: jnp.ndarray
) -> jnp.ndarray:
    """Set scores of per-user excluded items (e.g. train positives) to -inf.

    ``exclude_padded`` uses the sentinel num_items, which is out of range for
    the scatter and therefore dropped via mode='drop'.
    """
    batch = scores.shape[0]
    valid = (
        jnp.arange(exclude_padded.shape[1])[None, :] < exclude_counts[:, None]
    )
    cols = jnp.where(valid, exclude_padded, scores.shape[1])  # sentinel when invalid
    rows = jnp.broadcast_to(jnp.arange(batch)[:, None], cols.shape)
    return scores.at[rows, cols].set(NEG_INF, mode="drop")


def topk_scores(
    scores: jnp.ndarray,
    k: int,
    exclude_padded: jnp.ndarray | None = None,
    exclude_counts: jnp.ndarray | None = None,
    method: str = "exact",
    recall_target: float = 0.99,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k (values, item ids) over a dense [B, V] score matrix."""
    if exclude_padded is not None:
        scores = mask_items(scores, exclude_padded, exclude_counts)
    return candidate_topk(scores, k, method, recall_target)


def chunked_topk(
    score_chunk_fn: Callable[[jnp.ndarray, int], jnp.ndarray],
    user_ids: jnp.ndarray,
    num_items: int,
    k: int,
    chunk_size: int,
    exclude_padded: jnp.ndarray | None = None,
    exclude_counts: jnp.ndarray | None = None,
    method: str = "exact",
    recall_target: float = 0.99,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Running top-k merge over item chunks — never materializes [B, V].

    ``score_chunk_fn(user_ids, chunk_start) -> [B, chunk_size]`` scores items
    [chunk_start, chunk_start+chunk_size). num_items is padded up to a
    multiple of chunk_size; out-of-range items score -inf. ``method`` picks
    the per-chunk candidate selection (candidate_topk); the cross-chunk
    merge over [B, 2k] is always exact.
    """
    batch = user_ids.shape[0]
    num_chunks = -(-num_items // chunk_size)

    def body(carry, chunk_idx):
        best_vals, best_ids = carry
        start = chunk_idx * chunk_size
        scores = score_chunk_fn(user_ids, start)  # [B, C]
        ids = start + jnp.arange(chunk_size, dtype=jnp.int32)[None, :]
        in_range = ids < num_items
        scores = jnp.where(in_range, scores, NEG_INF)
        if exclude_padded is not None:
            # Mask excluded items that fall in this chunk.
            valid = (
                jnp.arange(exclude_padded.shape[1])[None, :]
                < exclude_counts[:, None]
            )
            local = exclude_padded - start
            hit = valid & (local >= 0) & (local < chunk_size)
            cols = jnp.where(hit, local, chunk_size)
            rows = jnp.broadcast_to(
                jnp.arange(batch)[:, None], cols.shape
            )
            scores = scores.at[rows, cols].set(NEG_INF, mode="drop")
        c_vals, c_idx = candidate_topk(scores, min(k, chunk_size), method,
                                       recall_target)
        c_ids = start + c_idx.astype(jnp.int32)
        c_ids = jnp.where(c_vals <= NEG_INF * 0.5, num_items, c_ids)
        merged_vals = jnp.concatenate([best_vals, c_vals], axis=1)
        merged_ids = jnp.concatenate([best_ids, c_ids], axis=1)
        vals, idx = jax.lax.top_k(merged_vals, k)
        new_ids = jnp.take_along_axis(merged_ids, idx, axis=1)
        return (vals, new_ids), None

    init = (
        jnp.full((batch, k), NEG_INF, dtype=jnp.float32),
        jnp.full((batch, k), num_items, dtype=jnp.int32),
    )
    (vals, ids), _ = jax.lax.scan(body, init, jnp.arange(num_chunks))
    return vals, ids


class RetrievalEvaluator:
    """Compile-once full-catalog ranking evaluation.

    The jitted per-batch program (catalog scoring -> train-item masking ->
    top-k -> metrics) and the padded positives are built once and reused
    across eval epochs — rebuilding them per call would recompile every
    time, which dominates eval cost on TPU.
    """

    def __init__(
        self,
        score_all_fn: Callable[..., jnp.ndarray],
        dataset,
        ks: Sequence[int],
        user_batch: int = 256,
        topk_method: str = "exact",
    ):
        self.ks = tuple(ks)
        self.user_batch = user_batch
        self.train_padded, self.train_counts = padded_positives(dataset.train_csr)
        self.test_padded, self.test_counts = padded_positives(dataset.test_csr)
        self.users_with_test = np.flatnonzero(self.test_counts > 0).astype(np.int32)
        max_k = max(self.ks)
        ks_local = self.ks

        @jax.jit
        def eval_batch(params, users, trn_p, trn_c, tst_p, tst_c):
            with jax.named_scope("score_catalog"):
                scores = score_all_fn(params, users)
            with jax.named_scope("mask_topk"):
                _, topk_items = topk_scores(scores, max_k, trn_p, trn_c,
                                            method=topk_method)
            with jax.named_scope("ranking_metrics"):
                m = ranking_metrics_from_topk(topk_items, tst_p, tst_c, ks_local)
            n_users = jnp.sum((tst_c > 0).astype(jnp.float32))
            return {k: v * n_users for k, v in m.items()}, n_users

        self._eval_batch = eval_batch

    def __call__(self, params) -> Dict[str, float]:
        sums: Dict[str, float] = {}
        total_users = 0.0
        user_batch = self.user_batch
        for start in range(0, len(self.users_with_test), user_batch):
            batch_users = self.users_with_test[start : start + user_batch]
            # Pad the final batch to static shape; padded users have 0 test
            # items so they contribute nothing.
            if len(batch_users) < user_batch:
                pad = np.zeros(user_batch - len(batch_users), dtype=np.int32)
                mask = np.concatenate(
                    [np.ones(len(batch_users), bool), np.zeros(len(pad), bool)]
                )
                batch_users = np.concatenate([batch_users, pad])
            else:
                mask = np.ones(user_batch, bool)
            tst_c = np.where(mask, self.test_counts[batch_users], 0).astype(np.int32)
            metrics, n_users = self._eval_batch(
                params,
                jnp.asarray(batch_users),
                jnp.asarray(self.train_padded[batch_users]),
                jnp.asarray(self.train_counts[batch_users]),
                jnp.asarray(self.test_padded[batch_users]),
                jnp.asarray(tst_c),
            )
            total_users += float(n_users)
            for key, val in metrics.items():
                sums[key] = sums.get(key, 0.0) + float(val)
        return {k: v / max(total_users, 1.0) for k, v in sums.items()}


def evaluate_retrieval(
    score_all_fn: Callable[..., jnp.ndarray],
    params,
    dataset,
    ks: Sequence[int],
    user_batch: int = 256,
) -> Dict[str, float]:
    """One-shot convenience wrapper around RetrievalEvaluator."""
    return RetrievalEvaluator(score_all_fn, dataset, ks, user_batch)(params)
