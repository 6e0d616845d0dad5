"""Metric math vs handwritten numpy oracles (SURVEY.md §4 unit level)."""

import numpy as np
import jax.numpy as jnp

from tfrec_tpu.eval.metrics import auc, logloss, ranking_metrics_from_topk
from tfrec_tpu.eval.retrieval import mask_items, padded_positives, topk_scores
import scipy.sparse as sp


def _oracle_metrics(topk, test_sets, ks):
    """Handwritten reference implementation (python loops)."""
    out = {}
    users = [u for u in range(len(topk)) if test_sets[u]]
    for k in ks:
        recalls, precs, maps_, ndcgs, mrrs = [], [], [], [], []
        for u in users:
            ranked = topk[u][:k]
            rel = [1 if it in test_sets[u] else 0 for it in ranked]
            nrel = len(test_sets[u])
            hits = sum(rel)
            recalls.append(hits / nrel)
            precs.append(hits / k)
            ap, run = 0.0, 0
            for r, x in enumerate(rel):
                if x:
                    run += 1
                    ap += run / (r + 1)
            maps_.append(ap / min(k, nrel))
            dcg = sum(x / np.log2(r + 2) for r, x in enumerate(rel))
            idcg = sum(1 / np.log2(r + 2) for r in range(min(k, nrel)))
            ndcgs.append(dcg / idcg)
            mrr = 0.0
            for r, x in enumerate(rel):
                if x:
                    mrr = 1 / (r + 1)
                    break
            mrrs.append(mrr)
        out[f"recall@{k}"] = np.mean(recalls)
        out[f"precision@{k}"] = np.mean(precs)
        out[f"map@{k}"] = np.mean(maps_)
        out[f"ndcg@{k}"] = np.mean(ndcgs)
        out[f"mrr@{k}"] = np.mean(mrrs)
    return out


def test_ranking_metrics_vs_oracle():
    rng = np.random.default_rng(0)
    U, V, K = 32, 100, 10
    topk = np.stack([rng.choice(V, K, replace=False) for _ in range(U)]).astype(np.int32)
    test_sets = []
    max_t = 6
    padded = np.full((U, max_t), V, np.int32)
    counts = np.zeros(U, np.int32)
    for u in range(U):
        n = int(rng.integers(0, max_t + 1))
        items = rng.choice(V, n, replace=False) if n else np.array([], np.int64)
        test_sets.append(set(items.tolist()))
        padded[u, :n] = items
        counts[u] = n
    got = ranking_metrics_from_topk(
        jnp.asarray(topk), jnp.asarray(padded), jnp.asarray(counts), ks=(5, 10)
    )
    want = _oracle_metrics(topk, test_sets, ks=(5, 10))
    for key, val in want.items():
        np.testing.assert_allclose(float(got[key]), val, rtol=1e-5, err_msg=key)


def test_auc_vs_sklearn_style_oracle():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=200).astype(np.float32)
    labels = (rng.random(200) < 0.4).astype(np.float32)
    # Rank-sum oracle with average ranks for ties.
    from scipy.stats import rankdata

    ranks = rankdata(logits)
    n_pos = labels.sum()
    n_neg = len(labels) - n_pos
    u = ranks[labels > 0.5].sum() - n_pos * (n_pos + 1) / 2
    want = u / (n_pos * n_neg)
    got = float(auc(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_auc_with_ties():
    logits = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    labels = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    np.testing.assert_allclose(float(auc(logits, labels)), 0.5, rtol=1e-6)


def test_auc_degenerate_single_class():
    logits = jnp.asarray([0.3, 0.1, 0.9])
    assert float(auc(logits, jnp.asarray([1.0, 1.0, 1.0]))) == 0.5


def test_logloss_matches_numpy():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=50)
    labels = rng.integers(0, 2, 50).astype(np.float64)
    p = 1 / (1 + np.exp(-logits))
    want = -np.mean(labels * np.log(p) + (1 - labels) * np.log(1 - p))
    got = float(logloss(jnp.asarray(logits, jnp.float32), jnp.asarray(labels, jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_mask_items_and_topk():
    scores = jnp.asarray([[5.0, 4.0, 3.0, 2.0], [1.0, 2.0, 3.0, 4.0]])
    excl = jnp.asarray([[0, 4], [3, 2]], jnp.int32)  # 4 = sentinel for row 0
    counts = jnp.asarray([1, 2], jnp.int32)
    masked = mask_items(scores, excl, counts)
    assert float(masked[0, 0]) < -1e29
    assert float(masked[0, 1]) == 4.0  # sentinel slot must not corrupt col 4→wrap
    vals, ids = topk_scores(scores, 2, excl, counts)
    assert ids[0].tolist() == [1, 2]
    assert ids[1].tolist() == [1, 0]


def test_candidate_topk_approx_matches_exact_on_cpu():
    """Wiring test for the approx_max_k candidate path (serving default).
    On the CPU backend approx_max_k lowers to an exact sort, so approx
    must agree with exact bit-for-bit; on TPU the op is the hardware
    PartialReduce with a per-row recall_target guarantee."""
    import jax

    from tfrec_tpu.eval.retrieval import candidate_topk, chunked_topk

    rng = np.random.default_rng(7)
    scores = jnp.asarray(rng.normal(size=(8, 500)).astype(np.float32))
    ev, ei = candidate_topk(scores, 20, "exact")
    av, ai = candidate_topk(scores, 20, "approx")
    np.testing.assert_array_equal(np.asarray(ei), np.asarray(ai))
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(av))

    # chunked merge: approx per-chunk candidates, exact cross-chunk merge.
    items = jnp.asarray(rng.normal(size=(700, 16)).astype(np.float32))
    users = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))

    def score_chunk(u, start):
        block = jax.lax.dynamic_slice_in_dim(items, start, 256, axis=0)
        return jnp.dot(u, block.T)

    # 700 items over 256-chunks exercises the overhang-sentinel path.
    items = jnp.pad(items, ((0, 3 * 256 - 700), (0, 0)))
    ev2, ei2 = chunked_topk(score_chunk, users, 700, 10, 256, method="exact")
    av2, ai2 = chunked_topk(score_chunk, users, 700, 10, 256, method="approx")
    np.testing.assert_array_equal(np.asarray(ei2), np.asarray(ai2))
    want = np.argsort(-np.asarray(users) @ np.asarray(items)[:700].T, axis=1)[:, :10]
    np.testing.assert_array_equal(np.asarray(ei2), want)


def test_exact_topk_wide_rows_chunk_and_merge_exactly():
    """Rows wider than EXACT_SORT_MAX_WIDTH split into column chunks whose
    per-chunk top-k merge exactly (the monolithic [1024, 1M] sort crashed
    the v5e worker — eval/retrieval.EXACT_SORT_MAX_WIDTH)."""
    import tfrec_tpu.eval.retrieval as retrieval

    rng = np.random.default_rng(11)
    scores_np = rng.normal(size=(4, 700)).astype(np.float32)
    scores = jnp.asarray(scores_np)
    want_ids = np.argsort(-scores_np, axis=1)[:, :9]
    old = retrieval.EXACT_SORT_MAX_WIDTH
    retrieval.EXACT_SORT_MAX_WIDTH = 256  # force the 3-chunk path (700/256)
    try:
        v, i = retrieval.candidate_topk(scores, 9, "exact")
    finally:
        retrieval.EXACT_SORT_MAX_WIDTH = old
    np.testing.assert_array_equal(np.asarray(i), want_ids)
    np.testing.assert_array_equal(
        np.asarray(v), np.take_along_axis(scores_np, want_ids, axis=1)
    )
    # And the unchunked width still routes through the plain sort.
    v2, i2 = retrieval.candidate_topk(scores, 9, "exact")
    np.testing.assert_array_equal(np.asarray(i2), want_ids)


def test_padded_positives():
    m = sp.csr_matrix(
        (np.ones(3), ([0, 0, 2], [1, 3, 2])), shape=(3, 5)
    )
    padded, counts = padded_positives(m)
    assert counts.tolist() == [2, 0, 1]
    assert padded[0].tolist() == [1, 3]
    assert padded[1].tolist() == [5, 5]
