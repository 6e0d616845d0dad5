"""Sampled-candidate ranking evaluation (the NCF leave-one-out protocol).

The reference family's evaluator supports ranking each held-out positive
against N sampled negatives (``rec.evaluate.neg.num``) instead of the full
catalog — the protocol NeuMF-style papers report HR@k/NDCG@k under
(BASELINE.json:9 "sampled negatives"). Full-catalog eval
(eval/retrieval.py) stays the default; this protocol matches the papers
and is much cheaper at ML-20M scale.

Works with EVERY model through the pointwise forward (user repeated over
its 1+N candidates), so MLP/NeuMF need no score_all materialization.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def build_candidates(
    dataset, num_candidates: int, seed: int, max_users: int | None = None
) -> Dict[str, np.ndarray]:
    """Per test interaction: [positive, N sampled negatives].

    Negatives exclude the user's train AND test items (rejection resample).
    Returns {"user": [T], "candidates": [T, 1+N]} for T test cases.
    """
    rng = np.random.default_rng(seed)
    test = dataset.test
    n = len(test) if max_users is None else min(len(test), max_users)
    users = test.users[:n]
    pos = test.items[:n]
    num_items = dataset.num_items

    train_csr = dataset.train_csr
    test_csr = dataset.test_csr

    def user_exclusions(u):
        tr = train_csr.indices[train_csr.indptr[u] : train_csr.indptr[u + 1]]
        te = test_csr.indices[test_csr.indptr[u] : test_csr.indptr[u + 1]]
        return set(tr.tolist()) | set(te.tolist())

    excl_cache: Dict[int, set] = {}
    negs = np.empty((n, num_candidates), dtype=np.int32)
    for i, u in enumerate(users):
        excl = excl_cache.get(int(u))
        if excl is None:
            excl = user_exclusions(int(u))
            excl_cache[int(u)] = excl
        draw = rng.integers(0, num_items, num_candidates * 2)
        picked = [d for d in draw if d not in excl][:num_candidates]
        for _ in range(8):  # bounded rejection rounds
            if len(picked) >= num_candidates:
                break
            extra = rng.integers(0, num_items, num_candidates)
            picked.extend(d for d in extra if d not in excl)
        picked = picked[:num_candidates]
        if len(picked) < num_candidates:
            # Degenerate user interacting with (almost) the whole catalog:
            # fill with unrestricted draws so evaluation terminates; the
            # metric is pessimistic for this user, never wrong for others.
            fill = rng.integers(0, num_items, num_candidates - len(picked))
            picked.extend(int(d) for d in fill)
        negs[i] = picked
    candidates = np.concatenate([pos[:, None], negs], axis=1).astype(np.int32)
    return {"user": users.astype(np.int32), "candidates": candidates}


class SampledEvaluator:
    """Compile-once HR@k / NDCG@k over fixed sampled candidates."""

    def __init__(
        self,
        model,
        dataset,
        ks: Sequence[int],
        num_candidates: int = 100,
        seed: int = 0,
        user_batch: int = 512,
        # Cap on evaluated test interactions (cost control at ML-20M
        # scale); the returned "eval_cases" metric reports the actual
        # coverage so capped runs are never mistaken for full-protocol.
        max_users: int | None = 20_000,
    ):
        self.model = model
        self.ks = tuple(ks)
        self.user_batch = user_batch
        data = build_candidates(dataset, num_candidates, seed, max_users)
        self.users = data["user"]
        self.candidates = data["candidates"]
        width = self.candidates.shape[1]

        def rank_batch(params, users, cands):  # [B], [B, 1+N]
            b = users.shape[0]
            if hasattr(self.model, "score_user_items"):
                # Per-user candidate fast path (sequential family): the
                # user representation is computed ONCE per user instead
                # of once per candidate.
                scores = self.model.score_user_items(params, users, cands)
            else:
                flat_users = jnp.repeat(users, width)
                flat_items = cands.reshape(-1)
                batch = {
                    "user": flat_users,
                    "item": flat_items,
                    "label": jnp.zeros_like(flat_users, jnp.float32),
                }
                ids = self.model.lookup_ids(batch)
                gathered = {
                    k: jnp.take(params["tables"][k], v, axis=0, mode="clip")
                    for k, v in ids.items()
                }
                scores = self.model.forward(params["dense"], gathered, batch)
                scores = scores.reshape(b, width)
            # rank of the positive (column 0): #candidates scoring strictly
            # higher (ties resolved in the positive's favor, family style)
            return jnp.sum(
                (scores[:, 1:] > scores[:, :1]).astype(jnp.int32), axis=1
            )

        self._rank_batch = jax.jit(rank_batch)

    def __call__(self, params) -> Dict[str, float]:
        ranks = []
        ub = self.user_batch
        n = len(self.users)
        for start in range(0, n, ub):
            users = self.users[start : start + ub]
            cands = self.candidates[start : start + ub]
            if len(users) < ub:  # pad to static shape
                pad = ub - len(users)
                users = np.concatenate([users, np.zeros(pad, np.int32)])
                cands = np.concatenate(
                    [cands, np.zeros((pad, cands.shape[1]), np.int32)]
                )
                r = np.asarray(
                    self._rank_batch(params, jnp.asarray(users), jnp.asarray(cands))
                )[: ub - pad]
            else:
                r = np.asarray(
                    self._rank_batch(params, jnp.asarray(users), jnp.asarray(cands))
                )
            ranks.append(r)
        rank = np.concatenate(ranks).astype(np.float64)
        out: Dict[str, float] = {"eval_cases": float(len(rank))}
        for k in self.ks:
            hit = rank < k
            out[f"hr@{k}"] = float(hit.mean())
            out[f"ndcg_sampled@{k}"] = float(
                np.where(hit, 1.0 / np.log2(rank + 2.0), 0.0).mean()
            )
        return out
