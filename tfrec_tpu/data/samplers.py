"""Negative-sampling mini-batch generators.

The reference family resamples negatives every epoch in host Python — its
documented bottleneck (SURVEY.md §3a "sampler ... a real bottleneck"). These
samplers are fully vectorized numpy: membership tests run against a single
sorted key array of all train pairs (one ``searchsorted`` per rejection
round), so epoch sampling is O(N log N) with no Python-per-example loops.
All batches have static shapes; the remainder batch is dropped.
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np

from tfrec_tpu.data.dataset import Dataset


class _TrainPairIndex:
    """Sorted u*num_items+i key array for O(log N) membership tests."""

    def __init__(self, dataset: Dataset):
        self.num_items = dataset.num_items
        keys = (
            dataset.train.users.astype(np.int64) * dataset.num_items
            + dataset.train.items.astype(np.int64)
        )
        self.keys = np.sort(keys)

    def contains(self, users: np.ndarray, items: np.ndarray) -> np.ndarray:
        q = users.astype(np.int64) * self.num_items + items.astype(np.int64)
        idx = np.searchsorted(self.keys, q)
        idx = np.minimum(idx, len(self.keys) - 1)
        return self.keys[idx] == q


def popularity_cdf(dataset: Dataset, beta: float = 0.75) -> np.ndarray:
    """Inverse-CDF table for popularity-biased negative sampling: item i
    drawn with probability ∝ train_count(i)^beta (the word2vec exponent;
    beta=0 degrades to uniform since 0^0 == 1 under numpy). Items absent
    from the train split are never drawn for beta > 0 — the standard
    popularity-sampling semantics (they contribute no gradient signal a
    popularity sampler is after)."""
    counts = np.bincount(
        dataset.train.items, minlength=dataset.num_items
    ).astype(np.float64)
    w = np.power(counts, beta)
    total = w.sum()
    if total <= 0:  # empty train split: degenerate, fall back to uniform
        w = np.ones_like(w)
        total = w.sum()
    return np.cumsum(w / total)


def _draw_items(
    rng: np.random.Generator, n: int, num_items: int,
    cdf: np.ndarray | None,
) -> np.ndarray:
    if cdf is None:
        return rng.integers(0, num_items, size=n, dtype=np.int64)
    return np.minimum(
        np.searchsorted(cdf, rng.random(n), side="right"), num_items - 1
    ).astype(np.int64)


def _sample_negatives(
    rng: np.random.Generator,
    index: _TrainPairIndex,
    users: np.ndarray,
    num_items: int,
    max_rounds: int = 64,
    cdf: np.ndarray | None = None,
) -> np.ndarray:
    """Draw one negative per row, rejecting train positives (vectorized).
    ``cdf`` switches the proposal from uniform to popularity^beta."""
    negs = _draw_items(rng, len(users), num_items, cdf)
    bad = index.contains(users, negs)
    rounds = 0
    while bad.any() and rounds < max_rounds:
        negs[bad] = _draw_items(rng, int(bad.sum()), num_items, cdf)
        bad = index.contains(users, negs)
        rounds += 1
    # Pathological users interacting with the whole catalog keep the last
    # draw; with real catalogs this branch is never taken.
    return negs.astype(np.int32)


def build_history(
    dataset: Dataset, max_len: int, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Padded per-user train-interaction history: ([U, H] int32 item ids
    padded with the sentinel ``num_items``, [U] int32 true lengths,
    clipped to H). Users with more than H interactions keep a seeded
    uniform subsample (UIRT timestamps are not guaranteed present, so
    "most recent" is not well-defined for every source). History-based
    models (FISM, MultVAE) consume this via the history-carrying batch
    samplers — the matrix itself is O(U*H) host/device memory, which is
    the inherent cost of the model family, not of the framework."""
    rng = np.random.default_rng((seed, 0x415))
    u_sorted = np.argsort(dataset.train.users, kind="stable")
    users = dataset.train.users[u_sorted]
    items = dataset.train.items[u_sorted]
    nu = dataset.num_users
    if len(items) == 0:
        return (
            np.full((nu, max_len), dataset.num_items, np.int32),
            np.zeros(nu, np.int32),
        )
    starts = np.searchsorted(users, np.arange(nu))
    counts = np.searchsorted(users, np.arange(nu) + 1) - starts
    lens = np.minimum(counts, max_len).astype(np.int32)
    # Vectorized fill for the common <=H users: flat gather at
    # starts[u] + col for every valid (u, col) cell.
    cols = np.arange(max_len)[None, :]
    valid = cols < lens[:, None]
    flat_idx = np.minimum(starts[:, None] + cols, len(items) - 1)
    hist = np.where(valid, items[flat_idx], dataset.num_items).astype(np.int32)
    # Seeded uniform subsample for the rare >H users (python loop only
    # over those).
    for u in np.flatnonzero(counts > max_len):
        row = items[starts[u] : starts[u] + counts[u]]
        hist[u] = rng.choice(row, size=max_len, replace=False)
    return hist, lens


class UserHistorySampler:
    """{user, hist [B,H], hist_len} batches — one row per user with at
    least one train interaction, shuffled per epoch. The input protocol of
    autoencoder recommenders (MultVAE): the history IS both the input and
    the reconstruction target."""

    def __init__(self, dataset: Dataset, batch_size: int, max_len: int,
                 seed: int = 0):
        self.batch_size = batch_size
        self.seed = seed
        self.hist, self.lens = build_history(dataset, max_len, seed)
        self.active = np.flatnonzero(self.lens > 0).astype(np.int32)

    def num_batches(self) -> int:
        return len(self.active) // self.batch_size

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng((self.seed, epoch))
        users = self.active[rng.permutation(len(self.active))]
        for start in range(0, len(users) - self.batch_size + 1, self.batch_size):
            u = users[start : start + self.batch_size]
            yield {"user": u, "hist": self.hist[u], "hist_len": self.lens[u]}


class PairwiseSampler:
    """(user, pos_item, neg_item) batches for BPR-style pairwise losses.

    Fresh negatives and a fresh shuffle every epoch, seeded as
    fold(seed, epoch) for exact reproducibility.

    ``multi_neg=True`` emits {"user", "pos", "negs" [B, num_negatives]}
    batches (one positive against K negatives — sampled-softmax training);
    the default emits one (pos, neg) row per negative.

    ``with_history=H`` attaches each row's user train history ("hist"
    [B, H] sentinel-padded, "hist_len" [B]) for history-conditioned
    scorers (FISM).
    """

    def __init__(
        self,
        dataset: Dataset,
        batch_size: int,
        num_negatives: int = 1,
        seed: int = 0,
        multi_neg: bool = False,
        no_negatives: bool = False,
        with_history: int = 0,
        neg_cdf: "np.ndarray | None" = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_negatives = num_negatives
        self.seed = seed
        self.multi_neg = multi_neg
        self.no_negatives = no_negatives  # in-batch losses: (user, pos) only
        self.neg_cdf = neg_cdf  # popularity^beta proposal (None = uniform)
        self.index = _TrainPairIndex(dataset)
        self.hist = self.lens = None
        if with_history:
            self.hist, self.lens = build_history(dataset, with_history, seed)

    def _attach_history(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        if self.hist is not None:
            u = batch["user"]
            batch = {**batch, "hist": self.hist[u], "hist_len": self.lens[u]}
        return batch

    def num_batches(self) -> int:
        n = len(self.dataset.train)
        if not (self.multi_neg or self.no_negatives):
            n *= self.num_negatives
        return n // self.batch_size

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng((self.seed, epoch))
        train = self.dataset.train
        if self.no_negatives:
            perm = rng.permutation(len(train))
            users, pos = train.users[perm], train.items[perm]
            for start in range(0, len(users) - self.batch_size + 1, self.batch_size):
                sl = slice(start, start + self.batch_size)
                yield self._attach_history({"user": users[sl], "pos": pos[sl]})
            return
        if self.multi_neg:
            users, pos = train.users, train.items
            flat_users = np.repeat(users, self.num_negatives)
            negs = _sample_negatives(
                rng, self.index, flat_users, self.dataset.num_items,
                cdf=self.neg_cdf,
            ).reshape(-1, self.num_negatives)
            perm = rng.permutation(len(users))
            users, pos, negs = users[perm], pos[perm], negs[perm]
            for start in range(0, len(users) - self.batch_size + 1, self.batch_size):
                sl = slice(start, start + self.batch_size)
                yield self._attach_history(
                    {"user": users[sl], "pos": pos[sl], "negs": negs[sl]}
                )
            return
        users = np.repeat(train.users, self.num_negatives)
        pos = np.repeat(train.items, self.num_negatives)
        negs = _sample_negatives(
            rng, self.index, users, self.dataset.num_items, cdf=self.neg_cdf
        )
        perm = rng.permutation(len(users))
        users, pos, negs = users[perm], pos[perm], negs[perm]
        for start in range(0, len(users) - self.batch_size + 1, self.batch_size):
            sl = slice(start, start + self.batch_size)
            yield self._attach_history(
                {"user": users[sl], "pos": pos[sl], "neg": negs[sl]}
            )


class PointwiseSampler:
    """(user, item, label) batches: every positive plus ``num_negatives``
    sampled negatives per positive, labels {1, 0} — pointwise logloss
    training for implicit data (NeuMF-style, BASELINE.json:9)."""

    def __init__(
        self,
        dataset: Dataset,
        batch_size: int,
        num_negatives: int = 4,
        seed: int = 0,
        neg_cdf: "np.ndarray | None" = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_negatives = num_negatives
        self.seed = seed
        self.neg_cdf = neg_cdf
        self.index = _TrainPairIndex(dataset)

    def num_batches(self) -> int:
        n = len(self.dataset.train) * (1 + self.num_negatives)
        return n // self.batch_size

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng((self.seed, epoch))
        train = self.dataset.train
        n_pos = len(train)
        neg_users = np.repeat(train.users, self.num_negatives)
        neg_items = _sample_negatives(
            rng, self.index, neg_users, self.dataset.num_items,
            cdf=self.neg_cdf,
        )
        users = np.concatenate([train.users, neg_users])
        items = np.concatenate([train.items, neg_items])
        labels = np.concatenate(
            [
                np.ones(n_pos, np.float32),
                np.zeros(len(neg_users), np.float32),
            ]
        )
        perm = rng.permutation(len(users))
        users, items, labels = users[perm], items[perm], labels[perm]
        for start in range(0, len(users) - self.batch_size + 1, self.batch_size):
            sl = slice(start, start + self.batch_size)
            yield {"user": users[sl], "item": items[sl], "label": labels[sl]}


class CTRBatcher:
    """Shuffled fixed-shape batches over in-memory CTR arrays
    (dense [N,D], cat [N,F], label [N])."""

    def __init__(
        self,
        dense: np.ndarray,
        cat: np.ndarray,
        label: np.ndarray,
        batch_size: int,
        seed: int = 0,
    ):
        assert len(dense) == len(cat) == len(label)
        self.dense, self.cat, self.label = dense, cat, label
        self.batch_size = batch_size
        self.seed = seed

    def num_batches(self) -> int:
        return len(self.label) // self.batch_size

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng((self.seed, epoch))
        perm = rng.permutation(len(self.label))
        for start in range(0, len(perm) - self.batch_size + 1, self.batch_size):
            idx = perm[start : start + self.batch_size]
            yield {
                "dense": self.dense[idx],
                "cat": self.cat[idx],
                "label": self.label[idx],
            }


def build_sequences(
    dataset: Dataset, max_len: int, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Per-user TIME-ORDERED train sequences for sequential recommenders
    (SASRec family): ([U, L] int32 item ids, oldest -> newest, padded at
    the tail with the sentinel ``num_items``; [U] int32 true lengths).
    Users with more than L interactions keep the MOST RECENT L (the
    SASRec protocol). Ties in the timestamp (or absent timestamps, times
    == 0) break by a seeded jitter — the same convention as the
    leave-one-out splitter, so train sequences and held-out items stay
    consistent."""
    rng = np.random.default_rng((seed, 0x5E9))
    tr = dataset.train
    nu = dataset.num_users
    if len(tr.items) == 0:
        return (
            np.full((nu, max_len), dataset.num_items, np.int32),
            np.zeros(nu, np.int32),
        )
    jitter = rng.random(len(tr.items))
    order = np.lexsort((jitter, tr.times, tr.users))
    users = tr.users[order]
    items = tr.items[order]
    starts = np.searchsorted(users, np.arange(nu))
    ends = np.searchsorted(users, np.arange(nu) + 1)
    counts = ends - starts
    lens = np.minimum(counts, max_len).astype(np.int32)
    # Most recent L: window [end - len, end) of each user's ordered run.
    cols = np.arange(max_len)[None, :]
    valid = cols < lens[:, None]
    first = ends[:, None] - lens[:, None]
    flat_idx = np.minimum(np.maximum(first + cols, 0), len(items) - 1)
    seq = np.where(valid, items[flat_idx], dataset.num_items).astype(np.int32)
    return seq, lens


class SequenceSampler:
    """{user, seq [B,L], seq_len, seq_negs [B,L-1]} batches for next-item
    training (SASRec): time-ordered sequences over users with >= 2 train
    interactions, shuffled per epoch; one fresh uniform negative per
    predicted position per epoch (no positive exclusion — the standard
    large-catalog approximation, same policy as device negatives)."""

    def __init__(self, dataset: Dataset, batch_size: int, max_len: int,
                 seed: int = 0, order_seed: int | None = None):
        # ``seed`` drives per-epoch shuffling/negatives (per-process in
        # multi-controller runs); ``order_seed`` drives the tie-breaking
        # of the TIME ORDERING and must be the GLOBAL seed so every
        # process — and the trainer's eval-side attach_history — agrees
        # on each user's sequence when timestamps tie or are absent.
        self.batch_size = batch_size
        self.seed = seed
        self.num_items = dataset.num_items
        self.seq, self.lens = build_sequences(
            dataset, max_len, seed if order_seed is None else order_seed
        )
        self.active = np.flatnonzero(self.lens >= 2).astype(np.int32)

    def num_batches(self) -> int:
        return len(self.active) // self.batch_size

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng((self.seed, epoch, 0x5E9))
        users = self.active[rng.permutation(len(self.active))]
        l = self.seq.shape[1]
        for start in range(0, len(users) - self.batch_size + 1, self.batch_size):
            u = users[start : start + self.batch_size]
            negs = rng.integers(
                0, self.num_items, (len(u), l - 1)
            ).astype(np.int32)
            yield {
                "user": u,
                "seq": self.seq[u],
                "seq_len": self.lens[u],
                "seq_negs": negs,
            }


class SBPRSampler:
    """{user, pos, soc, neg, suk, has_social} batches for social BPR
    (SBPR): for each train (u, pos), one SOCIAL item — consumed by at
    least one of u's friends but not by u — with its friend-count
    coefficient ``suk``, and one negative outside both the user's train
    set and the social set. Users with no social candidates fall back to
    plain BPR triples (has_social = 0; soc/suk are dummies the loss
    masks). Fully vectorized: candidate sets are padded [U, S] arrays
    built once from social_csr @ train_csr; membership tests reuse the
    sorted-key design of ``_TrainPairIndex``."""

    def __init__(self, dataset: Dataset, batch_size: int, seed: int = 0,
                 max_social: int = 512):
        if dataset.social is None:
            raise ValueError(
                "SBPR needs a social graph: set data.social_degree > 0 "
                "(synthetic taste-overlap friends) or data.social_path"
            )
        self.batch_size = batch_size
        self.seed = seed
        self.users = dataset.train.users
        self.items = dataset.train.items
        self.num_items = dataset.num_items
        self.index = _TrainPairIndex(dataset)
        rng = np.random.default_rng((seed, 0x5B92))

        own = (dataset.train_csr > 0).astype(np.float32)
        cnt = (dataset.social.astype(np.float32) @ own).tocsr()  # friend counts
        cnt = (cnt - cnt.multiply(own > 0)).tocsr()  # drop own train items
        cnt.eliminate_zeros()

        # Negative exclusion covers the FULL candidate sets (built from
        # ``cnt`` before any subsampling): a truncated index would let
        # negatives collide with social feedback for users with more
        # than ``max_social`` candidates.
        coo = cnt.tocoo()
        self._soc_keys = np.sort(
            coo.row.astype(np.int64) * self.num_items + coo.col
        )

        nu, s = dataset.num_users, max_social
        starts, counts = cnt.indptr[:-1], np.diff(cnt.indptr)
        self.sp_lens = np.minimum(counts, s).astype(np.int32)
        cols = np.arange(s)[None, :]
        valid = cols < self.sp_lens[:, None]
        flat = np.minimum(starts[:, None] + cols, max(cnt.nnz - 1, 0))
        if cnt.nnz == 0:
            self.sp_items = np.full((nu, s), self.num_items, np.int32)
            self.sp_counts = np.zeros((nu, s), np.float32)
        else:
            self.sp_items = np.where(
                valid, cnt.indices[flat], self.num_items
            ).astype(np.int32)
            self.sp_counts = np.where(valid, cnt.data[flat], 0.0).astype(
                np.float32
            )
        # Seeded subsample for users with more than S candidates.
        for u in np.flatnonzero(counts > s):
            pick = rng.choice(counts[u], size=s, replace=False)
            self.sp_items[u] = cnt.indices[starts[u] + pick]
            self.sp_counts[u] = cnt.data[starts[u] + pick]

    def _in_social(self, users: np.ndarray, items: np.ndarray) -> np.ndarray:
        if len(self._soc_keys) == 0:
            return np.zeros(len(users), bool)
        q = users.astype(np.int64) * self.num_items + items.astype(np.int64)
        idx = np.minimum(np.searchsorted(self._soc_keys, q),
                         len(self._soc_keys) - 1)
        return self._soc_keys[idx] == q

    def num_batches(self) -> int:
        return len(self.users) // self.batch_size

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng((self.seed, epoch, 0x5B92))
        order = rng.permutation(len(self.users))
        bs = self.batch_size
        for start in range(0, len(order) - bs + 1, bs):
            idx = order[start : start + bs]
            u = self.users[idx]
            pos = self.items[idx]
            lens = self.sp_lens[u]
            has = lens > 0
            j = rng.integers(0, np.maximum(lens, 1))
            soc = np.where(has, self.sp_items[u, j], 0).astype(np.int32)
            suk = np.where(has, self.sp_counts[u, j], 0.0).astype(np.float32)
            negs = rng.integers(0, self.num_items, size=bs, dtype=np.int64)
            bad = self.index.contains(u, negs) | self._in_social(u, negs)
            for _ in range(64):
                if not bad.any():
                    break
                negs[bad] = rng.integers(
                    0, self.num_items, size=int(bad.sum()), dtype=np.int64
                )
                bad = self.index.contains(u, negs) | self._in_social(u, negs)
            yield {
                "user": u.astype(np.int32),
                "pos": pos.astype(np.int32),
                "soc": soc,
                "neg": negs.astype(np.int32),
                "suk": suk,
                "has_social": has.astype(np.float32),
            }
