"""Criteo click-log TSV loader (label \t 13 int \t 26 hex-categorical).

Matches the Criteo-1TB / Kaggle-DAC line format for BASELINE.json configs
4-5. Categorical values are hashed into per-field vocabularies (the standard
DLRM treatment); dense ints get log1p compression. Streams in chunks so a
1TB-scale file never has to fit in memory.
"""

from __future__ import annotations

from typing import Iterator, Sequence, Tuple

import numpy as np

NUM_DENSE = 13
NUM_CATEGORICAL = 26


def best_batch_iter(
    path: str,
    batch_size: int,
    vocab_sizes: Sequence[int] | int = 100_000,
    max_examples: int | None = None,
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Native (threaded C++) parser when a toolchain is available,
    bit-identical Python fallback otherwise — the parsers share the FNV-1a
    field hashing and log1p dense transform (pinned by tests)."""
    try:
        from tfrec_tpu.data.criteo_native import (
            NativeUnavailable, iter_criteo_batches_native, load,
        )

        load()
        return iter_criteo_batches_native(
            path, batch_size, vocab_sizes, max_examples
        )
    except Exception:
        return iter_criteo_batches(path, batch_size, vocab_sizes, max_examples)


def _hash_token(token: str, vocab: int, field: int) -> int:
    # FNV-1a over (field, token) so identical tokens in different fields
    # don't collide systematically.
    h = np.uint64(14695981039346656037)
    for b in f"{field}:{token}".encode():
        h = np.uint64((int(h) ^ b) * 1099511628211 % (1 << 64))
    return int(h % np.uint64(vocab))


def iter_criteo_batches(
    path: str,
    batch_size: int,
    vocab_sizes: Sequence[int] | int = 100_000,
    max_examples: int | None = None,
    drop_remainder: bool = True,
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Yield (dense [B,13] f32, cat [B,26] i32, label [B] f32) batches.

    The final partial batch is dropped by default (static shapes for jit);
    drop_remainder=False yields it trimmed (materialization paths)."""
    if isinstance(vocab_sizes, int):
        vocab_sizes = [vocab_sizes] * NUM_CATEGORICAL
    assert len(vocab_sizes) == NUM_CATEGORICAL

    dense = np.zeros((batch_size, NUM_DENSE), dtype=np.float32)
    cat = np.zeros((batch_size, NUM_CATEGORICAL), dtype=np.int32)
    label = np.zeros(batch_size, dtype=np.float32)
    fill = 0
    seen = 0
    with open(path, "r") as f:
        for line in f:
            if max_examples is not None and seen >= max_examples:
                break
            parts = line.rstrip("\n").split("\t")
            if len(parts) != 1 + NUM_DENSE + NUM_CATEGORICAL:
                continue
            seen += 1
            label[fill] = float(parts[0])
            for d in range(NUM_DENSE):
                v = parts[1 + d]
                x = float(v) if v else 0.0
                dense[fill, d] = np.log1p(max(x, 0.0))
            for c in range(NUM_CATEGORICAL):
                tok = parts[1 + NUM_DENSE + c]
                cat[fill, c] = _hash_token(tok, vocab_sizes[c], c) if tok else 0
            fill += 1
            if fill == batch_size:
                yield dense.copy(), cat.copy(), label.copy()
                fill = 0
    if fill and not drop_remainder:
        yield dense[:fill].copy(), cat[:fill].copy(), label[:fill].copy()


class CriteoStreamBatcher:
    """Streaming epoch iterator over a Criteo TSV for files too large to
    materialize (BASELINE.json config 4's 1TB subset). The first
    ``eval_examples`` lines form the held-out eval slice (materialized
    once); training streams the remainder in file order each epoch.

    Matches the CTRBatcher epoch(i) protocol the Trainer consumes. Batches
    arrive in file order (no global shuffle — Criteo logs are already
    time-shuffled at day granularity, the standard streaming treatment).

    Multi-process (SURVEY.md §3b "per-process file shard"): with
    ``num_shards=N, shard_index=p``, ``batch_size`` is the PER-PROCESS batch
    size and the post-eval train stream is striped round-robin: batch i
    belongs to process i mod N, and only COMPLETE stripes of N batches are
    consumed, so every process yields exactly floor(total/N) batches —
    collective-safe (all processes take the same number of steps) and
    example-disjoint across processes.
    """

    def __init__(
        self,
        path: str,
        batch_size: int,
        vocab_sizes: Sequence[int] | int = 100_000,
        eval_examples: int = 100_000,
        max_examples: int | None = None,
        num_shards: int = 1,
        shard_index: int = 0,
    ):
        assert 0 <= shard_index < num_shards, (shard_index, num_shards)
        self.path = path
        self.batch_size = batch_size
        self.vocab_sizes = vocab_sizes
        self.eval_examples = eval_examples
        self.max_examples = max_examples
        self.num_shards = num_shards
        self.shard_index = shard_index
        self._eval = None

    def eval_arrays(self):
        if self._eval is None:
            self._eval = load_criteo(
                self.path, self.vocab_sizes, max_examples=self.eval_examples
            )
        return self._eval

    def num_batches(self) -> int:
        """TOTAL per-process-sized batches in the train region (across all
        shards) — the Trainer divides by process count for its step cap."""
        if self.max_examples is None:
            return -1  # unknown without a full pass
        return (self.max_examples - self.eval_examples) // self.batch_size

    def epoch(self, epoch: int):
        if self.num_shards == 1:
            yield from self._epoch_all(epoch)
            return
        # Round-robin stripe ownership over complete stripes only.
        mine = None
        pos = 0
        for batch in self._epoch_all(epoch):
            if pos == self.shard_index:
                mine = batch
            pos += 1
            if pos == self.num_shards:
                yield mine
                mine, pos = None, 0

    def _epoch_all(self, epoch: int):
        skipped = 0
        pend = None  # partial batch carried across the eval/train boundary
        for dense, cat, label in best_batch_iter(
            self.path, self.batch_size, self.vocab_sizes, self.max_examples
        ):
            if skipped < self.eval_examples:
                take = min(self.eval_examples - skipped, len(label))
                skipped += take
                if take == len(label):
                    continue
                # Examples straddling the boundary belong to training.
                pend = (dense[take:], cat[take:], label[take:])
                continue
            if pend is not None:
                d = np.concatenate([pend[0], dense])
                ca = np.concatenate([pend[1], cat])
                la = np.concatenate([pend[2], label])
                yield {
                    "dense": d[: self.batch_size],
                    "cat": ca[: self.batch_size],
                    "label": la[: self.batch_size],
                }
                pend = (d[self.batch_size:], ca[self.batch_size:],
                        la[self.batch_size:])
                if len(pend[2]) == 0:
                    pend = None
                continue
            yield {"dense": dense, "cat": cat, "label": label}


def load_criteo(
    path: str,
    vocab_sizes: Sequence[int] | int = 100_000,
    max_examples: int | None = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Materialize a bounded Criteo subset in memory (for eval splits)."""
    chunks = list(
        iter_criteo_batches(path, 8192, vocab_sizes, max_examples,
                            drop_remainder=False)
    )
    if not chunks:
        raise ValueError(f"no complete batches read from {path}")
    dense = np.concatenate([c[0] for c in chunks])
    cat = np.concatenate([c[1] for c in chunks])
    label = np.concatenate([c[2] for c in chunks])
    return dense, cat, label
