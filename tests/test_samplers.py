"""Sampler tests: negative exclusion, determinism, shapes, coverage."""

import numpy as np

from tfrec_tpu.configs import DataConfig
from tfrec_tpu.data.dataset import build_dataset
from tfrec_tpu.data.samplers import CTRBatcher, PairwiseSampler, PointwiseSampler


def _ds(seed=0):
    return build_dataset(
        DataConfig(
            source="synthetic_implicit",
            num_users=64,
            num_items=128,
            interactions_per_user=16,
            splitter="ratio",
            test_fraction=0.25,
            seed=seed,
        )
    )


def _train_pairs(ds):
    return set(zip(ds.train.users.tolist(), ds.train.items.tolist()))


def test_pairwise_negatives_excluded_and_deterministic():
    ds = _ds()
    pairs = _train_pairs(ds)
    s = PairwiseSampler(ds, batch_size=128, num_negatives=1, seed=7)
    batches = list(s.epoch(0))
    assert len(batches) == s.num_batches()
    for b in batches:
        assert b["user"].shape == (128,)
        for u, n in zip(b["user"].tolist(), b["neg"].tolist()):
            assert (u, n) not in pairs
    # Same epoch twice → identical batches.
    batches2 = list(s.epoch(0))
    np.testing.assert_array_equal(batches[0]["neg"], batches2[0]["neg"])
    # Different epoch → fresh negatives (TFRec-family per-epoch resampling).
    batches3 = list(s.epoch(1))
    assert not np.array_equal(batches[0]["neg"], batches3[0]["neg"])


def test_pairwise_covers_all_positives():
    ds = _ds()
    s = PairwiseSampler(ds, batch_size=64, num_negatives=2, seed=0)
    seen = set()
    for b in s.epoch(0):
        seen.update(zip(b["user"].tolist(), b["pos"].tolist()))
    pairs = _train_pairs(ds)
    # Only the dropped remainder may be missing.
    assert len(pairs - seen) <= 64


def test_pointwise_label_ratio_and_exclusion():
    ds = _ds()
    pairs = _train_pairs(ds)
    s = PointwiseSampler(ds, batch_size=256, num_negatives=3, seed=1)
    total_pos = total = 0
    for b in s.epoch(0):
        total += len(b["label"])
        total_pos += int(b["label"].sum())
        negs = b["label"] == 0
        for u, i in zip(b["user"][negs].tolist(), b["item"][negs].tolist()):
            assert (u, i) not in pairs
    assert abs(total_pos / total - 0.25) < 0.05


def test_ctr_batcher():
    rng = np.random.default_rng(0)
    dense = rng.normal(size=(1000, 4)).astype(np.float32)
    cat = rng.integers(0, 10, (1000, 3)).astype(np.int32)
    label = rng.integers(0, 2, 1000).astype(np.float32)
    b = CTRBatcher(dense, cat, label, batch_size=128, seed=0)
    batches = list(b.epoch(0))
    assert len(batches) == 7 == b.num_batches()
    assert batches[0]["dense"].shape == (128, 4)
    # Shuffle differs across epochs, deterministic within.
    b2 = list(b.epoch(0))
    np.testing.assert_array_equal(batches[0]["cat"], b2[0]["cat"])
    b3 = list(b.epoch(1))
    assert not np.array_equal(batches[0]["cat"], b3[0]["cat"])
