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


def test_popularity_negative_sampling_distribution_and_exclusion():
    """popularity^beta proposal: sampled-negative frequencies must track
    train-count^beta (chi-square-loose ratio check over a skewed catalog),
    train positives stay excluded, and beta=0 recovers uniform over the
    full catalog."""
    from tfrec_tpu.data.samplers import popularity_cdf

    ds = _ds(seed=3)
    pairs = _train_pairs(ds)
    beta = 0.75
    cdf = popularity_cdf(ds, beta)
    s = PairwiseSampler(ds, batch_size=128, num_negatives=4, seed=7,
                        neg_cdf=cdf)
    negs = np.concatenate(
        [b["neg"] for e in range(30) for b in s.epoch(e)]
    )
    counts = np.bincount(ds.train.items, minlength=ds.num_items)
    freq = np.bincount(negs, minlength=ds.num_items).astype(np.float64)
    # Never-trained items are never proposed (beta > 0 semantics).
    assert freq[counts == 0].sum() == 0
    for u, n in zip(
        np.concatenate([b["user"] for b in s.epoch(0)]).tolist(),
        np.concatenate([b["neg"] for b in s.epoch(0)]).tolist(),
    ):
        assert (u, n) not in pairs
    # Per-item frequency under accept-reject: proposal c_i^beta thinned by
    # the acceptance probability (1 - c_i/U) — item i is rejected for
    # exactly the c_i users holding it as a train positive. Compare the
    # head/tail group-mean ratio of that full expectation; 20% rel err.
    order = np.argsort(-counts)
    head, tail = order[:10], order[-40:-10]
    tail = tail[counts[tail] > 0]
    w = counts**beta * (1.0 - counts / ds.num_users)
    expect = w[head].mean() / w[tail].mean()
    got = freq[head].mean() / max(freq[tail].mean(), 1e-9)
    assert abs(got - expect) / expect < 0.20, (got, expect)

    # beta=0: uniform over the whole catalog (numpy 0^0 == 1).
    cdf0 = popularity_cdf(ds, 0.0)
    np.testing.assert_allclose(np.diff(cdf0), 1.0 / ds.num_items, rtol=1e-9)


def test_popularity_knob_plumbs_and_refuses_wrong_paths():
    import pytest

    from tfrec_tpu.configs import Config, MeshConfig, ModelConfig, OptimConfig, TrainConfig
    from tfrec_tpu.train.trainer import Trainer

    base = dict(
        data=DataConfig(source="synthetic_implicit", num_users=64,
                        num_items=128, interactions_per_user=8, seed=0),
        optim=OptimConfig(learning_rate=0.05),
        mesh=MeshConfig(data_axis_size=0),
    )
    t = Trainer(Config(
        model=ModelConfig(name="mf", embed_dim=8),
        train=TrainConfig(batch_size=64, epochs=1, eval_every_epochs=0,
                          neg_sampling="popularity", loss="bpr"),
        **base,
    ), quiet=True)
    assert t.sampler.neg_cdf is not None

    with pytest.raises(ValueError, match="device_negatives"):
        Trainer(Config(
            model=ModelConfig(name="mf", embed_dim=8),
            train=TrainConfig(batch_size=64, epochs=1, eval_every_epochs=0,
                              neg_sampling="popularity", loss="bpr",
                              device_negatives=True),
            **base,
        ), quiet=True)
    with pytest.raises(ValueError, match="neg_sampling"):
        Trainer(Config(
            model=ModelConfig(name="multvae", vae_hidden=16, vae_latent=4,
                              max_history=8),
            train=TrainConfig(batch_size=32, epochs=1, eval_every_epochs=0,
                              neg_sampling="popularity", loss="multvae"),
            **base,
        ), quiet=True)
    with pytest.raises(ValueError, match="unknown train.neg_sampling"):
        Trainer(Config(
            model=ModelConfig(name="mf", embed_dim=8),
            train=TrainConfig(batch_size=64, epochs=1, eval_every_epochs=0,
                              neg_sampling="nope", loss="bpr"),
            **base,
        ), quiet=True)
