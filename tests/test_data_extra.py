"""Given-split datasets and Criteo streaming."""

import numpy as np

from tfrec_tpu.configs import (
    Config, DataConfig, MeshConfig, ModelConfig, OptimConfig, TrainConfig,
)
from tfrec_tpu.data.criteo import CriteoStreamBatcher
from tfrec_tpu.data.dataset import build_dataset
from tfrec_tpu.train.trainer import run


def _write_uirt(path, rows):
    with open(path, "w") as f:
        for u, i, r, t in rows:
            f.write(f"{u}\t{i}\t{r}\t{t}\n")


def test_given_splitter(tmp_path):
    train = [(10, 100, 5, 1), (10, 101, 4, 2), (20, 100, 3, 3), (30, 102, 5, 4)]
    test = [(10, 103, 5, 9), (20, 101, 4, 9)]
    _write_uirt(tmp_path / "train.tsv", train)
    _write_uirt(tmp_path / "test.tsv", test)
    ds = build_dataset(DataConfig(
        source="movielens", path=str(tmp_path / "train.tsv"),
        splitter="given", test_path=str(tmp_path / "test.tsv"),
    ))
    assert ds.num_users == 3 and ds.num_items == 4
    assert len(ds.train) == 4 and len(ds.test) == 2
    # shared id space: user 10 in train and test densify to the same id
    u10_train = ds.train.users[0]
    u10_test = ds.test.users[0]
    assert u10_train == u10_test


def _write_criteo(path, n, seed=0):
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for _ in range(n):
            label = rng.integers(0, 2)
            dense = "\t".join(str(rng.integers(0, 50)) for _ in range(13))
            cats = "\t".join(format(rng.integers(0, 1 << 32), "x") for _ in range(26))
            f.write(f"{label}\t{dense}\t{cats}\n")


def test_criteo_stream_batcher_split(tmp_path):
    path = str(tmp_path / "criteo.tsv")
    _write_criteo(path, 600)
    s = CriteoStreamBatcher(path, batch_size=100, vocab_sizes=1000, eval_examples=200)
    dense, cat, label = s.eval_arrays()
    assert len(label) == 200
    batches = list(s.epoch(0))
    # 600 total - 200 eval = 400 train = 4 batches of 100
    assert len(batches) == 4
    assert batches[0]["cat"].shape == (100, 26)


def test_streaming_criteo_trainer(tmp_path):
    path = str(tmp_path / "criteo.tsv")
    _write_criteo(path, 1200)
    cfg = Config(
        data=DataConfig(
            source="criteo", path=path, streaming=True, eval_examples=200,
            categorical_vocab_sizes=(500,),
        ),
        model=ModelConfig(name="dcn", embed_dim=4, num_cross_layers=2, mlp_dims=(8,)),
        optim=OptimConfig(learning_rate=0.01),
        train=TrainConfig(batch_size=100, epochs=1, eval_every_epochs=1,
                          loss="logloss"),
        mesh=MeshConfig(data_axis_size=0),
    )
    _, hist = run(cfg, quiet=True)
    assert "auc" in hist[-1]
    assert np.isfinite(hist[-1]["loss"])

def test_criteo_stream_sharding_disjoint_and_equal(tmp_path):
    """Round-robin striping: shards yield equal counts of disjoint batches
    that interleave back into the unsharded stream (minus incomplete
    stripes)."""
    path = str(tmp_path / "criteo.tsv")
    _write_criteo(path, 1000)  # 200 eval + 800 train = 16 batches of 50
    full = list(
        CriteoStreamBatcher(path, 50, vocab_sizes=1000, eval_examples=200)
        .epoch(0)
    )
    assert len(full) == 16
    shards = [
        list(
            CriteoStreamBatcher(
                path, 50, vocab_sizes=1000, eval_examples=200,
                num_shards=3, shard_index=p,
            ).epoch(0)
        )
        for p in range(3)
    ]
    # 16 batches -> 5 complete stripes of 3; the trailing one is dropped
    # on EVERY shard (equal step counts are collective-safe).
    assert [len(s) for s in shards] == [5, 5, 5]
    for stripe in range(5):
        for p in range(3):
            np.testing.assert_array_equal(
                shards[p][stripe]["cat"], full[stripe * 3 + p]["cat"]
            )
            np.testing.assert_array_equal(
                shards[p][stripe]["label"], full[stripe * 3 + p]["label"]
            )
