"""Dataset loading, splitting, and padding tests."""

import numpy as np
import pytest

from tfrec_tpu.configs import DataConfig
from tfrec_tpu.data.dataset import (
    Interactions,
    build_dataset,
    densify_ids,
    split_leave_one_out,
    split_ratio,
)
from tfrec_tpu.data.movielens import load_uirt
from tfrec_tpu.data.synthetic import synthetic_ctr, synthetic_implicit


def _toy_interactions():
    users = np.array([0, 0, 0, 1, 1, 2, 2, 2, 2], np.int32)
    items = np.array([0, 1, 2, 1, 3, 0, 1, 2, 3], np.int32)
    return Interactions(
        users=users,
        items=items,
        ratings=np.ones(9, np.float32),
        times=np.arange(9, dtype=np.float64),
        num_users=3,
        num_items=4,
    )


def test_densify_ids():
    u, i, nu, ni = densify_ids(
        np.array([10, 10, 99, 5]), np.array([7, 3, 7, 100])
    )
    assert nu == 3 and ni == 3
    assert u.tolist() == [1, 1, 2, 0]
    assert i.tolist() == [1, 0, 1, 2]


def test_split_ratio_keeps_train_item_per_user():
    ds = split_ratio(_toy_interactions(), test_fraction=0.5, seed=0)
    train_counts = np.bincount(ds.train.users, minlength=3)
    assert (train_counts >= 1).all()
    assert len(ds.train) + len(ds.test) == 9
    # No overlap between train and test pairs.
    train_pairs = set(zip(ds.train.users.tolist(), ds.train.items.tolist()))
    test_pairs = set(zip(ds.test.users.tolist(), ds.test.items.tolist()))
    assert not train_pairs & test_pairs


def test_split_leave_one_out_holds_most_recent():
    ds = split_leave_one_out(_toy_interactions(), seed=0)
    # Each user with >1 interaction contributes exactly one test item: the
    # one with the max timestamp.
    assert len(ds.test) == 3
    assert sorted(ds.test.users.tolist()) == [0, 1, 2]
    assert ds.test.items[ds.test.users.tolist().index(0)] == 2  # t=2 is max for u0
    assert ds.test.items[ds.test.users.tolist().index(1)] == 3
    assert ds.test.items[ds.test.users.tolist().index(2)] == 3


def test_padded_train_items_and_csr():
    ds = split_leave_one_out(_toy_interactions(), seed=0)
    padded, lengths = ds.train_items_padded()
    assert padded.shape[0] == 3
    assert lengths.tolist() == [2, 1, 3]
    # Sentinel padding is num_items.
    assert (padded[1, 1:] == 4).all()
    assert ds.train_csr.shape == (3, 4)
    assert ds.train_csr.nnz == 6


def test_synthetic_implicit_structure():
    inter = synthetic_implicit(
        num_users=20, num_items=50, interactions_per_user=5, seed=1
    )
    assert len(inter) == 100
    assert inter.users.max() == 19
    assert inter.items.max() < 50
    # No duplicate items per user.
    for u in range(20):
        items_u = inter.items[inter.users == u]
        assert len(set(items_u.tolist())) == 5
    # Determinism.
    inter2 = synthetic_implicit(
        num_users=20, num_items=50, interactions_per_user=5, seed=1
    )
    np.testing.assert_array_equal(inter.items, inter2.items)


def test_synthetic_ctr_shapes_and_signal():
    dense, cat, label = synthetic_ctr(2000, num_dense=5, vocab_sizes=(50, 50), seed=0)
    assert dense.shape == (2000, 5)
    assert cat.shape == (2000, 2)
    assert cat.max() < 50
    assert 0.2 < label.mean() < 0.8  # roughly balanced


def test_load_uirt_formats(tmp_path):
    p_tab = tmp_path / "u.data"
    p_tab.write_text("1\t10\t5\t100\n2\t20\t3\t200\n1\t20\t4\t50\n")
    inter = load_uirt(str(p_tab))
    assert inter.num_users == 2 and inter.num_items == 2
    assert inter.ratings.tolist() == [5.0, 3.0, 4.0]

    p_dcolon = tmp_path / "ratings.dat"
    p_dcolon.write_text("1::10::5::100\n2::20::3::200\n")
    inter = load_uirt(str(p_dcolon))
    assert inter.num_users == 2
    assert inter.times.tolist() == [100.0, 200.0]

    p_csv = tmp_path / "r.csv"
    p_csv.write_text("userId,movieId,rating,timestamp\n1,10,5,100\n2,20,3,200\n")
    inter = load_uirt(str(p_csv))
    assert inter.num_users == 2


def test_build_dataset_synthetic():
    ds = build_dataset(
        DataConfig(
            source="synthetic_implicit",
            num_users=16,
            num_items=32,
            interactions_per_user=8,
            splitter="leave_one_out",
            seed=3,
        )
    )
    assert ds.num_users == 16
    assert len(ds.test) == 16


def test_build_dataset_unknown_source():
    with pytest.raises(ValueError):
        build_dataset(DataConfig(source="nope"))
