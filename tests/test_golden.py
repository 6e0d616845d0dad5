"""Golden fixtures (SURVEY.md §4): the CI-gate dataset split is pinned by
hash and the metric bands are pinned by range, so silent changes to
samplers/splitters/generators are caught without the reference."""

import hashlib

import numpy as np

from tfrec_tpu.configs import DataConfig
from tfrec_tpu.data.dataset import build_dataset


def _digest(*arrays) -> str:
    h = hashlib.sha256()
    for a in arrays:
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()[:16]


def test_ci_gate_split_is_pinned():
    """The exact split used by the MF+BPR CI gate (test_train.py). If a
    deliberate change to generators/splitters moves this hash, update it
    together with the metric bands."""
    ds = build_dataset(DataConfig(
        source="synthetic_implicit", num_users=128, num_items=256,
        interactions_per_user=16, seed=0,
    ))
    assert ds.num_users == 128 and ds.num_items == 256
    assert len(ds.train) + len(ds.test) == 128 * 16
    got = _digest(ds.train.users, ds.train.items, ds.test.users, ds.test.items)
    assert got == "8558a9499b349d15", got


def test_leave_one_out_split_is_pinned():
    ds = build_dataset(DataConfig(
        source="synthetic_implicit", num_users=64, num_items=256,
        interactions_per_user=12, splitter="leave_one_out", seed=0,
    ))
    # exactly one held-out interaction per (multi-interaction) user
    counts = np.bincount(ds.test.users, minlength=64)
    assert counts.max() == 1
    got = _digest(ds.test.users, ds.test.items)
    assert got == "53105c718fd03985", got