"""Sparse-optimizer correctness vs dense oracles (SURVEY.md §4 unit row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfrec_tpu.ops.embedding import combine_duplicate_ids
from tfrec_tpu.ops.sparse_optim import make_sparse_optimizer

V, D = 13, 4


def _rand(seed, shape):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape).astype(np.float32))


def test_combine_duplicate_ids_matches_numpy():
    ids = jnp.array([3, 1, 3, 7, 1, 1], dtype=jnp.int32)
    grads = _rand(0, (6, D))
    uids, combined = jax.jit(
        lambda i, g: combine_duplicate_ids(i, g, sentinel=V)
    )(ids, grads)
    uids, combined = np.asarray(uids), np.asarray(combined)
    got = {}
    for u, row in zip(uids, combined):
        if u < V:
            got[int(u)] = row
    want = {}
    for u, row in zip(np.asarray(ids), np.asarray(grads)):
        want.setdefault(int(u), np.zeros(D, np.float32))
        want[int(u)] += row
    assert set(got) == set(want)
    for u in want:
        np.testing.assert_allclose(got[u], want[u], rtol=1e-5)
    # exactly the non-unique slots carry the sentinel
    assert int((uids == V).sum()) == 6 - len(want)


def test_rowwise_adagrad_matches_dense_rule():
    """Updating every row once == the dense rowwise-adagrad update."""
    opt = make_sparse_optimizer("rowwise_adagrad", adagrad_init=0.1)
    table = _rand(1, (V, D))
    state = opt.init(table)
    ids = jnp.arange(V, dtype=jnp.int32)
    grads = _rand(2, (V, D))
    new_table, new_state = jax.jit(opt.apply)(table, state, ids, grads, 0.5)
    acc = 0.1 + np.mean(np.asarray(grads) ** 2, axis=1)
    want = np.asarray(table) - 0.5 * np.asarray(grads) / (np.sqrt(acc) + 1e-8)[:, None]
    np.testing.assert_allclose(np.asarray(new_table), want, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["acc"]), acc, rtol=1e-5)


def test_duplicate_ids_combine_before_update():
    """Two occurrences of a row in one batch apply ONE combined update."""
    opt = make_sparse_optimizer("rowwise_adagrad")
    table = _rand(3, (V, D))
    state = opt.init(table)
    g = _rand(4, (2, D))
    ids = jnp.array([5, 5], dtype=jnp.int32)
    new_table, new_state = opt.apply(table, state, ids, g, 0.1)
    gsum = np.asarray(g).sum(0)
    acc = np.mean(gsum**2)
    want_row = np.asarray(table)[5] - 0.1 * gsum / (np.sqrt(acc) + 1e-8)
    np.testing.assert_allclose(np.asarray(new_table)[5], want_row, rtol=1e-5)
    # untouched rows unchanged
    mask = np.ones(V, bool); mask[5] = False
    np.testing.assert_array_equal(np.asarray(new_table)[mask], np.asarray(table)[mask])


def test_rowwise_adam_bias_correction_per_row():
    opt = make_sparse_optimizer("rowwise_adam", adam_b1=0.9, adam_b2=0.99)
    table = jnp.zeros((V, D))
    state = opt.init(table)
    g = _rand(5, (1, D))
    ids = jnp.array([2], dtype=jnp.int32)
    t1, s1 = opt.apply(table, state, ids, g, 0.01)
    # After one step: m_hat = g, v_hat = mean(g^2) -> update = -lr*g/(sqrt(v)+eps)
    gn = np.asarray(g)[0]
    v = np.mean(gn**2)
    want = -0.01 * gn / (np.sqrt(v) + 1e-8)
    np.testing.assert_allclose(np.asarray(t1)[2], want, rtol=1e-4)
    assert int(s1["t"][2]) == 1 and int(s1["t"][3]) == 0
    # Second step on a *different* row gets its own t=1 bias correction.
    t2, s2 = opt.apply(t1, s1, jnp.array([4], jnp.int32), g, 0.01)
    np.testing.assert_allclose(np.asarray(t2)[4], want, rtol=1e-4)


@pytest.mark.parametrize("name", ["sgd", "rowwise_adagrad", "rowwise_adam"])
def test_sentinel_rows_never_touched(name):
    """Ids >= vocab (padding) must not perturb the table."""
    opt = make_sparse_optimizer(name)
    table = _rand(6, (V, D))
    state = opt.init(table)
    ids = jnp.array([1, 2], dtype=jnp.int32)
    grads = jnp.zeros((2, D))
    new_table, _ = opt.apply(table, state, ids, grads, 0.1)
    np.testing.assert_allclose(np.asarray(new_table), np.asarray(table), atol=1e-6)


def test_grouped_combine_bit_identical_to_per_table():
    # The batched cross-table dedup (ONE sort/segment-sum for F tables)
    # must reproduce the per-table path exactly — it is the default
    # train-step path (train/step.py sparse_update_all).
    from tfrec_tpu.ops.embedding import combine_duplicate_ids_grouped

    rng = np.random.default_rng(7)
    f, n, d = 5, 64, 6
    vocabs = [100, 50, 100, 77, 100]
    ids = jnp.asarray(
        np.stack([rng.integers(0, v, n) for v in vocabs]).astype(np.int32)
    )
    grads = jnp.asarray(rng.normal(size=(f, n, d)).astype(np.float32))
    gu, gc = jax.jit(
        lambda i, g: combine_duplicate_ids_grouped(i, g, vocabs)
    )(ids, grads)
    for i in range(f):
        u, c = combine_duplicate_ids(ids[i], grads[i], sentinel=vocabs[i])
        np.testing.assert_array_equal(np.asarray(u), np.asarray(gu[i]))
        np.testing.assert_array_equal(np.asarray(c), np.asarray(gc[i]))


@pytest.mark.parametrize("name", ["sgd", "rowwise_adagrad", "rowwise_adam"])
def test_apply_deduped_half_matches_apply(name):
    opt = make_sparse_optimizer(name, adagrad_init=0.1)
    table = _rand(1, (V, D))
    state = opt.init(table)
    ids = jnp.array([3, 1, 3, 7, 1, 1], dtype=jnp.int32)
    grads = _rand(2, (6, D))
    ref_t, ref_s = opt.apply(table, state, ids, grads, 0.1)
    uids, g = combine_duplicate_ids(ids, grads, sentinel=V)
    got_t, got_s = opt.apply_deduped(table, state, uids, g, 0.1)
    np.testing.assert_array_equal(np.asarray(ref_t), np.asarray(got_t))
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_s), jax.tree_util.tree_leaves(got_s)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grouped_step_bit_identical_to_per_table_step():
    # All dedup strategies (per-table, grouped batched-argsort, flat
    # keyed sort) on a multi-table CTR model: identical state after
    # several steps.
    from tfrec_tpu.configs import ModelConfig, OptimConfig
    from tfrec_tpu.models import DataSpec, build_model
    from tfrec_tpu.train.step import TrainStepBuilder

    rng = np.random.default_rng(3)
    vocabs = (50, 60, 70, 50)
    model = build_model(
        ModelConfig(name="dcn", embed_dim=8, num_cross_layers=2, mlp_dims=(16, 8)),
        DataSpec.ctr(vocabs, 3),
        backend="xla",
    )
    batch = {
        "dense": jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32)),
        "cat": jnp.asarray(
            np.stack([rng.integers(0, v, 32) for v in vocabs], 1).astype(np.int32)
        ),
        "label": jnp.asarray(rng.integers(0, 2, 32).astype(np.float32)),
    }
    oc = OptimConfig(
        learning_rate=1e-2, dense_optimizer="adam", sparse_optimizer="rowwise_adagrad"
    )
    finals = []
    for gd in (True, False, "flat"):
        b = TrainStepBuilder(model, "logloss", oc, group_dedup=gd)
        st = b.init_state(jax.random.PRNGKey(0))
        stepf = jax.jit(b.step)
        for _ in range(3):
            st, m = stepf(st, batch)
        finals.append((st, m))
    assert float(finals[0][1]["loss"]) == float(finals[1][1]["loss"])
    for a, b_ in zip(
        jax.tree_util.tree_leaves(finals[0][0]),
        jax.tree_util.tree_leaves(finals[1][0]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


@pytest.mark.parametrize("name", ["sgd", "rowwise_adagrad", "rowwise_adam"])
@pytest.mark.parametrize("shape", [(96, 32), (100, 16), (97, 32), (64, 64)])
def test_packed_scatter_bit_identical(name, shape, monkeypatch):
    """scatter_add_rows' packed-reshape lowering (d < 128, the flagship
    dims) must be bit-identical to the plain hinted scatter — unique uids
    touch disjoint lanes of a packed line, so the pre-sum adds only
    zeros. (97, 32) has V % G != 0 and must fall back unpacked."""
    import tfrec_tpu.ops.sparse_optim as so

    v, d = shape
    rng = np.random.default_rng(7)
    table = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, v, (64,)).astype(np.int32))
    grads = jnp.asarray(rng.normal(size=(64, d)).astype(np.float32))
    opt = make_sparse_optimizer(name)
    state = opt.init(table)

    monkeypatch.setattr(so, "_PACKED_SCATTER", True)
    t_packed, s_packed = jax.jit(opt.apply)(table, state, ids, grads, 0.05)
    monkeypatch.setattr(so, "_PACKED_SCATTER", False)
    t_plain, s_plain = jax.jit(opt.apply)(table, state, ids, grads, 0.05)

    np.testing.assert_array_equal(np.asarray(t_packed), np.asarray(t_plain))
    for k in s_plain:
        np.testing.assert_array_equal(
            np.asarray(s_packed[k]), np.asarray(s_plain[k])
        )


def test_flat_multi_combine_bit_identical_with_sentinels():
    """combine_duplicate_ids_multi row f == combine_duplicate_ids on
    table f, including sentinel-padded (multi-hot) id vectors and
    heterogeneous vocabs."""
    from tfrec_tpu.ops.embedding import combine_duplicate_ids_multi

    rng = np.random.default_rng(0)
    vocabs = [50, 80, 50, 17]
    ids_seq, grads_seq = [], []
    for v in vocabs:
        ids_seq.append(jnp.asarray(rng.integers(0, v + 1, 64).astype(np.int32)))
        grads_seq.append(
            jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
        )
    uids, comb = jax.jit(
        lambda a, b: combine_duplicate_ids_multi(a, b, vocabs)
    )(ids_seq, grads_seq)
    for f, v in enumerate(vocabs):
        ru, rc = jax.jit(
            lambda i, g, v=v: combine_duplicate_ids(i, g, sentinel=v)
        )(ids_seq[f], grads_seq[f])
        np.testing.assert_array_equal(np.asarray(uids[f]), np.asarray(ru))
        nreal = int((np.asarray(ru) < v).sum())  # tail slots are arbitrary
        np.testing.assert_array_equal(
            np.asarray(comb[f][:nreal]), np.asarray(rc[:nreal])
        )


def test_combine_multi_negative_id_does_not_cross_tables():
    """A corrupt NEGATIVE id in one table must not shift the flat keyed
    sort's block boundaries (review finding, round 4: key = id + offset
    landed inside the PRECEDING table's range and grads crossed tables).
    Pinned by comparing the APPLIED scatter result against per-table
    combines — corrupt entries drop in both paths."""
    from tfrec_tpu.ops.embedding import (
        combine_duplicate_ids, combine_duplicate_ids_multi,
    )

    rng = np.random.default_rng(5)
    vocabs = [10, 20]
    ids0 = jnp.asarray(rng.integers(0, 10, 16).astype(np.int32))
    ids1_np = rng.integers(0, 20, 16).astype(np.int32)
    ids1_np[3] = -3  # corrupt
    ids1 = jnp.asarray(ids1_np)
    g0 = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    g1 = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))

    uids, comb = combine_duplicate_ids_multi([ids0, ids1], [g0, g1], vocabs)
    for f, (ids_f, g_f, v) in enumerate([(ids0, g0, 10), (ids1, g1, 20)]):
        u_ref, c_ref = combine_duplicate_ids(ids_f, g_f, sentinel=v)
        applied = jnp.zeros((v, 4)).at[uids[f]].add(comb[f], mode="drop")
        want = jnp.zeros((v, 4)).at[u_ref].add(c_ref, mode="drop")
        # numpy oracle: valid ids accumulate, the corrupt id contributes
        # NOTHING anywhere (negative .at[] indices would otherwise wrap
        # to row v-3 — the second half of this round-4 finding).
        oracle = np.zeros((v, 4), np.float32)
        for i in range(16):
            if 0 <= int(np.asarray(ids_f)[i]) < v:
                oracle[int(np.asarray(ids_f)[i])] += np.asarray(g_f)[i]
        np.testing.assert_allclose(np.asarray(applied), oracle,
                                   rtol=1e-5, atol=1e-6, err_msg=f"table {f}")
        np.testing.assert_allclose(
            np.asarray(applied), np.asarray(want), rtol=1e-6, atol=1e-7,
            err_msg=f"table {f}")
