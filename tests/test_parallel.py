"""Sharding-correctness tests on the 8-device virtual CPU mesh
(SURVEY.md §4 "Sharding-correctness" row): the explicit all-to-all
embedding path, sharded sparse updates, sharded top-k, and the full
distributed train step must match their single-device references.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tfrec_tpu.configs import DataConfig, MeshConfig, OptimConfig
from tfrec_tpu.data.dataset import build_dataset
from tfrec_tpu.data.samplers import PairwiseSampler
from tfrec_tpu.models import MF, DataSpec
from tfrec_tpu.ops.embedding import dedup_ids
from tfrec_tpu.ops.sparse_optim import make_sparse_optimizer
from tfrec_tpu.parallel.embedding import ColShardedTable, RowShardedTable, bucket_by_dest
from tfrec_tpu.parallel.mesh import make_mesh
from tfrec_tpu.parallel.step import ShardedTrainStepBuilder
from tfrec_tpu.parallel.topk import sharded_topk_dot
from tfrec_tpu.train.step import TrainStepBuilder

V, D, B = 100, 16, 64


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, jax.devices()
    return make_mesh(8, 1)


@pytest.fixture(scope="module")
def mesh4x2():
    return make_mesh(4, 2)


def _rand(seed, shape):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape).astype(np.float32))


def _ids(seed, n=B, vocab=V):
    return jnp.asarray(np.random.default_rng(seed).integers(0, vocab, n).astype(np.int32))


def test_dedup_ids_inverse_roundtrip():
    ids = jnp.array([7, 3, 7, 7, 1, 3], jnp.int32)
    uids, inv = dedup_ids(ids, sentinel=99)
    np.testing.assert_array_equal(np.asarray(uids)[np.asarray(inv)], np.asarray(ids))
    assert sorted(set(np.asarray(uids)) - {99}) == [1, 3, 7]


def test_bucket_overflow_is_counted_not_silent():
    ids = jnp.array([0, 1, 2, 3, 4, 5, 6, 7], jnp.int32)  # all dest shard 0
    _, _, overflow = bucket_by_dest(ids, num_shards=4, rows_per_shard=32, capacity=3, sentinel=128)
    assert int(overflow) == 5  # 8 ids, capacity 3


def test_row_sharded_lookup_matches_gather(mesh8):
    rt = RowShardedTable(mesh8, V, D)
    table = _rand(0, (rt.vocab_padded, D))
    ids = _ids(1)
    ts = jax.device_put(table, NamedSharding(mesh8, P("data", None)))
    ids_s = jax.device_put(ids, NamedSharding(mesh8, P("data")))
    out, ovf = jax.jit(rt.lookup)(ts, ids_s)
    assert int(ovf) == 0
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(table)[np.asarray(ids)], rtol=1e-6
    )


@pytest.mark.parametrize("opt_name", ["rowwise_adagrad", "rowwise_adam"])
def test_row_sharded_update_matches_single_device(mesh8, opt_name):
    opt = make_sparse_optimizer(opt_name, adagrad_init=0.05)
    rt = RowShardedTable(mesh8, V, D)
    table = _rand(2, (rt.vocab_padded, D))
    state = opt.init(table)
    ids, grads = _ids(3), _rand(4, (B, D))
    ts = jax.device_put(table, NamedSharding(mesh8, P("data", None)))
    ss = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh8, P("data", *([None] * (x.ndim - 1))))
        ),
        state,
    )
    ids_s = jax.device_put(ids, NamedSharding(mesh8, P("data")))
    gs = jax.device_put(grads, NamedSharding(mesh8, P("data", None)))
    nt, ns, ovf = jax.jit(lambda t, s, i, g: rt.update(t, s, i, g, opt, 0.1))(
        ts, ss, ids_s, gs
    )
    assert int(ovf) == 0
    ref_t, ref_s = opt.apply(table, state, ids, grads, 0.1)
    np.testing.assert_allclose(np.asarray(nt), np.asarray(ref_t), rtol=1e-5, atol=1e-6)
    for k in ref_s:
        np.testing.assert_allclose(
            np.asarray(ns[k]), np.asarray(ref_s[k]), rtol=1e-5, atol=1e-6
        )


def test_col_sharded_lookup_and_update(mesh4x2):
    opt = make_sparse_optimizer("rowwise_adagrad", adagrad_init=0.05)
    ct = ColShardedTable(mesh4x2, V, D)
    table = _rand(5, (V, D))
    ids, grads = _ids(6), _rand(7, (B, D))
    ts = jax.device_put(table, NamedSharding(mesh4x2, P(None, "table")))
    ids_s = jax.device_put(ids, NamedSharding(mesh4x2, P("data")))
    out, _ = jax.jit(ct.lookup)(ts, ids_s)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(table)[np.asarray(ids)], rtol=1e-6
    )
    state = opt.init(table)
    ss = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh4x2, P(None, "table") if x.ndim == 2 else P(None))
        ),
        state,
    )
    gs = jax.device_put(grads, NamedSharding(mesh4x2, P("data", None)))
    nt, ns, _ = jax.jit(lambda t, s, i, g: ct.update(t, s, i, g, opt, 0.1))(
        ts, ss, ids_s, gs
    )
    ref_t, ref_s = opt.apply(table, state, ids, grads, 0.1)
    np.testing.assert_allclose(np.asarray(nt), np.asarray(ref_t), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ns["acc"]), np.asarray(ref_s["acc"]), rtol=1e-5)


def test_col_update_gathers_deduped_feature_slice(mesh4x2):
    """HLO pin (VERDICT r3 weak #2): the column path's gradient exchange
    must move the capacity-bounded DEDUPED grads of THIS shard's D/T
    feature slice — never the full-width [B, D] grads the round-3 path
    gathered onto every device. Wire per device: N*C*(D/T) grad words +
    N*C ids, C = capacity_for(B_local, 1, factor)."""
    import re

    from tfrec_tpu.parallel.embedding import capacity_for

    opt = make_sparse_optimizer("rowwise_adagrad", adagrad_init=0.05)
    ct = ColShardedTable(mesh4x2, V, D)
    table = _rand(5, (V, D))
    ids, grads = _ids(6), _rand(7, (B, D))
    ts = jax.device_put(table, NamedSharding(mesh4x2, P(None, "table")))
    ids_s = jax.device_put(ids, NamedSharding(mesh4x2, P("data")))
    state = opt.init(table)
    ss = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh4x2, P(None, "table") if x.ndim == 2 else P(None))
        ),
        state,
    )
    gs = jax.device_put(grads, NamedSharding(mesh4x2, P("data", None)))
    hlo = (
        jax.jit(lambda t, s, i, g: ct.update(t, s, i, g, opt, 0.1))
        .lower(ts, ss, ids_s, gs)
        .compile()
        .as_text()
    )
    n_data = mesh4x2.shape["data"]
    b_local = B // n_data
    cap = capacity_for(b_local, 1, ct.capacity_factor)
    d_local = D // mesh4x2.shape["table"]
    gathered = set()
    for m in re.finditer(r"f32\[([\d,]+)\][^\n]*all-gather", hlo):
        gathered.add(tuple(int(x) for x in m.group(1).split(",")))
    assert gathered, "expected a float all-gather in the col update"
    assert gathered == {(n_data * cap, d_local)}, (
        gathered, (n_data * cap, d_local),
    )


def test_sharded_train_step_matches_single_device(mesh8):
    ds = build_dataset(
        DataConfig(
            source="synthetic_implicit", num_users=96, num_items=200,
            interactions_per_user=12, seed=0,
        )
    )
    model = MF(DataSpec.interaction(ds.num_users, ds.num_items), embed_dim=16)
    ocfg = OptimConfig(learning_rate=0.05, sparse_optimizer="rowwise_adagrad")
    b_ref = TrainStepBuilder(model, "bpr", ocfg)
    s_ref = b_ref.init_state(jax.random.PRNGKey(0))
    # f32 wire: this test pins LAYOUT equivalence vs the single-device
    # step (the bf16-wire default quantizes and is banded separately —
    # QUALITY_BANDS.json dcn_multihost_cpu8mesh_bf16wire).
    b_sh = ShardedTrainStepBuilder(
        model, "bpr", ocfg, mesh8, MeshConfig(a2a_dtype="float32")
    )
    s_sh = b_sh.init_state(jax.random.PRNGKey(0))
    sampler = PairwiseSampler(ds, batch_size=128, seed=1)
    batches = [
        {k: jnp.asarray(v) for k, v in b.items()} for b in list(sampler.epoch(0))[:3]
    ]
    step_ref = jax.jit(b_ref.step)
    step_sh = b_sh.compile_step(s_sh, batches[0])
    for b in batches:
        s_ref, _ = step_ref(s_ref, b)
        bs = {
            k: jax.device_put(v, NamedSharding(mesh8, P("data")))
            for k, v in b.items()
        }
        s_sh, m_sh = step_sh(s_sh, bs)
        assert int(m_sh["lookup_overflow"]) == 0
    ut = b_sh.unpadded_tables(s_sh)
    for name in s_ref["tables"]:
        np.testing.assert_allclose(
            np.asarray(ut[name]), np.asarray(s_ref["tables"][name]),
            rtol=2e-4, atol=1e-5,
        )


def test_sharded_topk_matches_full_sort(mesh8):
    rt = RowShardedTable(mesh8, V, D)
    table = _rand(8, (rt.vocab_padded, D))
    bias = _rand(9, (rt.vocab_padded,))
    users = _rand(10, (16, D))
    ts = jax.device_put(table, NamedSharding(mesh8, P("data", None)))
    bs = jax.device_put(bias, NamedSharding(mesh8, P("data")))
    vals, ids = jax.jit(
        lambda u, t, b: sharded_topk_dot(mesh8, u, t, 10, V, item_bias=b)
    )(users, ts, bs)
    dense = np.asarray(users) @ np.asarray(table)[:V].T + np.asarray(bias)[:V][None, :]
    want_ids = np.argsort(-dense, axis=1)[:, :10]
    np.testing.assert_allclose(
        np.asarray(vals), np.take_along_axis(dense, want_ids, 1), rtol=1e-5, atol=1e-6
    )
    # padded rows (>= V) must never appear
    assert np.asarray(ids).max() < V


def test_sharded_topk_approx_matches_exact(mesh8):
    """method='approx' (serving default — lax.approx_max_k per-shard
    candidates, exact cross-shard merge) must equal the exact path on the
    CPU backend, where approx_max_k lowers to a full sort."""
    rt = RowShardedTable(mesh8, V, D)
    table = _rand(21, (rt.vocab_padded, D))
    users = _rand(22, (16, D))
    ts = jax.device_put(table, NamedSharding(mesh8, P("data", None)))
    ev, ei = jax.jit(
        lambda u, t: sharded_topk_dot(mesh8, u, t, 10, V, method="exact")
    )(users, ts)
    av, ai = jax.jit(
        lambda u, t: sharded_topk_dot(mesh8, u, t, 10, V, method="approx")
    )(users, ts)
    np.testing.assert_array_equal(np.asarray(ei), np.asarray(ai))
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(av))


def test_sharded_topk_respects_exclusions(mesh8):
    rt = RowShardedTable(mesh8, V, D)
    table = _rand(11, (rt.vocab_padded, D))
    users = _rand(12, (4, D))
    ts = jax.device_put(table, NamedSharding(mesh8, P("data", None)))
    dense = np.asarray(users) @ np.asarray(table)[:V].T
    # Exclude each user's true top-3.
    top3 = np.argsort(-dense, axis=1)[:, :3].astype(np.int32)
    exc_p = jnp.asarray(top3)
    exc_c = jnp.full((4,), 3, jnp.int32)
    _, ids = jax.jit(
        lambda u, t, p, c: sharded_topk_dot(
            mesh8, u, t, 10, V, exclude_padded=p, exclude_counts=c
        )
    )(users, ts, exc_p, exc_c)
    got = np.asarray(ids)
    for u in range(4):
        assert not set(top3[u]) & set(got[u])


def test_gspmd_mode_matches_single_device(mesh8):
    """table_sharding='gspmd': same row layout, XLA-generated collectives."""
    ds = build_dataset(
        DataConfig(
            source="synthetic_implicit", num_users=96, num_items=200,
            interactions_per_user=12, seed=0,
        )
    )
    model = MF(DataSpec.interaction(ds.num_users, ds.num_items), embed_dim=16)
    ocfg = OptimConfig(learning_rate=0.05, sparse_optimizer="rowwise_adagrad")
    b_ref = TrainStepBuilder(model, "bpr", ocfg)
    s_ref = b_ref.init_state(jax.random.PRNGKey(0))
    b_g = ShardedTrainStepBuilder(
        model, "bpr", ocfg, mesh8, MeshConfig(table_sharding="gspmd")
    )
    s_g = b_g.init_state(jax.random.PRNGKey(0))
    sampler = PairwiseSampler(ds, batch_size=128, seed=1)
    batches = [
        {k: jnp.asarray(v) for k, v in b.items()} for b in list(sampler.epoch(0))[:2]
    ]
    step_ref = jax.jit(b_ref.step)
    step_g = b_g.compile_step(s_g, batches[0])
    for b in batches:
        s_ref, _ = step_ref(s_ref, b)
        bs = {
            k: jax.device_put(v, NamedSharding(mesh8, P("data")))
            for k, v in b.items()
        }
        s_g, _ = step_g(s_g, bs)
    ut = b_g.unpadded_tables(s_g)
    for name in s_ref["tables"]:
        np.testing.assert_allclose(
            np.asarray(ut[name]), np.asarray(s_ref["tables"][name]),
            rtol=2e-4, atol=1e-5,
        )


def test_fsdp_dense_matches_replicated(mesh8):
    """mesh.dense_sharding='fsdp' (dense params/opt sharded over 'data',
    GSPMD all-gather/reduce-scatter) must be math-identical to the
    replicated default, and must actually shard divisible leaves."""
    from tfrec_tpu.configs import ModelConfig
    from tfrec_tpu.data.synthetic import synthetic_ctr
    from tfrec_tpu.models import build_model

    vocabs, num_dense = (200, 100, 64), 5
    dense_np, cat_np, label_np = synthetic_ctr(
        64, num_dense=num_dense, vocab_sizes=vocabs, seed=0
    )
    spec = DataSpec.ctr(vocabs, num_dense)
    ocfg = OptimConfig(learning_rate=0.01, dense_optimizer="adam",
                       sparse_optimizer="rowwise_adagrad")

    def make(dense_sharding):
        model = build_model(
            ModelConfig(name="dcn", embed_dim=16, mlp_dims=(64, 32)), spec
        )
        b = ShardedTrainStepBuilder(
            model, "logloss", ocfg, mesh8,
            MeshConfig(table_sharding="row", dense_sharding=dense_sharding),
        )
        return b, b.init_state(jax.random.PRNGKey(0))

    b_rep, s_rep = make("replicated")
    b_fs, s_fs = make("fsdp")
    # The fsdp layout must shard at least one real dense leaf.
    sh = b_fs.state_shardings(s_fs)["dense"]
    assert any(
        ns.spec != P() for ns in jax.tree_util.tree_leaves(sh)
    ), "fsdp produced no sharded dense leaf"
    batch = {
        "dense": jnp.asarray(dense_np),
        "cat": jnp.asarray(cat_np),
        "label": jnp.asarray(label_np),
    }
    step_rep = b_rep.compile_step(s_rep, batch)
    step_fs = b_fs.compile_step(s_fs, batch)
    for _ in range(3):
        s_rep, m_rep = step_rep(s_rep, batch)
        s_fs, m_fs = step_fs(s_fs, batch)
    np.testing.assert_allclose(
        float(m_rep["loss"]), float(m_fs["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_rep["dense"]),
        jax.tree_util.tree_leaves(s_fs["dense"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_row_sharded_pallas_kernels_match_xla(mesh8):
    """kernels='pallas' inside shard_map (interpret on CPU): lookup and
    fused update match the XLA sharded path. D=128 to satisfy the fused
    update's alignment gate."""
    opt = make_sparse_optimizer("rowwise_adagrad")
    d128 = 128
    rt_x = RowShardedTable(mesh8, V, d128, kernels="xla")
    rt_p = RowShardedTable(mesh8, V, d128, kernels="pallas")
    table = _rand(20, (rt_x.vocab_padded, d128))
    ids = _ids(21)
    grads = _rand(22, (B, d128))
    ts = jax.device_put(table, NamedSharding(mesh8, P("data", None)))
    ids_s = jax.device_put(ids, NamedSharding(mesh8, P("data")))
    gs = jax.device_put(grads, NamedSharding(mesh8, P("data", None)))
    out_x, _ = jax.jit(rt_x.lookup)(ts, ids_s)
    out_p, _ = jax.jit(rt_p.lookup)(ts, ids_s)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), rtol=1e-6)

    state = opt.init(table)
    ss = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh8, P("data", *([None] * (x.ndim - 1))))
        ),
        state,
    )
    tx, sx, _ = jax.jit(lambda t, s, i, g: rt_x.update(t, s, i, g, opt, 0.1))(
        ts, ss, ids_s, gs
    )
    tp, sp, _ = jax.jit(lambda t, s, i, g: rt_p.update(t, s, i, g, opt, 0.1))(
        ts, ss, ids_s, gs
    )
    np.testing.assert_allclose(np.asarray(tp), np.asarray(tx), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sp["acc"]), np.asarray(sx["acc"]), rtol=1e-5
    )


def test_col_sharded_trainer_end_to_end():
    """table_axis_size=2 via the Trainer: column-sharded tables train and
    learn on the (4, 2) mesh."""
    from tfrec_tpu.configs import (
        Config, DataConfig, MeshConfig as MC, ModelConfig, OptimConfig,
        TrainConfig,
    )
    from tfrec_tpu.train.trainer import run

    cfg = Config(
        data=DataConfig(source="synthetic_implicit", num_users=96, num_items=192,
                        interactions_per_user=12),
        model=ModelConfig(name="mf", embed_dim=16),
        optim=OptimConfig(learning_rate=0.05),
        train=TrainConfig(batch_size=128, epochs=4, eval_every_epochs=4,
                          eval_topk=(20,), loss="bpr"),
        mesh=MC(data_axis_size=4, table_axis_size=2, table_sharding="col"),
    )
    trainer, hist = run(cfg, quiet=True)
    assert trainer.mesh is not None and trainer.mesh.shape["table"] == 2
    assert hist[-1]["recall@20"] > 0.12, hist[-1]


def test_negative_ids_counted_in_overflow():
    ids = jnp.array([5, -3, 12, -1], jnp.int32)
    send_ids, _, overflow = bucket_by_dest(
        ids, num_shards=4, rows_per_shard=8, capacity=4, sentinel=32
    )
    assert int(overflow) == 2  # the two negative (corrupt) ids
    # negatives never land in any send slot
    assert not np.any((np.asarray(send_ids) < 0))


def test_sharded_topk_small_catalog_sentinel(mesh8):
    """k > catalog: empty slots carry the num_items sentinel, not padded ids."""
    rt = RowShardedTable(mesh8, 24, D)
    table = _rand(30, (rt.vocab_padded, D))
    users = _rand(31, (4, D))
    ts = jax.device_put(table, NamedSharding(mesh8, P("data", None)))
    vals, ids = jax.jit(
        lambda u, t: sharded_topk_dot(mesh8, u, t, 10, 24)
    )(users, ts)
    got = np.asarray(ids)
    # 24 real items: every id is either a real item or the sentinel 24
    assert got.max() <= 24
    # exclusion without counts raises clearly
    import pytest as _pytest
    with _pytest.raises(ValueError, match="exclude_counts"):
        sharded_topk_dot(mesh8, users, ts, 5, 24,
                         exclude_padded=jnp.zeros((4, 1), jnp.int32))


def test_bf16_wire_format_close_to_f32(mesh8):
    """a2a_dtype=bfloat16 halves ICI volume; activations/updates stay
    within bf16 tolerance of the f32 wire path."""
    opt = make_sparse_optimizer("rowwise_adagrad")
    rt32 = RowShardedTable(mesh8, V, D)
    rt16 = RowShardedTable(mesh8, V, D, wire_dtype=jnp.bfloat16)
    table = _rand(40, (rt32.vocab_padded, D))
    ids = _ids(41)
    grads = _rand(42, (B, D))
    ts = jax.device_put(table, NamedSharding(mesh8, P("data", None)))
    ids_s = jax.device_put(ids, NamedSharding(mesh8, P("data")))
    gs = jax.device_put(grads, NamedSharding(mesh8, P("data", None)))
    out32, _ = jax.jit(rt32.lookup)(ts, ids_s)
    out16, _ = jax.jit(rt16.lookup)(ts, ids_s)
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               rtol=1e-2, atol=1e-2)
    state = opt.init(table)
    ss = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh8, P("data", *([None] * (x.ndim - 1))))
        ), state,
    )
    t32, _, _ = jax.jit(lambda t, s, i, g: rt32.update(t, s, i, g, opt, 0.1))(
        ts, ss, ids_s, gs)
    t16, _, _ = jax.jit(lambda t, s, i, g: rt16.update(t, s, i, g, opt, 0.1))(
        ts, ss, ids_s, gs)
    np.testing.assert_allclose(np.asarray(t16), np.asarray(t32),
                               rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize(
    "name,extra",
    [
        ("sasrec", dict(max_history=12, sasrec_blocks=1)),
        ("gru4rec", dict(max_history=12, gru_hidden=16)),
        ("caser", dict(max_history=12, caser_h_filters=4,
                       caser_heights=(2,), caser_v_filters=2)),
        ("sbpr", {}),
        ("nfm", {}),
        ("irgan", {}),
        ("ngcf", dict(lightgcn_layers=2, dropout=0.0)),
    ],
)
def test_new_families_train_on_mesh(name, extra):
    """The sequential/social/deep-FM families must ride the sharded step
    through the generic lookup/sparse_update seams with no model-specific
    mesh code: 8-device data-parallel run, finite decreasing loss."""
    from tfrec_tpu.configs import Config, ModelConfig, TrainConfig
    from tfrec_tpu.train.trainer import run

    is_ctr = name == "nfm"
    cfg = Config(
        data=(
            DataConfig(source="synthetic_ctr", num_examples=4_000,
                       num_dense_features=3, categorical_vocab_sizes=(40, 30),
                       test_fraction=0.2, seed=2)
            if is_ctr
            else DataConfig(source="synthetic_implicit", num_users=128,
                            num_items=256, interactions_per_user=12, seed=2,
                            social_degree=(6 if name == "sbpr" else 0))
        ),
        model=ModelConfig(name=name, embed_dim=16,
                          **({"mlp_dims": (16,)} if is_ctr else {}), **extra),
        optim=OptimConfig(learning_rate=0.02),
        train=TrainConfig(batch_size=64, epochs=3, eval_every_epochs=0,
                          loss=("logloss" if is_ctr else "bpr")),
        mesh=MeshConfig(data_axis_size=8),
    )
    t, hist = run(cfg, quiet=True)
    assert t.mesh is not None and t.mesh.shape["data"] == 8
    losses = [h["loss"] for h in hist]
    assert np.isfinite(losses[-1]) and losses[-1] < losses[0], losses


@pytest.mark.parametrize("lane", [False, True])
def test_fused_tables_matches_per_table_regions(mesh8, lane):
    """mesh.fused_tables=True (all row-sharded exchanges in ONE shard_map
    region per step side) is BITWISE the per-table path for 3 steps, for
    both the unpacked and the lane-sliced layouts — the bodies are the
    same RowShardedTable.local_* methods, only the region count changes
    (round-4 breakdown: the regions, not the work inside them, were the
    mesh step's dominant overhead — docs/PERF.md)."""
    from tfrec_tpu.configs import MeshConfig, ModelConfig
    from tfrec_tpu.models import build_model
    from tfrec_tpu.models import DataSpec as DS

    spec = DS.ctr((128, 96, 80, 64), num_dense=2)
    ocfg = OptimConfig(learning_rate=0.01, sparse_optimizer="rowwise_adagrad")
    rng = np.random.default_rng(7)
    batch = {
        "dense": jnp.asarray(rng.normal(size=(64, 2)).astype(np.float32)),
        "cat": jnp.asarray(np.stack(
            [rng.integers(0, v, 64) for v in (128, 96, 80, 64)], 1
        ).astype(np.int32)),
        "label": jnp.asarray(rng.integers(0, 2, 64).astype(np.float32)),
    }
    states = {}
    for fused in (False, True):
        model = build_model(
            ModelConfig(name="dcn", embed_dim=32, mlp_dims=(16,),
                        num_cross_layers=2, lane_pack=lane), spec)
        b = ShardedTrainStepBuilder(
            model, "logloss", ocfg, mesh8,
            MeshConfig(a2a_dtype="float32", fused_tables=fused))
        s = b.init_state(jax.random.PRNGKey(0))
        sh = b.batch_shardings(batch)
        db = {k: jax.device_put(v, sh[k]) for k, v in batch.items()}
        step = b.compile_step(s, db)
        for _ in range(3):
            s, m = step(s, db)
        states[fused] = (jax.device_get(s), float(m["loss"]))
    (s_ref, l_ref), (s_f, l_f) = states[False], states[True]
    assert l_ref == l_f
    for name in s_ref["tables"]:
        np.testing.assert_array_equal(
            np.asarray(s_ref["tables"][name]), np.asarray(s_f["tables"][name]),
            err_msg=name)
        for key, u in s_ref["sparse_opt"][name].items():
            np.testing.assert_array_equal(
                np.asarray(u), np.asarray(s_f["sparse_opt"][name][key]),
                err_msg=f"{name} sparse_opt[{key}]")


@pytest.mark.parametrize(
    "lane,opt,fused,widths",
    [
        (False, "rowwise_adagrad", False, None),
        (True, "rowwise_adagrad", False, None),
        (True, "rowwise_adam", False, None),
        (False, "rowwise_adagrad", True, None),
        (True, "rowwise_adagrad", True, None),
        (False, "rowwise_adagrad", False, (2, 1, 1, 1)),  # multi-hot bags
    ],
)
def test_route_reuse_matches_rederived_route(mesh8, lane, opt, fused, widths):
    """mesh.route_reuse=True (the update half reuses the lookup's dedup
    inverse / send plan / received ids instead of re-deriving them —
    VERDICT r4 item 1) is BITWISE the re-derivation path for 3 steps:
    the skipped computation is a deterministic function of the same ids.
    Covered: unpacked + lane-sliced layouts, grouped rowwise-Adam,
    fused-region mode, and multi-hot bags (sentinel padding in the ids)."""
    from tfrec_tpu.configs import MeshConfig, ModelConfig
    from tfrec_tpu.models import build_model
    from tfrec_tpu.models import DataSpec as DS

    vocabs = (128, 96, 80, 64)
    spec = DS.ctr(vocabs, num_dense=2, field_widths=widths)
    ocfg = OptimConfig(learning_rate=0.01, sparse_optimizer=opt)
    rng = np.random.default_rng(11)
    cols = []
    for v, w in zip(vocabs, widths or (1,) * len(vocabs)):
        for j in range(w):
            col = rng.integers(0, v, 64).astype(np.int32)
            if j == w - 1 and w > 1:
                col[::3] = v  # sentinel bag padding
            cols.append(col)
    batch = {
        "dense": jnp.asarray(rng.normal(size=(64, 2)).astype(np.float32)),
        "cat": jnp.asarray(np.stack(cols, 1)),
        "label": jnp.asarray(rng.integers(0, 2, 64).astype(np.float32)),
    }
    states = {}
    for reuse in (False, True):
        model = build_model(
            ModelConfig(name="dcn", embed_dim=32, mlp_dims=(16,),
                        num_cross_layers=2, lane_pack=lane), spec)
        b = ShardedTrainStepBuilder(
            model, "logloss", ocfg, mesh8,
            MeshConfig(a2a_dtype="float32", fused_tables=fused,
                       route_reuse=reuse))
        s = b.init_state(jax.random.PRNGKey(0))
        sh = b.batch_shardings(batch)
        db = {k: jax.device_put(v, sh[k]) for k, v in batch.items()}
        step = b.compile_step(s, db)
        for _ in range(3):
            s, m = step(s, db)
        states[reuse] = (jax.device_get(s), float(m["loss"]))
    (s_ref, l_ref), (s_r, l_r) = states[False], states[True]
    assert l_ref == l_r
    for name in s_ref["tables"]:
        np.testing.assert_array_equal(
            np.asarray(s_ref["tables"][name]), np.asarray(s_r["tables"][name]),
            err_msg=name)
        for key, u in s_ref["sparse_opt"][name].items():
            np.testing.assert_array_equal(
                np.asarray(u), np.asarray(s_r["sparse_opt"][name][key]),
                err_msg=f"{name} sparse_opt[{key}]")


def test_merge_argsort_runs_is_stable_argsort():
    """merge_argsort_runs == jnp.argsort (stable) for any array of
    nondecreasing equal-length runs — run counts/lengths that are and are
    not powers of two, heavy duplicates, sentinel tails, single run."""
    from tfrec_tpu.ops.embedding import merge_argsort_runs

    rng = np.random.default_rng(3)
    for num_runs, c, hi in [(1, 7, 5), (2, 8, 4), (3, 5, 9), (8, 33, 12),
                            (8, 1160, 12500), (5, 64, 3), (4, 16, 1)]:
        runs = np.sort(rng.integers(0, hi, size=(num_runs, c)), axis=1)
        # sentinel tails (the real receive-buffer shape): top value runs
        runs[:, -max(c // 4, 1):] = hi
        x = runs.reshape(-1).astype(np.int32)
        got = np.asarray(jax.jit(
            lambda k: merge_argsort_runs(k, num_runs)
        )(jnp.asarray(x)))
        want = np.argsort(x, kind="stable")
        np.testing.assert_array_equal(got, want, err_msg=f"{num_runs}x{c}")


def test_recv_combine_merge_matches_sort(mesh8):
    """mesh.recv_combine='merge' (bitonic N-way merge of the per-source-
    sorted received grad blocks, VERDICT r4 item 3) is BITWISE the default
    general-sort path over 3 steps."""
    from tfrec_tpu.configs import MeshConfig, ModelConfig
    from tfrec_tpu.models import build_model
    from tfrec_tpu.models import DataSpec as DS

    vocabs = (128, 96, 80, 64)
    spec = DS.ctr(vocabs, num_dense=2)
    ocfg = OptimConfig(learning_rate=0.01, sparse_optimizer="rowwise_adagrad")
    rng = np.random.default_rng(13)
    batch = {
        "dense": jnp.asarray(rng.normal(size=(64, 2)).astype(np.float32)),
        "cat": jnp.asarray(np.stack(
            [rng.integers(0, v, 64) for v in vocabs], 1).astype(np.int32)),
        "label": jnp.asarray(rng.integers(0, 2, 64).astype(np.float32)),
    }
    states = {}
    for combine in ("sort", "merge"):
        model = build_model(
            ModelConfig(name="dcn", embed_dim=32, mlp_dims=(16,),
                        num_cross_layers=2, lane_pack=False), spec)
        b = ShardedTrainStepBuilder(
            model, "logloss", ocfg, mesh8,
            MeshConfig(a2a_dtype="float32", recv_combine=combine))
        s = b.init_state(jax.random.PRNGKey(0))
        sh = b.batch_shardings(batch)
        db = {k: jax.device_put(v, sh[k]) for k, v in batch.items()}
        step = b.compile_step(s, db)
        for _ in range(3):
            s, m = step(s, db)
        states[combine] = (jax.device_get(s), float(m["loss"]))
    (s_ref, l_ref), (s_m, l_m) = states["sort"], states["merge"]
    assert l_ref == l_m
    for name in s_ref["tables"]:
        np.testing.assert_array_equal(
            np.asarray(s_ref["tables"][name]), np.asarray(s_m["tables"][name]),
            err_msg=name)
        np.testing.assert_array_equal(
            np.asarray(s_ref["sparse_opt"][name]["acc"]),
            np.asarray(s_m["sparse_opt"][name]["acc"]), err_msg=name)


def _zipf_sorted_ids(rng, n, vocab, a=1.2):
    """Zipf ids under a FREQUENCY-SORTED vocab (id 0 = most popular) —
    the adversarial case for contiguous-block routing (VERDICT r4 weak
    #3): the hot head all lives in shard 0's row block."""
    ids = rng.zipf(a, size=2 * n) - 1
    ids = ids[ids < vocab][:n]
    assert len(ids) == n
    return ids.astype(np.int32)


def test_skewed_ids_overflow_counted_and_row_permute_fixes_it(mesh8):
    """Contiguous-block routing drops a material fraction of unique sends
    under zipf(1.2) frequency-sorted ids at the default capacity (counted,
    never silent), and mesh.row_permute's round-robin assignment brings
    the drop to zero at the same capacity."""
    vocab, dim, n = 100_000, 16, 8192
    rng = np.random.default_rng(5)
    ids_np = _zipf_sorted_ids(rng, n, vocab)
    t_np = np.random.default_rng(1).normal(size=(vocab, dim)).astype(np.float32)

    overflows = {}
    for permute in (False, True):
        plan = RowShardedTable(mesh8, vocab, dim, permute=permute)
        tbl = jnp.pad(jnp.asarray(t_np),
                      ((0, plan.vocab_padded - vocab), (0, 0)))
        # Physical layout: phys = logical[inv_perm] (what init builds).
        tbl = jnp.take(tbl, plan.inv_perm_rows(), axis=0)
        tbl = jax.device_put(tbl, NamedSharding(mesh8, P("data", None)))
        ids = jax.device_put(jnp.asarray(ids_np), NamedSharding(mesh8, P("data")))
        out, ovf = jax.jit(plan.lookup)(tbl, ids)
        overflows[permute] = int(ovf)
        # Non-dropped rows read the right LOGICAL embedding either way.
        got = np.asarray(out)
        want = t_np[ids_np]
        served = ~(got == 0).all(axis=1)
        np.testing.assert_allclose(got[served], want[served], rtol=1e-6)
    # ~11% of unique sends overflow at factor=2.0 on this shape (the
    # offline balls-in-bins numbers in docs/PERF.md) — materially nonzero.
    assert overflows[False] > 100, overflows
    assert overflows[True] == 0, overflows
    # And served coverage under permute is total.


@pytest.mark.parametrize("reuse", [True, False])
def test_row_permute_step_matches_unpermuted(mesh8, reuse):
    """mesh.row_permute is a pure LAYOUT change: logical tables after 3
    steps are bitwise identical to the unpermuted run (f32 wire), and the
    eval view (unpadded_tables) always returns logical rows. Covered with
    route reuse on AND off (the non-route update re-derives the route
    from permuted ids)."""
    from tfrec_tpu.configs import MeshConfig, ModelConfig
    from tfrec_tpu.models import build_model
    from tfrec_tpu.models import DataSpec as DS

    vocabs = (128, 96, 80, 64)
    spec = DS.ctr(vocabs, num_dense=2)
    ocfg = OptimConfig(learning_rate=0.01, sparse_optimizer="rowwise_adagrad")
    rng = np.random.default_rng(17)
    batch = {
        "dense": jnp.asarray(rng.normal(size=(64, 2)).astype(np.float32)),
        "cat": jnp.asarray(np.stack(
            [rng.integers(0, v, 64) for v in vocabs], 1).astype(np.int32)),
        "label": jnp.asarray(rng.integers(0, 2, 64).astype(np.float32)),
    }
    results = {}
    for permute in (False, True):
        model = build_model(
            ModelConfig(name="dcn", embed_dim=32, mlp_dims=(16,),
                        num_cross_layers=2, lane_pack=False), spec)
        b = ShardedTrainStepBuilder(
            model, "logloss", ocfg, mesh8,
            MeshConfig(a2a_dtype="float32", row_permute=permute,
                       route_reuse=reuse))
        s = b.init_state(jax.random.PRNGKey(0))
        sh = b.batch_shardings(batch)
        db = {k: jax.device_put(v, sh[k]) for k, v in batch.items()}
        step = b.compile_step(s, db)
        for _ in range(3):
            s, m = step(s, db)
        assert int(m["lookup_overflow"]) == 0
        results[permute] = (
            {k: np.asarray(v) for k, v in b.unpadded_tables(s).items()},
            float(m["loss"]),
        )
    (t_ref, l_ref), (t_p, l_p) = results[False], results[True]
    assert l_ref == l_p
    for name in t_ref:
        np.testing.assert_array_equal(t_ref[name], t_p[name], err_msg=name)


def test_row_permuted_checkpoint_layout_is_guarded(tmp_path, mesh8):
    """A row-permuted checkpoint records the layout fact; restoring with
    a mismatched flag (or, by construction, a different device count)
    refuses loudly — the permutation is a function of device count, so a
    silent restore would scramble every table row."""
    from tfrec_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    state = {"step": jnp.zeros((), jnp.int32),
             "t": jax.device_put(_rand(0, (16, 4)),
                                 NamedSharding(mesh8, P("data", None)))}
    save_checkpoint(str(tmp_path), 1, state, meta={"row_permute": True})
    with pytest.raises(ValueError, match="row_permute"):
        restore_checkpoint(str(tmp_path), state, expect_row_permute=False)
    out = restore_checkpoint(str(tmp_path), state, expect_row_permute=True)
    np.testing.assert_array_equal(np.asarray(out["t"]), np.asarray(state["t"]))
    # Legacy checkpoints (no meta) restore under either expectation=False.
    save_checkpoint(str(tmp_path / "b"), 1, state)
    restore_checkpoint(str(tmp_path / "b"), state, expect_row_permute=False)
    with pytest.raises(ValueError, match="row_permute"):
        restore_checkpoint(str(tmp_path / "b"), state, expect_row_permute=True)
    # The permutation is a function of the DATA-AXIS shard count, not the
    # device count: a (2,2) and a (4,1) mesh share device_count=4 but not
    # the layout — the recorded shard count must be enforced (round-5
    # review finding).
    save_checkpoint(str(tmp_path / "c"), 1, state,
                    meta={"row_permute": True, "row_permute_shards": 4})
    restore_checkpoint(str(tmp_path / "c"), state, expect_row_permute=True,
                       expect_row_permute_shards=4)
    with pytest.raises(ValueError, match="shards"):
        restore_checkpoint(str(tmp_path / "c"), state,
                           expect_row_permute=True,
                           expect_row_permute_shards=8)


def test_row_permute_refused_on_single_device_path():
    """mesh.row_permute on a run that resolves to the single-device
    builder (or a closed-form solver) must refuse, not silently no-op —
    an inert flag would record row_permute=False checkpoints and confuse
    a later mesh resume (round-5 review finding)."""
    from tfrec_tpu.configs import (
        Config, DataConfig, MeshConfig, ModelConfig, OptimConfig, TrainConfig,
    )
    from tfrec_tpu.train.trainer import Trainer

    cfg = Config(
        data=DataConfig(source="synthetic_ctr", num_examples=1000,
                        num_dense_features=2,
                        categorical_vocab_sizes=(50, 30), test_fraction=0.2),
        model=ModelConfig(name="dcn", embed_dim=8, num_cross_layers=1,
                          mlp_dims=(8,)),
        optim=OptimConfig(learning_rate=0.01),
        train=TrainConfig(batch_size=64, epochs=1, loss="logloss",
                          log_every_steps=0),
        # data_axis_size=0 forces the single-device path regardless of
        # visible devices.
        mesh=MeshConfig(data_axis_size=0, row_permute=True),
    )
    with pytest.raises(ValueError, match="row_permute"):
        Trainer(cfg, quiet=True)


def test_row_permute_refuses_retrieval_models(mesh8):
    ds_spec = DataSpec.interaction(96, 200)
    model = MF(ds_spec, embed_dim=16)
    with pytest.raises(ValueError, match="row_permute"):
        ShardedTrainStepBuilder(
            model, "bpr", OptimConfig(learning_rate=0.05), mesh8,
            MeshConfig(row_permute=True),
        )


def test_run_index_helpers_match_searchsorted():
    """run_first_index / run_last_index_plus1 == searchsorted left/right
    on sorted arrays (the O(n) scan replacement for XLA:TPU's
    while-loop searchsorted lowering — docs/PERF.md round-4 trace), and
    run_first_index additionally handles the contiguity-only case
    (sentinel runs at front AND tail from corrupt negative ids)."""
    from tfrec_tpu.ops.embedding import run_first_index, run_last_index_plus1

    rng = np.random.default_rng(0)
    for n, hi_val in ((1, 2), (7, 3), (64, 9), (300, 30)):
        x = np.sort(rng.integers(0, hi_val, n)).astype(np.int32)
        np.testing.assert_array_equal(
            np.asarray(run_first_index(jnp.asarray(x))),
            np.searchsorted(x, x, side="left"))
        np.testing.assert_array_equal(
            np.asarray(run_last_index_plus1(jnp.asarray(x))),
            np.searchsorted(x, x, side="right"))
    x = jnp.asarray(np.array([9, 9, 0, 1, 1, 5, 9, 9], np.int32))
    np.testing.assert_array_equal(
        np.asarray(run_first_index(x)), [0, 0, 2, 3, 3, 5, 6, 6])


def test_col_lookup_counts_negatives_and_zeroes_them(mesh4x2):
    """Col-sharded lookup: corrupt NEGATIVE ids must read as zero and be
    counted (review finding, round 4 — they silently clamped to row 0
    while the row path zeroed + counted). >= V sentinel ids stay
    legitimate maskable bag padding."""
    ct = ColShardedTable(mesh4x2, V, D)
    table = _rand(5, (V, D))
    ids = jnp.array([3, -1, 7, -5, V, 2, 1, 0], jnp.int32)
    ts = jax.device_put(table, NamedSharding(mesh4x2, P(None, "table")))
    ids_s = jax.device_put(ids, NamedSharding(mesh4x2, P("data")))
    out, ovf = jax.jit(ct.lookup)(ts, ids_s)
    assert int(ovf) == 2
    out = np.asarray(out)
    np.testing.assert_array_equal(out[1], 0.0)
    np.testing.assert_array_equal(out[3], 0.0)
    np.testing.assert_allclose(out[0], np.asarray(table)[3], rtol=1e-6)
    # sentinel bag padding: clamped (maskable), NOT counted
    np.testing.assert_allclose(out[4], np.asarray(table)[V - 1], rtol=1e-6)


def _prim_count(jaxpr, names):
    """Count primitives by name, descending into EVERY sub-jaxpr —
    ClosedJaxpr params (scan/cond: have .jaxpr) AND raw Jaxpr params
    (shard_map bodies: have .eqns directly). The original traversal only
    followed .jaxpr and silently skipped shard_map interiors (round-5
    review finding — the loop-free pin below was weaker than intended)."""
    total = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name in names:
            total += 1
        for v in eqn.params.values():
            if hasattr(v, "eqns"):  # raw Jaxpr (shard_map)
                total += _prim_count(v, names)
            elif getattr(v, "jaxpr", None) is not None:  # ClosedJaxpr
                total += _prim_count(v.jaxpr, names)
    return total


def test_route_reuse_removes_update_id_all_to_all(mesh8):
    """Structural pin for route reuse: with mesh.route_reuse the step's
    jaxpr carries exactly ONE FEWER all_to_all per row-sharded table (the
    update's id exchange is reused from the lookup) — 3 per table
    (lookup ids, lookup activations, update grads) instead of 4."""
    from tfrec_tpu.configs import MeshConfig, ModelConfig
    from tfrec_tpu.models import build_model
    from tfrec_tpu.models import DataSpec as DS

    prim_count = _prim_count
    vocabs = (128, 96, 80, 64)
    spec = DS.ctr(vocabs, num_dense=2)
    ocfg = OptimConfig(learning_rate=0.01, sparse_optimizer="rowwise_adagrad")
    rng = np.random.default_rng(3)
    batch = {
        "dense": jnp.asarray(rng.normal(size=(64, 2)).astype(np.float32)),
        "cat": jnp.asarray(np.stack(
            [rng.integers(0, v, 64) for v in vocabs], 1).astype(np.int32)),
        "label": jnp.asarray(rng.integers(0, 2, 64).astype(np.float32)),
    }
    counts = {}
    for reuse in (False, True):
        model = build_model(
            ModelConfig(name="dcn", embed_dim=32, mlp_dims=(16,),
                        num_cross_layers=2, lane_pack=False), spec)
        b = ShardedTrainStepBuilder(
            model, "logloss", ocfg, mesh8, MeshConfig(route_reuse=reuse))
        state = b.init_state(jax.random.PRNGKey(0))
        j = jax.make_jaxpr(b.step)(state, batch)
        counts[reuse] = prim_count(j.jaxpr, {"all_to_all"})
    n_tables = len(vocabs)
    assert counts[False] == 4 * n_tables, counts
    assert counts[True] == 3 * n_tables, counts


def test_sharded_step_jaxpr_has_no_sequential_loops(mesh8):
    """Structural pin for the round-4 searchsorted regression class: the
    single sharded train step must contain NO scan/while primitives —
    jnp.searchsorted traces to a sequential `scan` that XLA:TPU lowers
    to a per-element while loop (~816us/call; it cost the mesh path 2x
    until the round-4 forensics — docs/PERF.md). multi_step legitimately
    adds exactly ONE scan (the K-step loop). Uses _prim_count, which
    descends into shard_map bodies (the original traversal did not —
    round-5 review finding, so this pin now covers the region interiors
    where bucket_by_dest actually lives)."""
    from tfrec_tpu.configs import MeshConfig, ModelConfig
    from tfrec_tpu.models import build_model
    from tfrec_tpu.models import DataSpec as DS

    prim_count = _prim_count
    spec = DS.ctr((128, 96, 80, 64), num_dense=2)
    ocfg = OptimConfig(learning_rate=0.01, sparse_optimizer="rowwise_adagrad")
    rng = np.random.default_rng(3)
    batch = {
        "dense": jnp.asarray(rng.normal(size=(64, 2)).astype(np.float32)),
        "cat": jnp.asarray(np.stack(
            [rng.integers(0, v, 64) for v in (128, 96, 80, 64)], 1
        ).astype(np.int32)),
        "label": jnp.asarray(rng.integers(0, 2, 64).astype(np.float32)),
    }
    for lane in (False, True):
        model = build_model(
            ModelConfig(name="dcn", embed_dim=32, mlp_dims=(16,),
                        num_cross_layers=2, lane_pack=lane), spec)
        b = ShardedTrainStepBuilder(model, "logloss", ocfg, mesh8, MeshConfig())
        state = b.init_state(jax.random.PRNGKey(0))
        j = jax.make_jaxpr(b.step)(state, batch)
        assert prim_count(j.jaxpr, {"scan", "while"}) == 0, lane
        stacked = {k: jnp.stack([v, v]) for k, v in batch.items()}
        j2 = jax.make_jaxpr(b.multi_step)(state, stacked)
        assert prim_count(j2.jaxpr, {"scan", "while"}) == 1, lane
