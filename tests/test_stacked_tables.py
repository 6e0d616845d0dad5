"""model.stack_tables: the fused one-table layout must be mathematically
identical to the per-field layout — same forward logits and same one-step
training update when the per-field tables are embedded into the stacked
table at their vocab offsets (rowwise optimizers are row-local and field
id spaces are disjoint, so this is a pure layout change)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfrec_tpu.configs import ModelConfig, OptimConfig
from tfrec_tpu.models import DataSpec, build_model
from tfrec_tpu.train.step import TrainStepBuilder

VOCABS = (60, 40, 30)
NUM_DENSE = 4
B = 64


def _batch(rng, widths=None):
    cols = sum(widths) if widths else len(VOCABS)
    cat = np.stack(
        [
            rng.integers(0, v, B)
            for f, v in enumerate(VOCABS)
            for _ in range(widths[f] if widths else 1)
        ],
        axis=1,
    ).astype(np.int32)
    assert cat.shape[1] == cols
    return {
        "dense": jnp.asarray(rng.normal(size=(B, NUM_DENSE)).astype(np.float32)),
        "cat": jnp.asarray(cat),
        "label": jnp.asarray(rng.integers(0, 2, B).astype(np.float32)),
    }


def _embed_unstacked_into_stacked(model_s, state_u, state_s):
    """Copy the per-field tables/opt-state into the stacked layout."""
    tables_s = {k: np.array(v) for k, v in state_s["tables"].items()}
    opt_s = jax.tree_util.tree_map(np.array, state_s["sparse_opt"])
    for f, v in enumerate(VOCABS):
        off = model_s._voffsets[f]
        tables_s["fields"][off : off + v] = np.array(
            state_u["tables"][f"field_{f}"]
        )
        for leaf in opt_s.get("fields", {}):
            opt_s["fields"][leaf][off : off + v] = np.array(
                state_u["sparse_opt"][f"field_{f}"][leaf]
            )
        if "lin" in tables_s:
            tables_s["lin"][off : off + v] = np.array(
                state_u["tables"][f"lin_{f}"]
            )
            for leaf in opt_s.get("lin", {}):
                opt_s["lin"][leaf][off : off + v] = np.array(
                    state_u["sparse_opt"][f"lin_{f}"][leaf]
                )
    state_s = dict(state_s)
    state_s["tables"] = {k: jnp.asarray(v) for k, v in tables_s.items()}
    state_s["sparse_opt"] = jax.tree_util.tree_map(jnp.asarray, opt_s)
    state_s["dense"] = state_u["dense"]
    state_s["dense_opt"] = state_u["dense_opt"]
    return state_s


@pytest.mark.parametrize("name", ["dcn", "fm", "dlrm"])
def test_stacked_equals_per_field_one_step(name):
    spec = DataSpec.ctr(VOCABS, NUM_DENSE)
    # lane_pack=False: this test compares per-field tables by name
    # against the stacked layout (the default is auto lane packing).
    mcfg = ModelConfig(name=name, embed_dim=8, num_cross_layers=2,
                       mlp_dims=(16,), lane_pack=False)
    ocfg = OptimConfig(learning_rate=0.01, dense_optimizer="adam",
                       sparse_optimizer="rowwise_adagrad")

    model_u = build_model(mcfg, spec)
    model_s = build_model(dataclasses.replace(mcfg, stack_tables=True), spec)
    assert set(t.name for t in model_s.table_specs()) <= {"fields", "lin"}

    bu = TrainStepBuilder(model_u, "logloss", ocfg)
    bs = TrainStepBuilder(model_s, "logloss", ocfg)
    state_u = bu.init_state(jax.random.PRNGKey(0))
    state_s = bs.init_state(jax.random.PRNGKey(1))
    state_s = _embed_unstacked_into_stacked(model_s, state_u, state_s)

    rng = np.random.default_rng(0)
    batch = _batch(rng)

    # forward parity
    ids_u, ids_s = model_u.lookup_ids(batch), model_s.lookup_ids(batch)
    gu = {k: jnp.take(state_u["tables"][k], v, axis=0, mode="clip")
          for k, v in ids_u.items()}
    gs = {k: jnp.take(state_s["tables"][k], v, axis=0, mode="clip")
          for k, v in ids_s.items()}
    lu = model_u.forward(state_u["dense"], gu, batch)
    ls = model_s.forward(state_s["dense"], gs, batch)
    np.testing.assert_allclose(np.array(lu), np.array(ls), rtol=1e-6, atol=1e-6)

    # one-step training parity (loss + every updated table row)
    nu, mu = jax.jit(bu.step)(state_u, batch)
    ns, ms = jax.jit(bs.step)(state_s, batch)
    np.testing.assert_allclose(float(mu["loss"]), float(ms["loss"]), rtol=1e-6)
    for f, v in enumerate(VOCABS):
        off = model_s._voffsets[f]
        np.testing.assert_allclose(
            np.array(nu["tables"][f"field_{f}"]),
            np.array(ns["tables"]["fields"][off : off + v]),
            rtol=1e-5, atol=1e-6,
        )


def test_stacked_multihot_sentinels_map_to_global_sentinel():
    """Multi-hot padding (per-field sentinel V_f) must become the global
    sentinel, not another field's row."""
    widths = (2, 1, 3)
    spec = DataSpec.ctr(VOCABS, NUM_DENSE, field_widths=widths)
    model = build_model(
        ModelConfig(name="dcn", embed_dim=8, num_cross_layers=1,
                    mlp_dims=(8,), stack_tables=True), spec)
    rng = np.random.default_rng(1)
    batch = _batch(rng, widths=widths)
    cat = np.array(batch["cat"])
    cat[0, 1] = VOCABS[0]  # pad slot in field 0's bag
    cat[3, 5] = VOCABS[2]  # pad slot in field 2's bag
    batch["cat"] = jnp.asarray(cat)
    gids = np.array(model._global_ids(batch)).reshape(B, sum(widths))
    assert gids[0, 1] == model.total_vocab
    assert gids[3, 5] == model.total_vocab
    real = gids[gids < model.total_vocab]
    assert real.max() < model.total_vocab


def test_stacked_rejects_non_ctr_and_mixed_dims():
    with pytest.raises(ValueError, match="CTR"):
        build_model(
            ModelConfig(name="mf", stack_tables=True),
            DataSpec.interaction(100, 200),
        )
    with pytest.raises(ValueError, match="equal"):
        build_model(
            ModelConfig(name="dcn", embed_dim=8, field_dims=(8, 4, 8),
                        stack_tables=True),
            DataSpec.ctr(VOCABS, NUM_DENSE),
        )


def test_stacked_mesh_step_matches_single_device():
    """stack_tables x row-sharded mesh (the config-5 collective-count
    optimization: ONE a2a set for all fields instead of one per field)
    must match the same stacked model on a single device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tfrec_tpu.configs import MeshConfig
    from tfrec_tpu.parallel.mesh import make_mesh
    from tfrec_tpu.parallel.step import ShardedTrainStepBuilder

    mesh = make_mesh(8, 1)
    spec = DataSpec.ctr(VOCABS, NUM_DENSE)
    mcfg = ModelConfig(name="dcn", embed_dim=8, num_cross_layers=2,
                       mlp_dims=(16,), stack_tables=True)
    ocfg = OptimConfig(learning_rate=0.01, dense_optimizer="adam",
                       sparse_optimizer="rowwise_adagrad")
    model = build_model(mcfg, spec)
    b_ref = TrainStepBuilder(model, "logloss", ocfg)
    s_ref = b_ref.init_state(jax.random.PRNGKey(0))
    # f32 wire: exact layout equivalence (the bf16-wire default is
    # quality-banded separately — QUALITY_BANDS.json).
    b_sh = ShardedTrainStepBuilder(
        model, "logloss", ocfg, mesh, MeshConfig(a2a_dtype="float32")
    )
    s_sh = b_sh.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(3)
    step_ref = jax.jit(b_ref.step)
    step_sh = None
    for i in range(3):
        batch = _batch(rng)
        s_ref, m_ref = step_ref(s_ref, batch)
        bs = {
            k: jax.device_put(
                v, NamedSharding(mesh, P("data", *([None] * (v.ndim - 1))))
            )
            for k, v in batch.items()
        }
        if step_sh is None:
            step_sh = b_sh.compile_step(s_sh, bs)
        s_sh, m_sh = step_sh(s_sh, bs)
        assert int(m_sh["lookup_overflow"]) == 0
        np.testing.assert_allclose(
            float(m_ref["loss"]), float(m_sh["loss"]), rtol=1e-5
        )
    ut = b_sh.unpadded_tables(s_sh)
    for name in s_ref["tables"]:
        np.testing.assert_allclose(
            np.asarray(ut[name]), np.asarray(s_ref["tables"][name]),
            rtol=2e-4, atol=1e-5,
        )
