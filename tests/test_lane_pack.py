"""Lane-packed CTR tables (model.lane_pack): P = 128/d fields share one
physical table's lane lines. The update math must be EXACTLY the
per-table rule (per-group accumulators), multi-hot bags and linear
tables must survive the layout change, the mesh path must agree with
the single-device path, and invalid combinations must refuse loudly."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfrec_tpu.configs import (
    Config, DataConfig, MeshConfig, ModelConfig, OptimConfig, TrainConfig,
)
from tfrec_tpu.models import DataSpec, build_model
from tfrec_tpu.train.step import TrainStepBuilder
from tfrec_tpu.train.trainer import run

OPT = OptimConfig(learning_rate=0.01, dense_optimizer="adam",
                  sparse_optimizer="rowwise_adagrad",
                  sparse_learning_rate=0.05, adagrad_init=0.1)


def _ctr_batch(rng, spec, b):
    cols = []
    for v, w in zip(spec.field_vocabs, spec.field_widths):
        ids = rng.integers(0, v, (b, w)).astype(np.int32)
        if w > 1:  # sentinel-pad a random tail of each bag
            keep = rng.integers(1, w + 1, b)
            ids[np.arange(w)[None, :] >= keep[:, None]] = v
        cols.append(ids)
    return {
        "dense": jnp.asarray(rng.normal(size=(b, spec.num_dense)).astype(np.float32)),
        "cat": jnp.asarray(np.concatenate(cols, axis=1)),
        "label": jnp.asarray(rng.integers(0, 2, b).astype(np.float32)),
    }


def _copy_leaves(dst: dict, src: dict, slot: int, d: int, vf: int):
    """Write one field's unpacked sparse-opt leaves into its packed slot:
    per-element leaves (adam m, [V, d]) land in the slot's d-lane group,
    per-row leaves (adagrad acc / adam v/t, [V]) in the slot's column of
    the per-group [V, G] state. Single-member packs (G == 1) keep plain
    per-row state."""
    for key, u in src.items():
        if u.ndim == 2:
            dst[key] = dst[key].at[:vf, slot * d : (slot + 1) * d].set(u)
        elif dst[key].ndim == 2:
            dst[key] = dst[key].at[:vf, slot].set(u)
        else:
            dst[key] = dst[key].at[:vf].set(u)


def _copy_into_packed(model_u, model_p, state_u, state_p):
    """Write the unpacked per-field tables + optimizer state into the
    packed layout so both steps start from identical logical parameters."""
    d = model_p.field_dims[0]
    tables = dict(state_p["tables"])
    sparse = {k: dict(v) for k, v in state_p["sparse_opt"].items()}
    for f in range(model_p.num_fields):
        vf = model_p.data_spec.field_vocabs[f]
        k, slot = model_p._pack_of[f]
        tables[f"pack_{k}"] = (
            tables[f"pack_{k}"]
            .at[:vf, slot * d : (slot + 1) * d]
            .set(state_u["tables"][f"field_{f}"])
        )
        _copy_leaves(sparse[f"pack_{k}"],
                     state_u["sparse_opt"][f"field_{f}"], slot, d, vf)
        if model_p.use_linear_tables:
            lk, ls = model_p._lin_pack_of[f]
            tables[f"linpack_{lk}"] = (
                tables[f"linpack_{lk}"]
                .at[:vf, ls : ls + 1]
                .set(state_u["tables"][f"lin_{f}"])
            )
            _copy_leaves(sparse[f"linpack_{lk}"],
                         state_u["sparse_opt"][f"lin_{f}"], ls, 1, vf)
    # Dense tower params/opt are layout-independent: share them too.
    return {
        **state_p, "tables": tables, "sparse_opt": sparse,
        "dense": state_u["dense"], "dense_opt": state_u["dense_opt"],
    }


def _assert_steps_match(name, spec, batch, steps=3, opt=OPT, **model_kw):
    cfg_u = ModelConfig(name=name, embed_dim=32, mlp_dims=(16,),
                        lane_pack=False, **model_kw)
    cfg_p = dataclasses.replace(cfg_u, lane_pack=True)
    m_u = build_model(cfg_u, spec)
    m_p = build_model(cfg_p, spec)
    b_u = TrainStepBuilder(m_u, "logloss", opt, seed=3)
    b_p = TrainStepBuilder(m_p, "logloss", opt, seed=3)
    s_u = b_u.init_state(jax.random.PRNGKey(0))
    s_p = _copy_into_packed(m_u, m_p, s_u, b_p.init_state(jax.random.PRNGKey(1)))
    step_u = jax.jit(b_u.step)
    step_p = jax.jit(b_p.step)
    for i in range(steps):
        s_u, mu = step_u(s_u, batch)
        s_p, mp = step_p(s_p, batch)
        np.testing.assert_allclose(
            float(mp["loss"]), float(mu["loss"]), rtol=1e-6,
            err_msg=f"step {i}",
        )
    d = m_p.field_dims[0]
    for f in range(m_p.num_fields):
        vf = spec.field_vocabs[f]
        k, slot = m_p._pack_of[f]
        np.testing.assert_allclose(
            np.asarray(s_p["tables"][f"pack_{k}"][:vf, slot * d : (slot + 1) * d]),
            np.asarray(s_u["tables"][f"field_{f}"]),
            rtol=1e-6, atol=1e-7, err_msg=f"field {f} table",
        )
        for key, u in s_u["sparse_opt"][f"field_{f}"].items():
            p = s_p["sparse_opt"][f"pack_{k}"][key]
            if u.ndim == 2:
                got = p[:vf, slot * d : (slot + 1) * d]
            elif p.ndim == 2:
                got = p[:vf, slot]
            else:  # single-member pack: plain per-row state
                got = p[:vf]
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(u), rtol=1e-6, atol=1e-7,
                err_msg=f"field {f} sparse_opt[{key}]",
            )
        if m_p.use_linear_tables:
            lk, ls = m_p._lin_pack_of[f]
            np.testing.assert_allclose(
                np.asarray(s_p["tables"][f"linpack_{lk}"][:vf, ls : ls + 1]),
                np.asarray(s_u["tables"][f"lin_{f}"]),
                rtol=1e-6, atol=1e-7, err_msg=f"field {f} linear",
            )


def test_lane_pack_dcn_updates_match_per_table_exactly():
    # Mixed vocabs exercise the max-vocab pack rows + sentinel remap.
    spec = DataSpec.ctr((300, 120, 80, 50, 200, 64, 33), num_dense=3)
    batch = _ctr_batch(np.random.default_rng(0), spec, 64)
    _assert_steps_match("dcn", spec, batch, num_cross_layers=2)


def test_lane_pack_fm_multihot_and_linear_match():
    spec = DataSpec.ctr((200, 90, 70), num_dense=0, field_widths=(1, 3, 2))
    batch = _ctr_batch(np.random.default_rng(1), spec, 48)
    _assert_steps_match("fm", spec, batch)


def test_lane_pack_trains_end_to_end_and_on_mesh():
    cfg = Config(
        data=DataConfig(source="synthetic_ctr", num_examples=6_000,
                        num_dense_features=4,
                        categorical_vocab_sizes=(60, 40, 30, 20, 50),
                        test_fraction=0.2, seed=1),
        model=ModelConfig(name="dcn", embed_dim=16, num_cross_layers=2,
                          mlp_dims=(16,), lane_pack=True),
        optim=OptimConfig(learning_rate=0.01, dense_optimizer="adam"),
        train=TrainConfig(batch_size=256, epochs=4, eval_every_epochs=4,
                          loss="logloss"),
        mesh=MeshConfig(data_axis_size=0),
    )
    _, hist = run(cfg, quiet=True)
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert 0.0 < hist[-1]["auc"] <= 1.0

    if jax.device_count() >= 8:
        mesh_cfg = dataclasses.replace(
            cfg, mesh=MeshConfig(data_axis_size=8, a2a_dtype="float32"))
        _, hist_m = run(mesh_cfg, quiet=True)
        np.testing.assert_allclose(hist_m[-1]["loss"], hist[-1]["loss"],
                                   rtol=2e-4)
        np.testing.assert_allclose(hist_m[-1]["auc"], hist[-1]["auc"],
                                   rtol=2e-4)


def test_lane_pack_auto_default():
    """ModelConfig.lane_pack=None (the default) packs exactly when it
    applies: CTR model, >=2 equal-dim fields, d < 128 dividing 128.
    Round 4: rowwise_adam now packs too (grouped adam state); sharded
    mesh runs stay UNPACKED on measured evidence (0.87-0.90x on-chip —
    exp_mesh_ab, docs/PERF.md "Round-4 decisions") though the lane-sliced
    a2a path is fully supported under explicit lane_pack=True."""
    spec = DataSpec.ctr((100, 80, 60), num_dense=2)
    m = build_model(ModelConfig(name="dcn", embed_dim=32, mlp_dims=(8,)), spec)
    assert m.lane_pack
    # d = 128: rows already fill their lane lines — no packing.
    m = build_model(ModelConfig(name="dcn", embed_dim=128, mlp_dims=(8,)), spec)
    assert not m.lane_pack
    # 48 does not divide 128 — auto silently keeps per-field tables
    # (explicit lane_pack=True at d=48 raises, tested below).
    m = build_model(ModelConfig(name="dcn", embed_dim=48, mlp_dims=(8,)), spec)
    assert not m.lane_pack
    # rowwise_adam now packs: grouped [V, G] moments + slot-derived touch
    # masks keep its math exactly the per-table rule.
    m = build_model(ModelConfig(name="dcn", embed_dim=32, mlp_dims=(8,)), spec)
    assert m.lane_pack  # auto no longer keys on the optimizer (grouped adam)
    # Mixed field dims cannot share a fixed-width slot layout.
    m = build_model(ModelConfig(name="dcn", embed_dim=32, mlp_dims=(8,),
                                field_dims=(32, 16, 32)), spec)
    assert not m.lane_pack
    # Single-field CTR gains nothing from packing.
    m = build_model(ModelConfig(name="dcn", embed_dim=32, mlp_dims=(8,)),
                    DataSpec.ctr((100,), num_dense=2))
    assert not m.lane_pack
    # Explicit False always wins over auto.
    m = build_model(ModelConfig(name="dcn", embed_dim=32, mlp_dims=(8,),
                                lane_pack=False), spec)
    assert not m.lane_pack
    # Sharded mesh runs stay unpacked under AUTO: the sharded update is
    # capacity-bounded (no V lane-line sweeps), so packing's dominant win
    # does not apply and the (id, slot) key handling measured 0.87-0.90x
    # on-chip (exp_mesh_ab 2026-08-20). Explicit True still packs (the
    # lane-sliced path — mesh equivalence tests above).
    m = build_model(ModelConfig(name="dcn", embed_dim=32, mlp_dims=(8,)), spec,
                    sharded_tables=True)
    assert not m.lane_pack
    m = build_model(ModelConfig(name="dcn", embed_dim=32, mlp_dims=(8,),
                                lane_pack=True), spec,
                    sharded_tables=True)
    assert m.lane_pack
    # (Column sharding is subsumed by the sharded exclusion above; the
    # builder still refuses explicit packed+col loudly — test below.)
    # b >= 32k PER CHIP: the P-fold-bigger dedup sorts eat the sweep
    # saving (measured tie at b=32768 — docs/PERF.md); auto stays unpacked.
    m = build_model(ModelConfig(name="dcn", embed_dim=32, mlp_dims=(8,)), spec,
                    batch_size=32768)
    assert not m.lane_pack
    m = build_model(ModelConfig(name="dcn", embed_dim=32, mlp_dims=(8,)), spec,
                    batch_size=8192)
    assert m.lane_pack
    # 2-field retrieval-capable FM: the sharded-topk/serving path
    # addresses per-field tables by name — auto skips packing.
    m = build_model(ModelConfig(name="fm", embed_dim=32),
                    DataSpec.ctr((100, 80), num_dense=0))
    assert not m.lane_pack and m.dot_decomposition() is not None
    # Non-CTR models pass through untouched.
    m = build_model(ModelConfig(name="mf", embed_dim=32),
                    DataSpec.interaction(50, 60))
    assert not hasattr(m, "lane_pack")


def test_lane_pack_init_is_layout_invariant():
    """Packed init draws the SAME per-field streams as per-field init:
    each logical table's block is bit-identical, so the auto default
    cannot shift a seeded run's starting point."""
    spec = DataSpec.ctr((200, 90, 70), num_dense=0, field_widths=(1, 3, 2))
    cfg_u = ModelConfig(name="fm", embed_dim=32, lane_pack=False)
    m_u = build_model(cfg_u, spec)
    m_p = build_model(dataclasses.replace(cfg_u, lane_pack=True), spec)
    key = jax.random.PRNGKey(7)
    p_u, p_p = m_u.init(key), m_p.init(key)
    d = m_p.field_dims[0]
    for f in range(m_p.num_fields):
        vf = spec.field_vocabs[f]
        k, slot = m_p._pack_of[f]
        np.testing.assert_array_equal(
            np.asarray(p_p["tables"][f"pack_{k}"][:vf, slot * d : (slot + 1) * d]),
            np.asarray(p_u["tables"][f"field_{f}"]),
            err_msg=f"field {f}",
        )
        lk, ls = m_p._lin_pack_of[f]
        np.testing.assert_array_equal(
            np.asarray(p_p["tables"][f"linpack_{lk}"][:vf, ls : ls + 1]),
            np.asarray(p_u["tables"][f"lin_{f}"]),
            err_msg=f"field {f} linear",
        )
    # Unused pack rows (above a member's vocab) are zeros.
    for k, grp in enumerate(m_p._packs):
        vp = max(spec.field_vocabs[f] for f in grp)
        for slot, f in enumerate(grp):
            vf = spec.field_vocabs[f]
            if vf < vp:
                block = np.asarray(
                    p_p["tables"][f"pack_{k}"][vf:, slot * d : (slot + 1) * d]
                )
                np.testing.assert_array_equal(block, 0.0)


def test_lane_pack_rowwise_adam_matches_per_table():
    """Grouped rowwise_adam ([V, G] second moments + slot-derived touch
    masks) reproduces the per-table adam trajectory: untouched pack-mate
    groups must not decay, touched groups must decay even on a zero
    gradient (VERDICT r3 item 8)."""
    spec = DataSpec.ctr((300, 120, 80, 50, 200), num_dense=3)
    batch = _ctr_batch(np.random.default_rng(5), spec, 64)
    opt = dataclasses.replace(OPT, sparse_optimizer="rowwise_adam")
    _assert_steps_match("dcn", spec, batch, num_cross_layers=2, opt=opt)


def test_lane_pack_rowwise_adam_multihot_linear():
    spec = DataSpec.ctr((200, 90, 70), num_dense=0, field_widths=(1, 3, 2))
    batch = _ctr_batch(np.random.default_rng(6), spec, 48)
    opt = dataclasses.replace(OPT, sparse_optimizer="rowwise_adam")
    _assert_steps_match("fm", spec, batch, opt=opt)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
@pytest.mark.parametrize("sparse_opt", ["rowwise_adagrad", "rowwise_adam"])
def test_lane_sliced_mesh_matches_single_device(sparse_opt):
    """The lane-sliced a2a path (RowShardedTable lane_groups > 1):
    packed row-sharded steps on an 8-device mesh reproduce the packed
    single-device trajectory — (id, slot) keys, d-lane wire, per-group
    optimizer state through the exchange (VERDICT r3 item 1)."""
    from tfrec_tpu.parallel.mesh import make_mesh
    from tfrec_tpu.parallel.step import ShardedTrainStepBuilder

    spec = DataSpec.ctr((96, 64, 40, 56), num_dense=2,
                        field_widths=(1, 2, 1, 1))
    cfg = ModelConfig(name="dcn", embed_dim=32, mlp_dims=(16,),
                      num_cross_layers=2, lane_pack=True)
    opt = dataclasses.replace(OPT, sparse_optimizer=sparse_opt)
    batch = _ctr_batch(np.random.default_rng(9), spec, 64)

    m_s = build_model(cfg, spec)
    b_s = TrainStepBuilder(m_s, "logloss", opt, seed=3)
    s_s = b_s.init_state(jax.random.PRNGKey(0))
    step_s = jax.jit(b_s.step)

    mesh = make_mesh(8, 1)
    m_m = build_model(cfg, spec)
    b_m = ShardedTrainStepBuilder(
        m_m, "logloss", opt, mesh, MeshConfig(a2a_dtype="float32"))
    assert any(
        getattr(p, "lane_groups", 1) > 1 for p in b_m.plans.values()
    ), "expected lane-sliced row plans"
    s_m = b_m.init_state(jax.random.PRNGKey(0))
    shardings = b_m.batch_shardings(batch)
    dev_batch = {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
    step_m = b_m.compile_step(s_m, dev_batch)

    for i in range(3):
        s_s, mu = step_s(s_s, batch)
        s_m, mm = step_m(s_m, dev_batch)
        assert int(mm["lookup_overflow"]) == 0
        np.testing.assert_allclose(
            float(mm["loss"]), float(mu["loss"]), rtol=1e-5,
            err_msg=f"step {i}",
        )
    for name, tbl in s_s["tables"].items():
        vf = tbl.shape[0]
        np.testing.assert_allclose(
            np.asarray(s_m["tables"][name][:vf]), np.asarray(tbl),
            rtol=1e-5, atol=1e-6, err_msg=name,
        )
        for key, u in s_s["sparse_opt"][name].items():
            np.testing.assert_allclose(
                np.asarray(s_m["sparse_opt"][name][key][:vf]),
                np.asarray(u), rtol=1e-5, atol=1e-6,
                err_msg=f"{name} sparse_opt[{key}]",
            )


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_lane_sliced_wire_moves_d_lanes():
    """HLO pin: the packed row-sharded step's all-to-alls carry d-lane
    payloads (plus the int32 key exchange), never the 128-lane packed
    row — the wire-volume contract of the lane-sliced design."""
    import re

    from tfrec_tpu.parallel.mesh import make_mesh
    from tfrec_tpu.parallel.step import ShardedTrainStepBuilder

    d = 32
    spec = DataSpec.ctr((128, 96, 80, 64), num_dense=2)
    cfg = ModelConfig(name="dcn", embed_dim=d, mlp_dims=(16,),
                      num_cross_layers=2, lane_pack=True)
    mesh = make_mesh(8, 1)
    model = build_model(cfg, spec)
    builder = ShardedTrainStepBuilder(mesh=mesh, mesh_cfg=MeshConfig(),
                                      model=model, loss_name="logloss",
                                      optim_cfg=OPT)
    state = builder.init_state(jax.random.PRNGKey(0))
    batch = _ctr_batch(np.random.default_rng(3), spec, 64)
    shardings = builder.batch_shardings(batch)
    dev_batch = {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
    lowered = jax.jit(
        builder.step,
        in_shardings=(builder.state_shardings(state), shardings),
    ).lower(state, dev_batch)
    hlo = lowered.compile().as_text()
    widths = set()
    for m in re.finditer(r"(?:f32|bf16)\[([\d,]+)\][^\n]*all-to-all", hlo):
        dims = [int(x) for x in m.group(1).split(",")]
        widths.add(dims[-1])
    assert widths, "expected float all-to-alls in the packed mesh step"
    assert widths == {d}, f"a2a payload widths {widths}, want {{{d}}}"
    spec = DataSpec.ctr((100, 80), num_dense=2)
    with pytest.raises(ValueError, match="dividing 128"):
        build_model(ModelConfig(name="dcn", embed_dim=48, mlp_dims=(8,),
                                lane_pack=True), spec)
    with pytest.raises(ValueError, match="mutually exclusive"):
        build_model(ModelConfig(name="dcn", embed_dim=32, mlp_dims=(8,),
                                lane_pack=True, stack_tables=True), spec)
    with pytest.raises(ValueError, match="equal per-field"):
        build_model(ModelConfig(name="dcn", embed_dim=32, mlp_dims=(8,),
                                field_dims=(32, 16), lane_pack=True), spec)


@pytest.mark.parametrize("gd", ["flat", True])
def test_group_dedup_routes_packed_adam_per_table(gd):
    """group_dedup grouped/flat + lane-packed rowwise_adam: the grouped
    combine carries no slot signal, so packed-adam tables must route
    through the per-table seam (review finding: this combination crashed
    at trace time — [V, G] moment state vs a bare [n] uids set). Pinned
    bitwise against group_dedup=False."""
    spec = DataSpec.ctr((96, 64, 40, 56), num_dense=2)
    cfg = ModelConfig(name="dcn", embed_dim=32, mlp_dims=(16,),
                      num_cross_layers=2, lane_pack=True)
    opt = dataclasses.replace(OPT, sparse_optimizer="rowwise_adam")
    batch = _ctr_batch(np.random.default_rng(9), spec, 64)
    res = {}
    for mode in (False, gd):
        model = build_model(cfg, spec)
        b = TrainStepBuilder(model, "logloss", opt, seed=3, group_dedup=mode)
        s = b.init_state(jax.random.PRNGKey(0))
        step = jax.jit(b.step)
        for _ in range(3):
            s, m = step(s, batch)
        res[mode] = (jax.device_get(s), float(m["loss"]))
    assert res[gd][1] == res[False][1]
    for n in res[False][0]["tables"]:
        np.testing.assert_array_equal(
            np.asarray(res[False][0]["tables"][n]),
            np.asarray(res[gd][0]["tables"][n]), err_msg=n)
