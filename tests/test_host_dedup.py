"""Host-precomputed dedup sorts (train.host_dedup): the input pipeline
ships each table's STABLE argsort with the batch and the device step
skips its per-table argsort — the most expensive sparse-path op
(docs/PERF.md "In-situ step attribution"). Must be bit-identical to the
device-sort path (both sorts are stable), across layouts and bag widths."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfrec_tpu.configs import (
    Config, DataConfig, MeshConfig, ModelConfig, OptimConfig, TrainConfig,
)
from tfrec_tpu.models import DataSpec, build_model
from tfrec_tpu.train.step import TrainStepBuilder, host_dedup_sorts
from tfrec_tpu.train.trainer import run

OPT = OptimConfig(learning_rate=0.01, dense_optimizer="adam",
                  sparse_optimizer="rowwise_adagrad",
                  sparse_learning_rate=0.05, adagrad_init=0.1)


def _ctr_batch(rng, spec, b):
    cols = []
    for v, w in zip(spec.field_vocabs, spec.field_widths or (1,) * len(spec.field_vocabs)):
        ids = rng.integers(0, v, (b, w)).astype(np.int32)
        if w > 1:
            keep = rng.integers(1, w + 1, b)
            ids[np.arange(w)[None, :] >= keep[:, None]] = v
        cols.append(ids)
    return {
        "dense": rng.normal(size=(b, spec.num_dense)).astype(np.float32),
        "cat": np.concatenate(cols, axis=1),
        "label": rng.integers(0, 2, b).astype(np.float32),
    }


@pytest.mark.parametrize("lane_pack", [False, True])
def test_host_sorts_bit_identical_to_device_sorts(lane_pack):
    spec = DataSpec.ctr((300, 120, 80, 50), num_dense=3,
                        field_widths=(1, 3, 1, 2))
    cfg = ModelConfig(name="dcn", embed_dim=32, mlp_dims=(16,),
                      num_cross_layers=2, lane_pack=lane_pack)
    m = build_model(cfg, spec)
    b = TrainStepBuilder(m, "logloss", OPT, seed=3)
    s_dev = b.init_state(jax.random.PRNGKey(0))
    s_host = jax.tree_util.tree_map(lambda x: x, s_dev)
    step = jax.jit(b.step)
    rng = np.random.default_rng(0)
    for i in range(3):
        host_b = _ctr_batch(rng, spec, 64)
        sorts = host_dedup_sorts(m, host_b)
        # the sort keys name exactly the model's tables
        assert set(sorts) == {f"_sort_{k}" for k in m.lookup_ids(
            {k: jnp.asarray(v) for k, v in host_b.items()})}
        plain = {k: jnp.asarray(v) for k, v in host_b.items()}
        with_sorts = {**plain,
                      **{k: jnp.asarray(v) for k, v in sorts.items()}}
        s_dev, m_dev = step(s_dev, plain)
        s_host, m_host = step(s_host, with_sorts)
        assert float(m_dev["loss"]) == float(m_host["loss"]), i
    for name in s_dev["tables"]:
        np.testing.assert_array_equal(
            np.asarray(s_dev["tables"][name]),
            np.asarray(s_host["tables"][name]), err_msg=name,
        )
        for leaf in s_dev["sparse_opt"][name]:
            np.testing.assert_array_equal(
                np.asarray(s_dev["sparse_opt"][name][leaf]),
                np.asarray(s_host["sparse_opt"][name][leaf]),
                err_msg=f"{name}/{leaf}",
            )


def test_trainer_host_dedup_matches_and_mesh_ignores():
    base = Config(
        data=DataConfig(source="synthetic_ctr", num_examples=6_000,
                        num_dense_features=3,
                        categorical_vocab_sizes=(60, 40, 30, 20),
                        test_fraction=0.2, seed=5),
        model=ModelConfig(name="dcn", embed_dim=16, num_cross_layers=2,
                          mlp_dims=(16,)),
        optim=OptimConfig(learning_rate=0.01, dense_optimizer="adam"),
        train=TrainConfig(batch_size=256, epochs=3, eval_every_epochs=3,
                          loss="logloss"),
        mesh=MeshConfig(data_axis_size=0),
    )
    tr0, h0 = run(base, quiet=True)
    tr1, h1 = run(base.replace(
        train=dataclasses.replace(base.train, host_dedup=True)), quiet=True)
    assert tr1._host_dedup_on
    assert h1[-1]["loss"] == h0[-1]["loss"]
    assert h1[-1]["auc"] == h0[-1]["auc"]

    if jax.device_count() >= 8:
        trm, hm = run(base.replace(
            train=dataclasses.replace(base.train, host_dedup=True),
            mesh=MeshConfig(data_axis_size=8, a2a_dtype="float32")), quiet=True)
        # host_dedup silently gates OFF on the mesh path (ids re-bucket
        # inside the a2a; host orders would be stale) and training matches
        # the single-device run within sharded-reduction tolerance.
        assert trm.mesh is not None and not trm._host_dedup_on
        np.testing.assert_allclose(hm[-1]["loss"], h0[-1]["loss"], rtol=2e-4)


def test_host_dedup_with_steps_per_dispatch():
    """The stacked [K, B] multi-step path carries the sort arrays too."""
    cfg = Config(
        data=DataConfig(source="synthetic_ctr", num_examples=4_000,
                        num_dense_features=2,
                        categorical_vocab_sizes=(50, 30),
                        test_fraction=0.25, seed=6),
        model=ModelConfig(name="deepfm", embed_dim=8, mlp_dims=(8,)),
        optim=OptimConfig(learning_rate=0.02),
        train=TrainConfig(batch_size=250, epochs=2, eval_every_epochs=2,
                          loss="logloss", host_dedup=True,
                          steps_per_dispatch=3),
        mesh=MeshConfig(data_axis_size=0),
    )
    tr, hist = run(cfg, quiet=True)
    assert tr._host_dedup_on
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["auc"] > 0.55, hist[-1]
