"""WRMF/ALS: the batched closed-form solve must equal the per-user dense
oracle, the trace-identity objective must equal brute force, sweeps must
decrease the exact objective monotonically, and the end-to-end model
must learn."""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from tfrec_tpu.configs import Config, DataConfig, MeshConfig, ModelConfig, TrainConfig
from tfrec_tpu.train.als import ALSTrainer, make_objective, make_sweep, padded_lists
from tfrec_tpu.train.trainer import run

ALPHA, REG = 5.0, 0.1


def _tiny(seed=0, nu=5, ni=7, nnz=16):
    rng = np.random.default_rng(seed)
    pairs = rng.choice(nu * ni, size=nnz, replace=False)
    users = (pairs // ni).astype(np.int32)
    items = (pairs % ni).astype(np.int32)
    return SimpleNamespace(
        num_users=nu, num_items=ni,
        train=SimpleNamespace(users=users, items=items),
    )


def _dense_p_c(ds):
    p = np.zeros((ds.num_users, ds.num_items), np.float64)
    p[ds.train.users, ds.train.items] = 1.0
    c = 1.0 + ALPHA * p
    return p, c


def test_user_solve_matches_dense_oracle():
    ds = _tiny()
    y = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (ds.num_items, 6))
    ).astype(np.float64)
    hist, _ = padded_lists(ds.train.users, ds.train.items, ds.num_users,
                           sentinel=ds.num_items)
    # batch=4 with 5 users exercises the all-sentinel padding rows.
    pad = np.full((3, hist.shape[1]), ds.num_items, np.int32)
    batches = jnp.asarray(
        np.concatenate([hist, pad]).reshape(2, 4, hist.shape[1])
    )
    x = np.asarray(make_sweep(ALPHA, REG)(jnp.asarray(y, jnp.float32), batches))
    p, c = _dense_p_c(ds)
    for u in range(ds.num_users):
        a = y.T @ np.diag(c[u]) @ y + REG * np.eye(y.shape[1])
        b = y.T @ (c[u] * p[u])
        np.testing.assert_allclose(x[u], np.linalg.solve(a, b), rtol=2e-4,
                                   atol=1e-5)
    np.testing.assert_allclose(x[5:], 0.0, atol=1e-6)  # padding rows


def test_objective_matches_bruteforce():
    ds = _tiny(seed=3)
    kx, ky = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (ds.num_users, 4))
    y = jax.random.normal(ky, (ds.num_items, 4))
    j = float(make_objective(ALPHA, REG)(
        x, y, jnp.asarray(ds.train.users), jnp.asarray(ds.train.items)
    ))
    p, c = _dense_p_c(ds)
    s = np.asarray(x, np.float64) @ np.asarray(y, np.float64).T
    brute = np.sum(c * (p - s) ** 2) + REG * (
        np.sum(np.asarray(x) ** 2.0) + np.sum(np.asarray(y) ** 2.0)
    )
    np.testing.assert_allclose(j, brute, rtol=1e-5)


def test_als_objective_decreases_monotonically():
    ds = _tiny(seed=5, nu=40, ni=60, nnz=400)
    als = ALSTrainer(ds, embed_dim=8, alpha=ALPHA, reg=REG, batch=16, seed=0)
    losses = [als.epoch()["loss"] for _ in range(6)]
    for a, b in zip(losses, losses[1:]):
        assert b <= a * (1 + 1e-6) + 1e-6, losses


def test_wrmf_learns_above_random_and_coerces_loss():
    cfg = Config(
        data=DataConfig(source="synthetic_implicit", num_users=256,
                        num_items=512, interactions_per_user=24, seed=1),
        # d=16: on this 256x512 synthetic set smaller ranks generalize
        # better (d=32 -> 0.11, d=64 -> 0.07, d=16 -> 0.13 recall@20).
        model=ModelConfig(name="wrmf", embed_dim=16, wrmf_alpha=10.0,
                          wrmf_reg=0.05),
        train=TrainConfig(batch_size=256, epochs=6, eval_every_epochs=6,
                          eval_topk=(20,), loss="bpr"),
        mesh=MeshConfig(data_axis_size=0),
    )
    t, hist = run(cfg, quiet=True)
    assert t.loss_name == "wrmf"
    losses = [h["loss"] for h in hist]
    assert losses[-1] < losses[0], losses
    # random recall@20 on 512 items ~ 0.039
    assert hist[-1]["recall@20"] > 0.12, hist[-1]


def test_als_sweep_sharded_equals_single_device():
    """Data-parallel ALS: the sweep with solve batches sharded over the
    8-device 'data' axis must reproduce the single-device solution (the
    per-row solves are independent; GSPMD only adds the final
    all-gather). Also the end-to-end mesh run matches the forced
    single-device run epoch by epoch."""
    import jax

    from tfrec_tpu.parallel.mesh import make_mesh
    from tfrec_tpu.train.als import ALSTrainer

    if jax.device_count() < 8:
        import pytest

        pytest.skip("needs the 8-device virtual mesh")
    ds = _tiny(seed=9, nu=70, ni=90, nnz=800)
    mesh = make_mesh(8, 1)
    a = ALSTrainer(ds, embed_dim=8, alpha=ALPHA, reg=REG, batch=16, seed=3)
    b = ALSTrainer(ds, embed_dim=8, alpha=ALPHA, reg=REG, batch=16, seed=3,
                   mesh=mesh)
    for _ in range(3):
        la = a.epoch()["loss"]
        lb = b.epoch()["loss"]
        np.testing.assert_allclose(lb, la, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(b.x), np.asarray(a.x),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.y), np.asarray(a.y),
                               rtol=2e-5, atol=1e-6)

    cfg = Config(
        data=DataConfig(source="synthetic_implicit", num_users=128,
                        num_items=256, interactions_per_user=12, seed=2),
        model=ModelConfig(name="wrmf", embed_dim=8),
        train=TrainConfig(batch_size=64, epochs=2, eval_every_epochs=2,
                          eval_topk=(10,), loss="wrmf"),
        mesh=MeshConfig(data_axis_size=8),
    )
    _, hist_mesh = run(cfg, quiet=True)
    import dataclasses

    cfg1 = dataclasses.replace(
        cfg, mesh=MeshConfig(data_axis_size=0))
    _, hist_1 = run(cfg1, quiet=True)
    np.testing.assert_allclose(hist_mesh[-1]["loss"], hist_1[-1]["loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(
        hist_mesh[-1]["recall@10"], hist_1[-1]["recall@10"], rtol=1e-6)
