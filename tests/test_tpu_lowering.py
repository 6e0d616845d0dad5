"""TPU-lowering validation without TPU hardware.

``jax.export`` cross-platform lowering runs the full Mosaic lowering for
the TPU target on the CPU host, so Pallas block/tiling violations (e.g.
the (1, D) row-block gather that real TPU rejects) are caught in CI
instead of at first hardware contact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfrec_tpu.kernels import cross_pallas as cp_mod
from tfrec_tpu.kernels import gather_pallas as gp_mod


@pytest.fixture(autouse=True)
def _force_compiled(monkeypatch):
    # Lower the real (non-interpret) kernels for the TPU target.
    monkeypatch.setattr(gp_mod, "_interpret", lambda: False)
    monkeypatch.setattr(cp_mod, "_interpret", lambda: False)


def _lowers_for_tpu(fn, *args):
    jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)


@pytest.mark.parametrize("v,d,n", [(1000, 32, 8192), (50_000, 128, 4096), (97, 64, 33)])
def test_gather_pallas_lowers_for_tpu(v, d, n):
    table = jnp.zeros((v, d), jnp.float32)
    ids = jnp.zeros((n,), jnp.int32)
    _lowers_for_tpu(gp_mod.gather_pallas, table, ids)


@pytest.mark.parametrize("v,d", [(1000, 32), (1024, 64)])
def test_gather_packed_lowers_for_tpu(v, d, monkeypatch):
    """The opt-in packed group-row path (TFREC_PACK_SUBDIM=1) must lower
    for TPU at the sub-128 dims it serves."""
    monkeypatch.setenv("TFREC_PACK_SUBDIM", "1")
    assert gp_mod._packing(v, d) == 128 // d
    _lowers_for_tpu(gp_mod.gather_pallas, jnp.zeros((v, d), jnp.float32),
                    jnp.zeros((64,), jnp.int32))


@pytest.mark.parametrize("b,d,layers", [(512, 845, 3), (8192, 256, 2), (256, 77, 4)])
def test_cross_pallas_fwd_bwd_lower_for_tpu(b, d, layers):
    x0 = jnp.zeros((b, d), jnp.float32)
    params = {"w": jnp.zeros((layers, d)), "b": jnp.zeros((layers, d))}
    _lowers_for_tpu(cp_mod.cross_stack_pallas, x0, params)

    def loss(x, p):
        return jnp.sum(cp_mod.cross_stack_pallas(x, p))

    _lowers_for_tpu(jax.grad(loss, argnums=(0, 1)), x0, params)


@pytest.mark.parametrize("b,d,r,layers", [(512, 845, 64, 3), (256, 77, 16, 2)])
def test_cross_pallas_v2_lowrank_lowers_for_tpu(b, d, r, layers):
    """The fused rank-r DCN-v2 cross kernel (fwd + custom VJP) at the
    flagship Criteo input width (845) and an awkward sub-lane width."""
    x0 = jnp.zeros((b, d), jnp.float32)
    params = {
        "u": jnp.zeros((layers, d, r)),
        "v": jnp.zeros((layers, d, r)),
        "b": jnp.zeros((layers, d)),
    }
    _lowers_for_tpu(cp_mod.cross_stack_pallas_v2, x0, params)

    def loss(x, p):
        return jnp.sum(cp_mod.cross_stack_pallas_v2(x, p))

    _lowers_for_tpu(jax.grad(loss, argnums=(0, 1)), x0, params)


def test_full_dcn_pallas_step_lowers_for_tpu():
    """The whole single-device DCN train step with kernels=pallas."""
    from tfrec_tpu.configs import ModelConfig, OptimConfig
    from tfrec_tpu.models import DataSpec, build_model
    from tfrec_tpu.train.step import TrainStepBuilder

    vocabs = (1000,) * 4
    model = build_model(
        ModelConfig(name="dcn", embed_dim=32, num_cross_layers=2, mlp_dims=(64,)),
        DataSpec.ctr(vocabs, 13),
        backend="pallas",
    )
    builder = TrainStepBuilder(
        model, "logloss", OptimConfig(learning_rate=1e-3), kernels="pallas"
    )
    state = builder.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {
        "dense": jnp.asarray(rng.normal(size=(256, 13)).astype(np.float32)),
        "cat": jnp.asarray(
            np.stack([rng.integers(0, v, 256) for v in vocabs], 1).astype(np.int32)
        ),
        "label": jnp.asarray(rng.integers(0, 2, 256).astype(np.float32)),
    }
    _lowers_for_tpu(builder.step, state, batch)


def test_fused_adagrad_lowers_for_tpu(monkeypatch):
    from tfrec_tpu.kernels import scatter_pallas as sp_mod

    monkeypatch.setattr(sp_mod, "_interpret", lambda: False)
    # D must be a 128 multiple on real TPU (per-row DMA lane alignment).
    table = jnp.zeros((100_000, 128), jnp.float32)
    acc = jnp.zeros((100_000,), jnp.float32)
    uids = jnp.zeros((8192,), jnp.int32)
    grads = jnp.zeros((8192, 128), jnp.float32)
    _lowers_for_tpu(
        lambda t, a, u, g: sp_mod.fused_rowwise_adagrad(t, a, u, g, 0.1),
        table, acc, uids, grads,
    )

    # D=32 with a 4-aligned vocab routes through the PACKED group-row
    # kernel when opted in (TFREC_PACK_SUBDIM=1 — off by default on
    # hardware since XLA's gather won the measured A/B, docs/PERF.md)
    # and must still lower for TPU.
    monkeypatch.setenv("TFREC_PACK_SUBDIM", "1")
    _lowers_for_tpu(
        lambda t, a, u, g: sp_mod.fused_rowwise_adagrad(t, a, u, g, 0.1),
        jnp.zeros((100_000, 32)), jnp.zeros((100_000,)),
        jnp.zeros((8192,), jnp.int32), jnp.zeros((8192, 32)),
    )

    # Unpackable shapes raise a clear error instead of failing at Mosaic.
    with pytest.raises(ValueError, match="128"):
        _lowers_for_tpu(
            lambda t, a, u, g: sp_mod.fused_rowwise_adagrad(t, a, u, g, 0.1),
            jnp.zeros((130, 32)), jnp.zeros((130,)),  # 130 % 4 != 0
            jnp.zeros((8,), jnp.int32), jnp.zeros((8, 32)),
        )
