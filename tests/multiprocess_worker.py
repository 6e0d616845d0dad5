"""Worker for the multi-process (multi-controller) tests: N processes own
8/N virtual CPU devices each; together they form an 8-device mesh and run
the full sharded Trainer (SURVEY.md §4 "Multi-host" row) or the
cross-topology checkpoint save/restore phases.

Usage: python multiprocess_worker.py <coordinator> <num_procs> <proc_id> <out_json>
                                     [criteo:<tsv_path> | ckptsave:<dir> |
                                      ckptrestore:<dir>]
"""

import json
import os
import sys


def _ckpt_builder_state(key: int, n_data: int = 8):
    """Deterministic tiny sharded DCN state on the live n_data-device mesh
    — shared by the save and restore phases so templates match
    structurally while values differ by ``key``. A non-default ``n_data``
    exercises the DEVICE-count (vocab-padding) leg of cross-topology
    restore: pad_vocab(30, 4) = 32 but pad_vocab(30, 8) = 64."""
    import jax

    from tfrec_tpu.configs import MeshConfig, ModelConfig, OptimConfig
    from tfrec_tpu.models import DataSpec, build_model
    from tfrec_tpu.parallel.mesh import make_mesh
    from tfrec_tpu.parallel.step import ShardedTrainStepBuilder

    mesh = make_mesh(n_data, 1)
    model = build_model(
        ModelConfig(name="dcn", embed_dim=8, num_cross_layers=2,
                    mlp_dims=(8,), lane_pack=False),
        DataSpec.ctr((50, 30, 20), num_dense=2),
        sharded_tables=True,
    )
    builder = ShardedTrainStepBuilder(
        model, "logloss", OptimConfig(learning_rate=0.01), mesh, MeshConfig()
    )
    return mesh, builder, builder.init_state(jax.random.PRNGKey(key))


def _bump(state):
    """Deterministic non-identity transform so a restored state can never
    be mistaken for a fresh template."""
    import jax

    def one(leaf):
        fn = (
            (lambda x: x * 1.7 + 0.3)
            if leaf.dtype.kind == "f" else (lambda x: x + 3)
        )
        return jax.jit(fn, out_shardings=getattr(leaf, "sharding", None))(leaf)

    return jax.tree_util.tree_map(one, state)


def _replicated_np(mesh, leaf):
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    return np.asarray(
        jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(leaf)
    )


def _flat_np(mesh, state):
    from tfrec_tpu.utils.checkpoint import _flatten

    return {
        k: _replicated_np(mesh, v) for k, v in _flatten(state).items()
    }


def _ckpt_save(ckpt_dir: str, proc_id: str) -> int:
    from tfrec_tpu.utils.checkpoint import save_checkpoint

    mesh, _, state = _ckpt_builder_state(0)
    state = _bump(state)
    save_checkpoint(ckpt_dir, 1, state)
    # Replication is a COLLECTIVE: every process must participate, even
    # though only process 0 writes the ground-truth file.
    flat = _flat_np(mesh, state)
    if int(proc_id) == 0:
        import numpy as np

        np.savez(os.path.join(ckpt_dir, "ground_truth.npz"), **flat)
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("ground_truth")
    return 0


def _ckpt_restore(ckpt_dir: str) -> int:
    """Restore the (possibly different-process-count) checkpoint into a
    fresh template and compare every leaf bitwise to the saver's ground
    truth."""
    import numpy as np

    from tfrec_tpu.utils.checkpoint import _flatten, restore_checkpoint

    mesh, _, template = _ckpt_builder_state(7)  # different values than save
    restored = restore_checkpoint(ckpt_dir, template)
    gt = np.load(os.path.join(ckpt_dir, "ground_truth.npz"))
    flat = _flatten(restored)
    assert set(flat) == set(gt.files), (sorted(flat), sorted(gt.files))
    for k, v in flat.items():
        np.testing.assert_array_equal(
            _replicated_np(mesh, v), gt[k], err_msg=k
        )
    return 0


def main() -> int:
    coordinator, num_procs, proc_id, out_json = sys.argv[1:5]
    mode = sys.argv[5] if len(sys.argv) > 5 else "mf"
    local_devices = 8 // int(num_procs)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_procs),
        process_id=int(proc_id),
    )
    assert jax.device_count() == 8, jax.devices()
    assert len(jax.local_devices()) == local_devices

    from tfrec_tpu.configs import (
        Config, DataConfig, ModelConfig, OptimConfig, TrainConfig,
    )
    from tfrec_tpu.train.trainer import Trainer
    from tfrec_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    if mode.startswith("criteo:"):
        return _criteo_streaming(mode.split(":", 1)[1], proc_id, out_json)
    if mode.startswith("ckptsave:"):
        return _ckpt_save(mode.split(":", 1)[1], proc_id)
    if mode.startswith("ckptrestore:"):
        return _ckpt_restore(mode.split(":", 1)[1])
    if mode.startswith("config5:"):
        _, workdir, phase = mode.split(":", 2)
        return _config5(workdir, phase, proc_id, out_json)

    cfg = Config(
        data=DataConfig(
            source="synthetic_implicit", num_users=64, num_items=128,
            interactions_per_user=12, seed=0,
        ),
        model=ModelConfig(name="mf", embed_dim=16),
        optim=OptimConfig(learning_rate=0.05, sparse_optimizer="rowwise_adagrad"),
        train=TrainConfig(
            batch_size=128, epochs=2, eval_every_epochs=2, eval_topk=(20,),
            loss="bpr", log_every_steps=100,
        ),
    )
    trainer = Trainer(cfg, quiet=True)
    assert trainer.mesh is not None
    history = trainer.train()

    # Sharded checkpoint roundtrip across processes.
    ckpt_dir = os.path.join(os.path.dirname(out_json), "ckpt")
    save_checkpoint(ckpt_dir, 2, trainer.state)
    restored = restore_checkpoint(ckpt_dir, trainer.state)
    import numpy as np

    from tfrec_tpu.utils.checkpoint import _local_block

    for a, b in zip(
        jax.tree_util.tree_leaves(trainer.state),
        jax.tree_util.tree_leaves(restored),
    ):
        np.testing.assert_array_equal(_local_block(a), _local_block(b))

    final = history[-1]
    if int(proc_id) == 0:
        with open(out_json, "w") as f:
            json.dump(final, f, default=float)
    return 0


def config5_config(workdir: str, epochs: int, resume: bool):
    """The config-5 rehearsal program (BASELINE.json:11 scaled to CI): DCN
    CTR training on sharded row tables + a2a lookups, synthetic Criteo-
    shaped data, periodic sharded checkpoints. Shared by every leg
    (4-proc train, 2-proc resized resume, 1-proc oracle) so the only
    variable is the topology."""
    from tfrec_tpu.configs import (
        Config, DataConfig, MeshConfig, ModelConfig, OptimConfig, TrainConfig,
    )

    return Config(
        run_name="config5_rehearsal",
        data=DataConfig(
            source="synthetic_ctr", num_examples=30_000,
            num_dense_features=4, categorical_vocab_sizes=(500,) * 6,
            test_fraction=0.05, seed=3,
        ),
        model=ModelConfig(name="dcn", embed_dim=16, num_cross_layers=2,
                          mlp_dims=(32, 16), lane_pack=False),
        optim=OptimConfig(learning_rate=0.003, dense_optimizer="adam",
                          sparse_optimizer="rowwise_adagrad",
                          sparse_learning_rate=0.05),
        train=TrainConfig(
            batch_size=512, epochs=epochs, loss="logloss",
            eval_every_epochs=epochs, steps_per_dispatch=2,
            checkpoint_dir=os.path.join(workdir, "ckpt"),
            checkpoint_every_epochs=1, resume=resume, log_every_steps=0,
        ),
        mesh=MeshConfig(table_sharding="row"),
    )


def _config5(workdir: str, phase: str, proc_id: str, out_json: str) -> int:
    """One leg of the config-5 end-to-end rehearsal (VERDICT r4 item 5):
    phase 'train4' = sharded DCN training with mid-run checkpoints at 4
    processes; phase 'resume2' = restore that checkpoint at 2 processes
    (resized restart), train further, then CTR eval AND a sharded top-k
    retrieval eval on the LIVE restored shards vs a full-sort oracle."""
    import jax
    import numpy as np

    from tfrec_tpu.train.trainer import Trainer

    if phase == "train4":
        trainer = Trainer(config5_config(workdir, epochs=2, resume=False),
                          quiet=True)
        assert trainer.mesh is not None
        history = trainer.train()
        if int(proc_id) == 0:
            with open(out_json, "w") as f:
                json.dump(dict(history[-1]), f, default=float)
        return 0

    assert phase == "resume2", phase
    trainer = Trainer(config5_config(workdir, epochs=4, resume=True),
                      quiet=True)
    assert trainer.mesh is not None
    # The resized restart really restored the 4-process checkpoint: the
    # run continues from epoch 2, it does not start over.
    assert trainer.start_epoch == 2, trainer.start_epoch
    history = trainer.train()
    final = dict(history[-1])

    # Sharded top-k retrieval on the LIVE restored row shards (the
    # config-5 "DCN + retrieval" leg): score users against field_0's
    # embedding rows, exact method, vs a replicated full-sort oracle.
    from tfrec_tpu.parallel.topk import sharded_topk_dot

    plan = trainer.builder.plans["field_0"]
    table = trainer.state["tables"]["field_0"]  # [V_pad, D] sharded
    v = plan.vocab
    rng = np.random.default_rng(0)
    users = jax.numpy.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    vals, ids = jax.jit(
        lambda u, t: sharded_topk_dot(trainer.mesh, u, t, 10, v,
                                      method="exact")
    )(users, table)
    # Oracle on the replicated LOGICAL table.
    logical = np.asarray(_replicated_np(trainer.mesh,
                                        trainer.builder.unpadded_tables(
                                            trainer.state)["field_0"]))
    scores = np.asarray(users) @ logical.T
    want_vals = np.sort(scores, axis=1)[:, ::-1][:, :10]
    got_vals = np.asarray(_replicated_np(trainer.mesh, vals))
    got_ids = np.asarray(_replicated_np(trainer.mesh, ids))
    np.testing.assert_allclose(got_vals, want_vals, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.take_along_axis(scores, got_ids, axis=1), want_vals,
        rtol=1e-5, atol=1e-5,
    )
    final["topk_parity"] = 1.0
    final["resumed_from_epoch"] = 2
    if int(proc_id) == 0:
        with open(out_json, "w") as f:
            json.dump(final, f, default=float)
    return 0


def _criteo_streaming(tsv_path: str, proc_id: str, out_json: str) -> int:
    """2-process Criteo STREAMING run (VERDICT r1 item 5): each process
    streams its own round-robin stripe of per-process batches from the one
    TSV; sharded tables + a2a lookups; CTR eval at the end."""
    from tfrec_tpu.configs import (
        Config, DataConfig, ModelConfig, OptimConfig, TrainConfig,
    )
    from tfrec_tpu.train.trainer import Trainer

    cfg = Config(
        data=DataConfig(
            source="criteo", path=tsv_path, streaming=True,
            eval_examples=200, num_examples=1200,
            categorical_vocab_sizes=(500,),
        ),
        model=ModelConfig(name="dcn", embed_dim=4, num_cross_layers=2,
                          mlp_dims=(8,)),
        optim=OptimConfig(learning_rate=0.01),
        train=TrainConfig(batch_size=128, epochs=1, eval_every_epochs=1,
                          loss="logloss", log_every_steps=0),
    )
    trainer = Trainer(cfg, quiet=True)
    assert trainer.mesh is not None
    assert trainer.stream.num_shards == 2
    history = trainer.train()
    final = dict(history[-1])
    final["global_step"] = trainer.global_step
    # 1000 train examples / 64 per process = 15 local batches -> 7 stripes.
    assert trainer.global_step == 7, trainer.global_step
    if int(proc_id) == 0:
        with open(out_json, "w") as f:
            json.dump(final, f, default=float)
    return 0


if __name__ == "__main__":
    sys.exit(main())
