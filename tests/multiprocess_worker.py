"""Worker for the multi-process (multi-controller) test: each process owns
4 virtual CPU devices; together they form an 8-device mesh and run the full
sharded Trainer (SURVEY.md §4 "Multi-host" row).

Usage: python multiprocess_worker.py <coordinator> <num_procs> <proc_id> <out_json>
                                     [criteo:<tsv_path>]
"""

import json
import os
import sys


def main() -> int:
    coordinator, num_procs, proc_id, out_json = sys.argv[1:5]
    mode = sys.argv[5] if len(sys.argv) > 5 else "mf"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
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
    assert len(jax.local_devices()) == 4

    from tfrec_tpu.configs import (
        Config, DataConfig, ModelConfig, OptimConfig, TrainConfig,
    )
    from tfrec_tpu.train.trainer import Trainer
    from tfrec_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    if mode.startswith("criteo:"):
        return _criteo_streaming(mode.split(":", 1)[1], proc_id, out_json)

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
