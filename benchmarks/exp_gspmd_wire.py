"""Compile-only inspection: what collectives does each table-sharding
mode emit on a REAL 8-device mesh? (The 1-chip gspmd speed comparison is
vacuous — with local data the partitioner emits no collectives at all.)

Counts all-gather / all-to-all / all-reduce ops and shapes in the
compiled step HLO for gspmd vs row mode. The recorded round-5 verdict
(docs/PERF.md "Why gspmd mode stays an A/B reference"): gspmd lowers the
sharded-table gather as raw-id all-gathers + per-position [B_global, D]
activation/grad all-reduces per table — wire scales with the UNDEDUPED
global batch, ~7x the explicit path's modeled flagship wire.

Runs on the virtual CPU mesh (no TPU needed):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/exp_gspmd_wire.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import re
import traceback

import jax

jax.config.update("jax_platforms", "cpu")

B = int(_os.environ.get("GSPMD_WIRE_BATCH", "64"))


def main() -> int:
    try:
        import jax.numpy as jnp
        import numpy as np

        from tfrec_tpu.configs import MeshConfig, ModelConfig, OptimConfig
        from tfrec_tpu.models import DataSpec, build_model
        from tfrec_tpu.parallel.mesh import make_mesh
        from tfrec_tpu.parallel.step import ShardedTrainStepBuilder

        assert len(jax.devices()) >= 8, (
            "needs 8 virtual devices: XLA_FLAGS="
            "--xla_force_host_platform_device_count=8"
        )
        mesh = make_mesh(8, 1)
        vocabs = (1024,) * 4
        spec = DataSpec.ctr(vocabs, num_dense=2)
        rng = np.random.default_rng(3)
        batch = {
            "dense": jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32)),
            "cat": jnp.asarray(np.stack(
                [rng.integers(0, v, B) for v in vocabs], 1).astype(np.int32)),
            "label": jnp.asarray(rng.integers(0, 2, B).astype(np.float32)),
        }
        for mode in ("gspmd", "row"):
            model = build_model(
                ModelConfig(name="dcn", embed_dim=32, mlp_dims=(16,),
                            num_cross_layers=2, lane_pack=False), spec)
            b = ShardedTrainStepBuilder(
                model, "logloss", OptimConfig(learning_rate=0.01), mesh,
                MeshConfig(table_sharding=mode))
            state = b.init_state(jax.random.PRNGKey(0))
            sh = b.batch_shardings(batch)
            db = {k: jax.device_put(v, sh[k]) for k, v in batch.items()}
            hlo = b.compile_step(state, db).lower(state, db).compile().as_text()
            counts = {}
            for m in re.finditer(
                r"(f32|s32|bf16)\[([\d,]+)\][^\n]*?"
                r"\b(all-gather|all-to-all|all-reduce|reduce-scatter)", hlo
            ):
                counts.setdefault((m.group(3), m.group(1), m.group(2)), 0)
                counts[(m.group(3), m.group(1), m.group(2))] += 1
            for (op, dt, shape), n in sorted(counts.items()):
                print(f"gspmd_wire {mode}: {op} {dt}[{shape}] x{n}",
                      flush=True)
    except Exception:
        traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
