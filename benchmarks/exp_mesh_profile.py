"""Profile 3 steps of the (1,1) row vs gspmd step on TPU; print top ops.

Follow-up to exp_mesh_hlo: the row step's TPU HLO contains ~38x more
sort-related text than gspmd's and measures a flat ~29 ms overhead that
op-knockouts cannot attribute. A device trace names the guilty ops
directly. Parses the generated perfetto trace (device tracks only) and
prints the top-20 op names by total duration, per variant.

Catches everything; exits 0. Run via tpu_experiments --only mesh_profile.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import glob
import traceback

import jax

D = int(_os.environ.get("BREAKDOWN_DIM", "32"))
B = int(_os.environ.get("BREAKDOWN_BATCH", "8192"))
VOCABS = (100_000,) * 26
NUM_DENSE = 13


def build(sharding: str):
    import jax.numpy as jnp
    import numpy as np

    from tfrec_tpu.configs import MeshConfig, ModelConfig, OptimConfig
    from tfrec_tpu.models import DataSpec, build_model
    from tfrec_tpu.parallel.mesh import make_mesh
    from tfrec_tpu.parallel.step import ShardedTrainStepBuilder

    mesh = make_mesh(1, 1)
    model = build_model(
        ModelConfig(name="dcn", embed_dim=D, num_cross_layers=3,
                    mlp_dims=(512, 256, 128), lane_pack=False),
        DataSpec.ctr(VOCABS, NUM_DENSE), sharded_tables=True, batch_size=B)
    b = ShardedTrainStepBuilder(
        model, "logloss",
        OptimConfig(learning_rate=1e-3, dense_optimizer="adam",
                    sparse_optimizer="rowwise_adagrad",
                    sparse_learning_rate=0.02),
        mesh, MeshConfig(table_sharding=sharding, a2a_dtype="float32"))
    state = b.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {
        "dense": jnp.asarray(rng.normal(size=(B, NUM_DENSE)).astype(np.float32)),
        "cat": jnp.asarray(rng.integers(0, 100_000, (B, 26)).astype(np.int32)),
        "label": jnp.asarray(rng.integers(0, 2, B).astype(np.float32)),
    }
    sh = b.batch_shardings(batch)
    db = {k: jax.device_put(v, sh[k]) for k, v in batch.items()}
    step = jax.jit(
        b.step, in_shardings=(b.state_shardings(state), sh),
    )
    return step, state, db


def top_ops(trace_dir):
    """Product parser (utils/profile.top_device_ops); None if no trace."""
    from tfrec_tpu.utils.profile import top_device_ops

    try:
        return [(n, d) for n, d, _ in top_device_ops(trace_dir, k=20)]
    except FileNotFoundError:
        return None


def main() -> int:
    try:
        for sharding in ("row", "gspmd"):
            step, state, db = build(sharding)
            _, m = step(state, db)
            float(m["loss"])  # compile + warm
            trace_dir = f"/tmp/mesh_profile_{sharding}"
            with jax.profiler.trace(trace_dir, create_perfetto_trace=True):
                for _ in range(3):
                    _, m = step(state, db)
                    float(m["loss"])
            print(f"=== {sharding}: top device ops (3 steps, us)", flush=True)
            ops = top_ops(trace_dir)
            if ops is None:
                print("  no perfetto trace found; files:",
                      glob.glob(trace_dir + "/**/*", recursive=True)[:10],
                      flush=True)
            else:
                for name, dur in ops:
                    print(f"  {dur:12.0f}  {name[:90]}", flush=True)
    except Exception:
        traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
