"""Compile (no timing) the (1,1)-mesh row step ON TPU and print op stats.

The round-4 breakdown measured a flat ~29 ms overhead for the row-sharded
step vs single-device/gspmd at ONE device, invariant to region count
(fused vs 26+26) and to which half's machinery is present. On CPU the
partitioner removes the degenerate all-to-alls entirely; this experiment
asks what the TPU backend actually compiled: op histograms, table-sized
copies, and cost analysis for the row step vs the gspmd reference.

Catches everything; exits 0. Run via tpu_experiments --only mesh_hlo.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import re
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
    return jax.jit(
        b.step, in_shardings=(b.state_shardings(state), sh),
        donate_argnums=(0,),
    ).lower(state, db).compile()


def main() -> int:
    try:
        for sharding in ("row", "gspmd"):
            compiled = build(sharding)
            hlo = compiled.as_text()
            out_path = f"/tmp/mesh_hlo_{sharding}.txt"
            with open(out_path, "w") as f:
                f.write(hlo)
            print(f"=== {sharding}: hlo {len(hlo)} chars -> {out_path}",
                  flush=True)
            for pat in (r"all-to-all", r"collective-permute", r"all-reduce",
                        r"custom-call", r"copy-start", r"copy-done",
                        r"dynamic-update-slice", r"scatter", r"sort",
                        r"fusion"):
                print(f"  {pat}: {len(re.findall(pat, hlo))}", flush=True)
            big = re.findall(rf"f32\[100000,{D}\][^\n]*? copy\(", hlo)
            print(f"  table-sized copies: {len(big)}", flush=True)
            try:
                ca = compiled.cost_analysis()
                ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                for key in ("bytes accessed", "flops", "transcendentals"):
                    if key in ca:
                        print(f"  cost[{key}]: {ca[key]:.3e}", flush=True)
            except Exception as e:
                print(f"  cost_analysis failed: {type(e).__name__}", flush=True)
            # biggest fusions / ops by line share: show any op name that
            # appears with table-vocab shapes unusually often
            lines = [l for l in hlo.splitlines() if "100000" in l]
            hist = {}
            for l in lines:
                m = re.search(r"= \S+? (\w[\w-]*)\(", l)
                if m:
                    hist[m.group(1)] = hist.get(m.group(1), 0) + 1
            top = sorted(hist.items(), key=lambda kv: -kv[1])[:10]
            print(f"  ops touching vocab-dim shapes: {top}", flush=True)
    except Exception:
        traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
