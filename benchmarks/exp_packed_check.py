"""On-chip validation + interleaved A/B of the PACKED sub-128-lane kernels
(D=32, the flagship zoo-config-4/5 embed dim).

Three stages, each guarded (catches everything; exits 0):
1. correctness: packed gather vs XLA take; packed fused adagrad vs XLA
   apply (bf16-MXU caveat does not apply — these paths are VPU/DMA f32);
2. kernel-level interleaved timing: gather and sparse-update, xla vs packed;
3. full DCN d=32 train-step interleaved A/B (the decision metric for the
   kernels= default at d=32).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
# This experiment MEASURES the packed path, so force it on regardless of
# the policy default (which is off on hardware — it lost this very A/B).
_os.environ["TFREC_PACK_SUBDIM"] = "1"

import statistics
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np


def _correctness():
    from tfrec_tpu.kernels.gather_pallas import _packing, gather_pallas
    from tfrec_tpu.kernels.scatter_pallas import fused_rowwise_adagrad
    from tfrec_tpu.ops.embedding import combine_duplicate_ids
    from tfrec_tpu.ops.sparse_optim import make_sparse_optimizer

    rng = np.random.default_rng(0)
    V, D, N = 100_000, 32, 8192
    assert _packing(V, D) == 4, "packed path must be eligible at (100k, 32)"
    table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, V, N).astype(np.int32))

    got = jax.jit(gather_pallas)(table, ids)
    ref = jnp.take(table, ids, axis=0)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"packed gather d=32: maxerr={err:.7f} "
          f"{'OK' if err == 0.0 else 'MISMATCH'}", flush=True)

    opt = make_sparse_optimizer("rowwise_adagrad", adagrad_init=0.05)
    state = opt.init(table)
    grads = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    ref_t, ref_s = jax.jit(lambda t, s, i, g: opt.apply(t, s, i, g, 0.1))(
        table, state, ids, grads
    )
    uids, g = jax.jit(lambda i, gg: combine_duplicate_ids(i, gg, sentinel=V))(
        ids, grads
    )
    got_t, got_a = jax.jit(
        lambda t, a, u, gg: fused_rowwise_adagrad(t, a, u, gg, 0.1)
    )(table, state["acc"], uids, g)
    err_t = float(jnp.max(jnp.abs(got_t - ref_t)))
    err_a = float(jnp.max(jnp.abs(got_a - ref_s["acc"])))
    print(f"packed fused adagrad d=32: table maxerr={err_t:.6f} acc "
          f"maxerr={err_a:.6f} "
          f"{'OK' if err_t < 1e-3 and err_a < 1e-3 else 'MISMATCH'}",
          flush=True)
    return table, state, ids, grads, opt


def _kernel_timing(table, state, ids, grads, opt):
    from tfrec_tpu.kernels.gather_pallas import gather_pallas
    from tfrec_tpu.kernels.scatter_pallas import fused_rowwise_adagrad
    from tfrec_tpu.ops.embedding import combine_duplicate_ids

    V = table.shape[0]
    xla_gather = jax.jit(lambda t, i: jnp.take(t, i, axis=0, mode="clip"))
    pk_gather = jax.jit(gather_pallas)
    xla_apply = jax.jit(lambda t, s, i, g: opt.apply(t, s, i, g, 0.1))

    def packed_apply(t, a, i, gg):
        u, c = combine_duplicate_ids(i, gg, sentinel=V)
        return fused_rowwise_adagrad(t, a, u, c, 0.1)

    pk_apply = jax.jit(packed_apply)
    runs = {
        "gather_xla": lambda: xla_gather(table, ids),
        "gather_packed": lambda: pk_gather(table, ids),
        "update_xla": lambda: xla_apply(table, state, ids, grads),
        "update_packed": lambda: pk_apply(table, state["acc"], ids, grads),
    }
    times = {k: [] for k in runs}
    for run in runs.values():  # compile
        jax.block_until_ready(run())
    for _ in range(5):  # interleaved rounds
        for name, run in runs.items():
            t0 = time.perf_counter()
            for _ in range(20):
                out = run()
            jax.block_until_ready(out)
            times[name].append((time.perf_counter() - t0) / 20)
    for name, ts in times.items():
        print(f"kernel {name}: median {statistics.median(ts)*1e6:.1f} us "
              f"(blocks us: {', '.join(f'{t*1e6:.0f}' for t in ts)})",
              flush=True)


def _full_step_ab():
    sys.path.insert(0, ".")
    from bench import build_dcn_bench

    batch, d = 8192, 32
    variants = {}
    for name in ("xla", "pallas"):
        step, state, batches, _ = build_dcn_bench(batch, name, d)
        for i in range(3):
            state, m = step(state, batches[i % len(batches)])
        jax.block_until_ready(m["loss"])
        variants[name] = [step, state, batches, []]
    for _ in range(5):
        for name, slot in variants.items():
            step, state, batches, times = slot
            t0 = time.perf_counter()
            for i in range(10):
                state, m = step(state, batches[i % len(batches)])
            jax.block_until_ready(m["loss"])
            slot[1] = state
            times.append(10 * batch / (time.perf_counter() - t0))
    for name, (_, _, _, times) in variants.items():
        print(f"AB d=32 {name}: median {statistics.median(times)/1e6:.2f}M ex/s "
              f"(blocks: {', '.join(f'{t/1e6:.1f}' for t in times)})",
              flush=True)


def main() -> int:
    try:
        args = _correctness()
    except Exception:
        print("packed correctness EXCEPTION:", flush=True)
        traceback.print_exc()
        return 0
    try:
        _kernel_timing(*args)
    except Exception:
        print("packed kernel timing EXCEPTION:", flush=True)
        traceback.print_exc()
    try:
        _full_step_ab()
    except Exception:
        print("packed full-step AB EXCEPTION:", flush=True)
        traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
