"""On-chip correctness + timing for the fused rowwise-Adagrad kernel
(D=128 lane-aligned path) vs the XLA apply. Catches everything; exits 0."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    from tfrec_tpu.kernels.scatter_pallas import fused_rowwise_adagrad
    from tfrec_tpu.ops.embedding import combine_duplicate_ids
    from tfrec_tpu.ops.sparse_optim import make_sparse_optimizer

    rng = np.random.default_rng(0)
    V, D, N = 100_000, 128, 8192
    table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    opt = make_sparse_optimizer("rowwise_adagrad", adagrad_init=0.05)
    state = opt.init(table)
    ids = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
    grads = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    try:
        ref_t, ref_s = jax.jit(lambda t, s, i, g: opt.apply(t, s, i, g, 0.1))(
            table, state, ids, grads
        )
        uids, g = jax.jit(
            lambda i, gg: combine_duplicate_ids(i, gg, sentinel=V)
        )(ids, grads)
        fused = jax.jit(lambda t, a, u, gg: fused_rowwise_adagrad(t, a, u, gg, 0.1))
        got_t, got_a = fused(table, state["acc"], uids, g)
        err_t = float(jnp.max(jnp.abs(got_t - ref_t)))
        err_a = float(jnp.max(jnp.abs(got_a - ref_s["acc"])))
        print(f"fused adagrad: table maxerr={err_t:.6f} acc maxerr={err_a:.6f} "
              f"{'OK' if err_t < 1e-3 and err_a < 1e-3 else 'MISMATCH'}", flush=True)

        # timing: XLA apply (includes dedup) vs dedup + fused
        xla_apply = jax.jit(lambda t, s, i, gg: opt.apply(t, s, i, gg, 0.1))
        def pallas_apply(t, a, i, gg):
            u, c = combine_duplicate_ids(i, gg, sentinel=V)
            return fused_rowwise_adagrad(t, a, u, c, 0.1)
        pallas_jit = jax.jit(pallas_apply)
        for name, run in [
            ("xla", lambda: xla_apply(table, state, ids, grads)),
            ("pallas", lambda: pallas_jit(table, state["acc"], ids, grads)),
        ]:
            jax.block_until_ready(run())
            t0 = time.perf_counter()
            for _ in range(30):
                out = run()
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 30
            print(f"sparse update {name}: {dt*1e6:.1f} us", flush=True)
    except Exception:
        print("fused adagrad EXCEPTION:", flush=True)
        traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
