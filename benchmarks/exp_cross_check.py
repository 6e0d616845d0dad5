"""On-chip correctness + timing for the fused cross-stack kernel.

Run via benchmarks/tpu_experiments.py. Catches everything; exits 0.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    from tfrec_tpu.kernels.cross import cross_stack_xla
    from tfrec_tpu.kernels.cross_pallas import cross_stack_pallas

    rng = np.random.default_rng(0)
    for b, d, layers in [(512, 845, 3), (8192, 896, 3)]:
        x0 = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
        params = {
            "w": jnp.asarray(rng.normal(size=(layers, d)).astype(np.float32)) / d**0.5,
            "b": jnp.asarray(rng.normal(size=(layers, d)).astype(np.float32)) * 0.1,
        }
        try:
            got = jax.jit(cross_stack_pallas)(x0, params)
            ref = jax.jit(cross_stack_xla)(x0, params)
            err = float(jnp.max(jnp.abs(got - ref)))
            print(f"cross fwd b={b} d={d}: maxerr={err:.5f} "
                  f"{'OK' if err < 0.05 else 'MISMATCH'}", flush=True)

            def lp(x, p):
                return jnp.sum(jnp.tanh(cross_stack_pallas(x, p)))

            def lx(x, p):
                return jnp.sum(jnp.tanh(cross_stack_xla(x, p)))

            gp = jax.jit(jax.grad(lp, argnums=(0, 1)))(x0, params)
            gx = jax.jit(jax.grad(lx, argnums=(0, 1)))(x0, params)
            bad = max(
                float(jnp.max(jnp.abs(a - b2)))
                for a, b2 in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gx))
            )
            print(f"cross bwd b={b} d={d}: maxerr={bad:.5f} "
                  f"{'OK' if bad < 0.1 else 'MISMATCH'}", flush=True)

            # timing
            fp = jax.jit(cross_stack_pallas)
            fx = jax.jit(cross_stack_xla)
            for name, f in [("pallas", fp), ("xla", fx)]:
                f(x0, params).block_until_ready()
                t0 = time.perf_counter()
                for _ in range(50):
                    out = f(x0, params)
                out.block_until_ready()
                dt = (time.perf_counter() - t0) / 50
                print(f"cross fwd {name} b={b} d={d}: {dt*1e6:.1f} us", flush=True)
        except Exception:
            print(f"cross b={b} d={d} EXCEPTION:", flush=True)
            traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
