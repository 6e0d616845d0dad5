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

    # v2 LOW-RANK fused kernel (round 4): correctness + interleaved A/B
    # timing vs the XLA reference at the flagship input width.
    from tfrec_tpu.kernels.cross_pallas import cross_stack_pallas_v2

    for b, d, r, layers in [(512, 845, 64, 3), (8192, 896, 64, 3)]:
        x0 = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
        params = {
            "u": jnp.asarray(rng.normal(size=(layers, d, r)).astype(np.float32)) / d**0.5,
            "v": jnp.asarray(rng.normal(size=(layers, d, r)).astype(np.float32)) / r**0.5,
            "b": jnp.asarray(rng.normal(size=(layers, d)).astype(np.float32)) * 0.1,
        }
        try:
            got = jax.jit(cross_stack_pallas_v2)(x0, params)
            ref = jax.jit(cross_stack_xla)(x0, params)
            err = float(jnp.max(jnp.abs(got - ref)))
            print(f"crossv2 fwd b={b} d={d} r={r}: maxerr={err:.5f} "
                  f"{'OK' if err < 0.05 else 'MISMATCH'}", flush=True)

            def lp2(x, p):
                return jnp.sum(jnp.tanh(cross_stack_pallas_v2(x, p)))

            def lx2(x, p):
                return jnp.sum(jnp.tanh(cross_stack_xla(x, p)))

            gp = jax.jit(jax.grad(lp2, argnums=(0, 1)))(x0, params)
            gx = jax.jit(jax.grad(lx2, argnums=(0, 1)))(x0, params)
            bad = max(
                float(jnp.max(jnp.abs(a - b2)))
                for a, b2 in zip(jax.tree_util.tree_leaves(gp),
                                 jax.tree_util.tree_leaves(gx))
            )
            print(f"crossv2 bwd b={b} d={d} r={r}: maxerr={bad:.5f} "
                  f"{'OK' if bad < 0.1 else 'MISMATCH'}", flush=True)

            # Interleaved A/B timing, fetch-fenced per dispatch (docs/
            # PERF.md "The fence artifact": block_until_ready can return
            # early on this relay and identical dispatches can be elided;
            # fetching a value that depends on the output is the only
            # trusted fence; the RTT constant is common to both arms so
            # the RATIO is load-bearing, the absolutes are upper bounds).
            # jnp.sum (not [0,0]): a single-element fetch would let XLA
            # slice-propagate the batch dim to 1 row in the reference arm
            # while the opaque pallas kernel still computes all of it.
            # The scalar `s` makes every dispatch unique (identical
            # dispatches can be elided on this relay — docs/PERF.md).
            fp = jax.jit(lambda x, p, s: jnp.sum(cross_stack_pallas_v2(x * s, p)))
            fx = jax.jit(lambda x, p, s: jnp.sum(cross_stack_xla(x * s, p)))
            float(fp(x0, params, 1.0)); float(fx(x0, params, 1.0))  # compile
            tp = tx = 0.0
            for k in range(25):
                s = 1.0 + 1e-6 * (k + 1)
                t0 = time.perf_counter()
                float(fp(x0, params, s))
                tp += time.perf_counter() - t0
                t0 = time.perf_counter()
                float(fx(x0, params, s))
                tx += time.perf_counter() - t0
            print(f"crossv2 fwd b={b} d={d} r={r}: pallas={tp/25*1e6:.1f} us "
                  f"xla={tx/25*1e6:.1f} us ratio={tx/max(tp,1e-12):.2f}x",
                  flush=True)

            # Interleaved fwd+bwd timing (the training-step shape): the
            # jitted fn returns grads reduced to one scalar, fetched each
            # dispatch — elision-proof and fenced.
            def _gsum(grad_fn):
                def f(x, p, s):
                    gx_, gp_ = grad_fn(x * s, p)
                    leaves = jax.tree_util.tree_leaves((gx_, gp_))
                    return sum(jnp.sum(l) for l in leaves)
                return jax.jit(f)

            gp_f = _gsum(jax.grad(lp2, argnums=(0, 1)))
            gx_f = _gsum(jax.grad(lx2, argnums=(0, 1)))
            float(gp_f(x0, params, 1.0)); float(gx_f(x0, params, 1.0))  # compile
            tp = tx = 0.0
            for k in range(25):
                s = 1.0 + 1e-6 * (k + 1)
                t0 = time.perf_counter()
                float(gp_f(x0, params, s))
                tp += time.perf_counter() - t0
                t0 = time.perf_counter()
                float(gx_f(x0, params, s))
                tx += time.perf_counter() - t0
            print(f"crossv2 fwdbwd b={b} d={d} r={r}: pallas={tp/25*1e6:.1f} us "
                  f"xla={tx/25*1e6:.1f} us ratio={tx/max(tp,1e-12):.2f}x",
                  flush=True)
        except Exception:
            print(f"crossv2 b={b} d={d} r={r} EXCEPTION:", flush=True)
            traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
