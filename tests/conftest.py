"""Test harness: force an 8-device virtual CPU mesh.

All sharding-correctness tests (SURVEY.md §4) run against real pjit/
shard_map/collectives on 8 fake CPU devices — no TPU needed.

This environment's sitecustomize registers an "axon" TPU PJRT plugin in
EVERY python process and forcibly sets jax_platforms="axon,cpu" (overriding
the JAX_PLATFORMS env var), so the env-var trick alone is not enough: we
must update the jax config AFTER import, before any backend initializes.
Tests must not touch the real chip — TPU bf16 matmul precision breaks
exactness oracles and per-test compiles over the tunnel are too slow.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Single-core CI box: avoid oversubscribed thread pools.
os.environ.setdefault("XLA_CPU_MULTI_THREAD_EIGEN", "false")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
