"""Test harness: force an 8-device virtual CPU mesh before jax imports.

All sharding-correctness tests (SURVEY.md §4) run against real pjit/
shard_map/collectives on 8 fake CPU devices — no TPU needed. This must run
before anything imports jax, hence the env mutation at conftest import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Single-core CI box: avoid oversubscribed thread pools.
os.environ.setdefault("XLA_CPU_MULTI_THREAD_EIGEN", "false")
