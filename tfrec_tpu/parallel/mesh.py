"""Device-mesh construction (SURVEY.md §3d).

Axes:
- ``data``: batch parallelism. Dense params replicated; batch sharded.
- ``table`` (optional, size T>1): feature-dimension parallelism for
  column-sharded tables.

Row-sharded embedding tables shard over the **data** axis (the
DLRM/TPUEmbedding-standard layout): every chip owns a contiguous block of
rows of every table, batch ids are exchanged with ``all_to_all`` along
``data``. This means a plain ``NamedSharding(mesh, P('data', None))`` on the
global table array is exactly the layout the explicit shard_map path
expects — GSPMD ops (eval matmuls) and hand-written collectives share one
physical layout, no resharding between train and eval.

Multi-host: ``jax.distributed.initialize()`` must be called before mesh
construction (tfrec_tpu/cli.py does this when JAX_COORDINATOR is set);
afterwards every process runs this same SPMD program.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data_axis_size: int = -1, table_axis_size: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data_axis_size == -1:
        assert n % table_axis_size == 0, (n, table_axis_size)
        data_axis_size = n // table_axis_size
    want = data_axis_size * table_axis_size
    assert want <= n, f"need {want} devices, have {n}"
    try:
        dev_array = mesh_utils.create_device_mesh(
            (data_axis_size, table_axis_size), devices=devices[:want]
        )
    except Exception:  # CPU/virtual devices: no topology info
        dev_array = np.asarray(devices[:want]).reshape(
            data_axis_size, table_axis_size
        )
    return Mesh(dev_array, ("data", "table"))


def table_sharding(mesh: Mesh, mode: str = "row") -> NamedSharding:
    """Sharding of a [V, D] table: rows over 'data' (row mode), features
    over 'table' (col mode), or fully replicated."""
    if mode == "row":
        return NamedSharding(mesh, P("data", None))
    if mode == "col":
        return NamedSharding(mesh, P(None, "table"))
    if mode == "replicated":
        return NamedSharding(mesh, P())
    raise ValueError(f"unknown table sharding {mode!r}")


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
