"""Fused Pallas embedding gather (BASELINE.json R4, SURVEY.md §2c.2).

The id vector is a scalar-prefetch argument, so each grid step's table
block origin is computed from the ids BEFORE the body runs — Pallas's
pipeline emitter turns this into double-buffered row DMAs from HBM with no
materialized one-hot or XLA gather scratch. One grid step per looked-up
row; rows are (1, D) blocks (D should be a multiple of 128 for full lanes).

The backward (scatter-add of row grads) stays on the XLA path via
ops/sparse_optim — gradients never flow through this op in the train step
(autodiff stops at the gathered activations), so no custom VJP is needed;
a stop_gradient guards against accidental differentiation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _gather_kernel(ids_ref, table_ref, out_ref):
    # BlockSpecs already routed table row ids_ref[i] into table_ref.
    out_ref[:] = table_ref[:]


def gather_pallas(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """table [V, D], ids [N] int32 -> rows [N, D]."""
    n = ids.shape[0]
    v, d = table.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, d), lambda i, ids_ref: (ids_ref[i], 0)),
        ],
        out_specs=pl.BlockSpec((1, d), lambda i, ids_ref: (i, 0)),
    )
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, d), table.dtype),
        interpret=_interpret(),
    )(ids, table)
    return jax.lax.stop_gradient(out)
