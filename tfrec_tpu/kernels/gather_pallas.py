"""Fused Pallas embedding gather (BASELINE.json R4, SURVEY.md §2c.2).

TPU lowering requires >=(8, 128)-aligned blocks, so a (1, D) block-per-row
gather does not compile; instead each grid step issues 8 explicit row DMAs
from the HBM-resident table into a VMEM scratch (ids are scalar-prefetched
into SMEM so the addresses are known before the body runs), then writes the
assembled (8, D) tile to the output. The DMAs for a tile are all in flight
together; Pallas's pipeline emitter overlaps the output writeback with the
next tile's loads.

The backward (scatter-add of row grads) stays on the XLA path via
ops/sparse_optim — gradients never flow through this op in the train step
(autodiff stops at the gathered activations); a stop_gradient guards
against accidental differentiation.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8  # rows per grid step (sublane-aligned tile height)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _gather_kernel(ids_ref, table_ref, out_ref, scratch, sems):
    i = pl.program_id(0)
    for j in range(_ROWS):
        idx = ids_ref[i * _ROWS + j]
        pltpu.make_async_copy(table_ref.at[idx], scratch.at[j], sems.at[j]).start()
    for j in range(_ROWS):
        pltpu.make_async_copy(table_ref.at[0], scratch.at[j], sems.at[j]).wait()
    out_ref[:] = scratch[:]


_PACK_MIN_D = 32  # below this the 128/D group-read amplification dominates


def pack_subdim_enabled() -> bool:
    """Policy knob for the packed sub-128 path. Measured on-chip A/B
    (docs/PERF.md "Packed sub-128-lane kernels"): XLA's native gather wins
    ~1.5x at the kernel level and ~4x at the full-step level for d=32 —
    the P-fold group-read amplification is real — so HARDWARE defaults to
    the XLA gather. TFREC_PACK_SUBDIM=1 forces the packed kernels (for
    re-measurement), =0 disables them everywhere; interpret mode (CPU
    tests) keeps them on so correctness stays covered."""
    env = os.environ.get("TFREC_PACK_SUBDIM", "").strip().lower()
    if env in ("1", "true", "on"):
        return True
    if env in ("0", "false", "off"):
        return False
    return _interpret()


def _packing(v: int, d: int) -> int:
    """Rows per 128-lane group for the packed sub-128 path, or 0 if the
    (vocab, dim) pair is ineligible. Pure eligibility — the policy gate is
    ``pack_subdim_enabled()`` at the routing sites."""
    if d >= 128 or 128 % d != 0 or d < _PACK_MIN_D:
        return 0
    p = 128 // d
    return p if v % p == 0 else 0


def _gather_packed(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Fused gather for D in {32, 64}: per-row DMA slices must be 128-lane
    aligned (docs/PERF.md hardware finding 1), so rows are fetched as
    [1, 128] GROUP lines of P = 128/D consecutive rows from a reshaped
    [V/P, 128] view (row-major — the reshape is layout-free) and the D
    target lanes are selected on the VPU. Read amplification is P-fold on
    scattered ids; the A/B against the XLA gather decides the default."""
    v, d = table.shape
    p = 128 // d
    packed = table.reshape(v // p, p * d)
    gids = jnp.clip(ids, 0, v - 1).astype(jnp.int32)
    rows = gather_pallas(packed, gids // p)  # direct D=128 kernel
    lanes = (gids % p)[:, None] * d + jnp.arange(d, dtype=jnp.int32)[None, :]
    return jax.lax.stop_gradient(jnp.take_along_axis(rows, lanes, axis=1))


def gather_pallas(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """table [V, D], ids [N] int32 -> rows [N, D].

    Hardware constraint (verified on v5e): per-row DMA slices must be
    128-lane aligned. D % 128 == 0 uses the direct row kernel; D in
    {32, 64} (with V a multiple of 128/D) uses the packed group-row path;
    anything else falls back to the XLA gather. The routing is identical
    in interpret mode so CPU tests exercise what hardware runs.
    """
    n = ids.shape[0]
    v, d = table.shape
    if d % 128 != 0:
        if _packing(v, d) and pack_subdim_enabled():
            return _gather_packed(table, ids)
        if not _interpret():
            return jax.lax.stop_gradient(
                jnp.take(table, ids, axis=0, mode="clip")
            )
    n_pad = -(-n // _ROWS) * _ROWS
    ids_padded = jnp.clip(
        jnp.pad(ids, (0, n_pad - n)), 0, v - 1
    ).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // _ROWS,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # table stays in HBM
        out_specs=pl.BlockSpec(
            (_ROWS, d), lambda i, ids_ref: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((_ROWS, d), table.dtype),
            pltpu.SemaphoreType.DMA((_ROWS,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), table.dtype),
        interpret=_interpret(),
    )(ids_padded, table)
    return jax.lax.stop_gradient(out[:n])
