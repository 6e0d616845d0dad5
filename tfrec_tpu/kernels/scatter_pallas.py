"""Fused rowwise-Adagrad scatter-apply (BASELINE.json R4 "fused
gather/scatter").

After the XLA-side duplicate combine (sort + segment-sum,
ops/embedding.combine_duplicate_ids), the optimizer apply is a
read-modify-write over the touched rows:

    acc[r]  += mean(g_r^2)
    table[r] -= lr * g_r / (sqrt(acc[r]) + eps)

The XLA path expresses this as gather + elementwise + two scatters — four
HBM passes over [N, D] plus scatter scratch. This kernel does one pass:
per 8-row tile, row/acc DMAs in, update in VMEM, row/acc DMAs back out,
with table and acc updated in place (input_output_aliases). Sentinel rows
(id >= vocab, from capacity padding) are skipped via predicated DMAs —
the skip predicate is identical at start and wait, so semaphores stay
matched.

Caller contract: ids within a tile-of-8 must be distinct for rows that are
< vocab (guaranteed by dedup upstream) — otherwise RMW tiles race.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(uids_ref, lr_ref, g_ref, table_in, acc_in, table_out, acc_out,
            row_s, acc_s, row_sem, acc_sem, *, vocab, eps):
    i = pl.program_id(0)
    lr = lr_ref[0]  # scalar-prefetched so schedules (traced lr) work

    def valid(j):
        return uids_ref[i * _ROWS + j] < vocab

    def idx(j):
        return jnp.clip(uids_ref[i * _ROWS + j], 0, vocab - 1)

    # Phase 1: row + acc loads (predicated; skipped rows read nothing).
    for j in range(_ROWS):
        @pl.when(valid(j))
        def _(j=j):
            pltpu.make_async_copy(
                table_out.at[idx(j)], row_s.at[j], row_sem.at[j]
            ).start()
            pltpu.make_async_copy(
                acc_out.at[pl.ds(idx(j), 1)], acc_s.at[pl.ds(j, 1)], acc_sem.at[j]
            ).start()
    for j in range(_ROWS):
        @pl.when(valid(j))
        def _(j=j):
            pltpu.make_async_copy(
                table_out.at[idx(j)], row_s.at[j], row_sem.at[j]
            ).wait()
            pltpu.make_async_copy(
                acc_out.at[pl.ds(idx(j), 1)], acc_s.at[pl.ds(j, 1)], acc_sem.at[j]
            ).wait()

    # Phase 2: the update, all rows at once on the VPU.
    g = g_ref[:]  # [8, D]
    g2 = jnp.mean(g * g, axis=1, keepdims=True)  # [8, 1]
    new_acc = acc_s[:] + g2
    scale = lr / (jnp.sqrt(new_acc) + eps)
    row_s[:] = row_s[:] - scale * g
    acc_s[:] = new_acc

    # Phase 3: predicated writebacks (same predicate -> matched semaphores).
    for j in range(_ROWS):
        @pl.when(valid(j))
        def _(j=j):
            pltpu.make_async_copy(
                row_s.at[j], table_out.at[idx(j)], row_sem.at[j]
            ).start()
            pltpu.make_async_copy(
                acc_s.at[pl.ds(j, 1)], acc_out.at[pl.ds(idx(j), 1)], acc_sem.at[j]
            ).start()
    for j in range(_ROWS):
        @pl.when(valid(j))
        def _(j=j):
            pltpu.make_async_copy(
                row_s.at[j], table_out.at[idx(j)], row_sem.at[j]
            ).wait()
            pltpu.make_async_copy(
                acc_s.at[pl.ds(j, 1)], acc_out.at[pl.ds(idx(j), 1)], acc_sem.at[j]
            ).wait()


def fused_rowwise_adagrad(
    table: jnp.ndarray,
    acc: jnp.ndarray,
    uids: jnp.ndarray,
    grads: jnp.ndarray,
    lr: float,
    eps: float = 1e-8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """In-place-style rowwise Adagrad over deduplicated ids.

    uids: [N] distinct real ids (sentinel >= vocab for padding slots);
    grads: [N, D] combined gradients. Returns (table, acc) updated.
    """
    v, d = table.shape
    if d % 128 != 0 and not _interpret():
        # Per-row DMA slices must be 128-lane aligned on real TPU; callers
        # (train/step.py) route misaligned dims to the XLA apply instead.
        raise ValueError(f"fused_rowwise_adagrad requires D % 128 == 0, got {d}")
    n = uids.shape[0]
    n_pad = -(-n // _ROWS) * _ROWS
    uids_p = jnp.pad(uids, (0, n_pad - n), constant_values=v).astype(jnp.int32)
    grads_p = jnp.pad(grads, ((0, n_pad - n), (0, 0)))
    acc2d = acc[:, None]  # DMA-friendly [V, 1]
    lr_arr = jnp.asarray(lr, jnp.float32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pad // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, d), lambda i, ids, lr: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # table (aliased to out 0)
            pl.BlockSpec(memory_space=pltpu.ANY),  # acc (aliased to out 1)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((_ROWS, d), table.dtype),
            pltpu.VMEM((_ROWS, 1), acc.dtype),
            pltpu.SemaphoreType.DMA((_ROWS,)),
            pltpu.SemaphoreType.DMA((_ROWS,)),
        ],
    )
    new_table, new_acc2d = pl.pallas_call(
        functools.partial(_kernel, vocab=v, eps=eps),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((v, d), table.dtype),
            jax.ShapeDtypeStruct((v, 1), acc.dtype),
        ],
        # Flat operand indices INCLUDE the scalar-prefetch args: ids=0,
        # lr=1, grads=2, table=3, acc=4 -> outputs 0, 1.
        input_output_aliases={3: 0, 4: 1},
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(uids_p, lr_arr, grads_p, table, acc2d)
    return new_table, new_acc2d[:, 0]
