"""Fused table scatter-apply for rowwise optimizers (BASELINE.json R4
"fused gather/scatter").

After the XLA-side duplicate combine (sort + segment-sum,
ops/embedding.combine_duplicate_ids), a rowwise-Adagrad step is:

    acc[r]  += mean(g_r^2)                  (V scalars — cheap)
    table[r] -= lr * g_r / (sqrt(acc[r]) + eps)   (the [N, D] hot part)

The scalar accumulator update stays in XLA (hardware finding: Mosaic
rejects per-row (1,1) DMA slices — sub-128-lane row copies are illegal,
and acc rows are single floats). XLA computes the per-row scale
lr/(sqrt(acc+g2)+eps); the Pallas kernel then performs the ONE remaining
HBM-heavy operation — scaled scatter-add of [N, D] gradient rows into the
table — as an in-place read-modify-write: per 8-row tile, row DMAs in,
fused multiply-subtract in VMEM, row DMAs back out
(input_output_aliases). Sentinel rows (id >= vocab, capacity padding) are
skipped via predicated DMAs with identical predicates at start and wait.

The same kernel serves SGD (scale = lr) — it is a general scaled
scatter-add.

Caller contract: real ids must be distinct (dedup upstream) — duplicate
rows within the batch would race the RMW. D % 128 == 0 on real TPU
(per-row DMA lane alignment).
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


def _kernel(uids_ref, g_ref, scale_ref, table_in, table_out,
            row_s, row_sem, *, vocab):
    i = pl.program_id(0)

    def valid(j):
        return uids_ref[i * _ROWS + j] < vocab

    def idx(j):
        return jnp.clip(uids_ref[i * _ROWS + j], 0, vocab - 1)

    for j in range(_ROWS):
        @pl.when(valid(j))
        def _(j=j):
            pltpu.make_async_copy(
                table_out.at[idx(j)], row_s.at[j], row_sem.at[j]
            ).start()
    for j in range(_ROWS):
        @pl.when(valid(j))
        def _(j=j):
            pltpu.make_async_copy(
                table_out.at[idx(j)], row_s.at[j], row_sem.at[j]
            ).wait()

    # row -= scale * g, all 8 rows at once on the VPU (f32 throughout).
    row_s[:] = row_s[:] - scale_ref[:] * g_ref[:]

    for j in range(_ROWS):
        @pl.when(valid(j))
        def _(j=j):
            pltpu.make_async_copy(
                row_s.at[j], table_out.at[idx(j)], row_sem.at[j]
            ).start()
    for j in range(_ROWS):
        @pl.when(valid(j))
        def _(j=j):
            pltpu.make_async_copy(
                row_s.at[j], table_out.at[idx(j)], row_sem.at[j]
            ).wait()


def fused_scatter_supported(vocab: int, dim: int) -> bool:
    """Can scaled_scatter_sub run fused for this table shape on the current
    backend? Direct kernel at D % 128 == 0; packed group-row kernel at
    D in {32, 64} with vocab % (128/D) == 0 when the packed policy is on
    (opt-in on hardware — it lost the measured A/B, docs/PERF.md);
    interpret mode accepts all."""
    from tfrec_tpu.kernels.gather_pallas import _packing, pack_subdim_enabled

    return (
        dim % 128 == 0
        or (bool(_packing(vocab, dim)) and pack_subdim_enabled())
        or _interpret()
    )


def _scaled_scatter_sub_packed(
    table: jnp.ndarray, uids: jnp.ndarray, grads: jnp.ndarray, scale: jnp.ndarray
) -> jnp.ndarray:
    """Sub-128-lane variant: scaled updates are packed into [N, 128] GROUP
    lines (P = 128/D rows per line, disjoint lane blocks since uids are
    distinct), group-duplicates combined by sum, and the direct kernel
    RMWs the [V/P, 128] view of the table. The scalar-side math (scale,
    packing, combine) stays in XLA — only the HBM-heavy RMW is fused."""
    from tfrec_tpu.ops.embedding import combine_duplicate_ids

    v, d = table.shape
    p = 128 // d
    n = uids.shape[0]
    invalid = (uids < 0) | (uids >= v)
    safe = jnp.clip(uids, 0, v - 1)
    gid = jnp.where(invalid, v // p, safe // p).astype(jnp.int32)
    off = (safe % p).astype(jnp.int32)
    scaled = jnp.where(invalid[:, None], 0.0, scale[:, None] * grads)  # [N, d]
    lanes = off[:, None] * d + jnp.arange(d, dtype=jnp.int32)[None, :]
    packed = (
        jnp.zeros((n, p * d), grads.dtype)
        .at[jnp.arange(n)[:, None], lanes]
        .set(scaled)
    )
    ugids, packed_c = combine_duplicate_ids(gid, packed, sentinel=v // p)
    out = scaled_scatter_sub(
        table.reshape(v // p, p * d), ugids, packed_c,
        jnp.ones((n,), scale.dtype),
    )
    return out.reshape(v, d)


def scaled_scatter_sub(
    table: jnp.ndarray,
    uids: jnp.ndarray,
    grads: jnp.ndarray,
    scale: jnp.ndarray,
) -> jnp.ndarray:
    """In-place-style ``table[uids] -= scale[:, None] * grads`` over
    distinct real ids (sentinel >= vocab skipped)."""
    from tfrec_tpu.kernels.gather_pallas import _packing, pack_subdim_enabled

    v, d = table.shape
    if d % 128 != 0:
        if _packing(v, d) and pack_subdim_enabled():
            return _scaled_scatter_sub_packed(table, uids, grads, scale)
        if not _interpret():
            raise ValueError(
                f"scaled_scatter_sub requires D % 128 == 0 or a packable "
                f"(V, D), got ({v}, {d})"
            )
    n = uids.shape[0]
    n_pad = -(-n // _ROWS) * _ROWS
    uids_p = jnp.pad(uids, (0, n_pad - n), constant_values=v).astype(jnp.int32)
    grads_p = jnp.pad(grads, ((0, n_pad - n), (0, 0)))
    scale_p = jnp.pad(scale, (0, n_pad - n))[:, None]  # [n_pad, 1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, d), lambda i, ids: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, 1), lambda i, ids: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # table (aliased to out 0)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((_ROWS, d), table.dtype),
            pltpu.SemaphoreType.DMA((_ROWS,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, vocab=v),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v, d), table.dtype),
        # Flat operand indices INCLUDE the scalar-prefetch arg:
        # ids=0, grads=1, scale=2, table=3 -> output 0.
        input_output_aliases={3: 0},
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(uids_p, grads_p, scale_p, table)


def fused_rowwise_adagrad(
    table: jnp.ndarray,
    acc: jnp.ndarray,
    uids: jnp.ndarray,
    grads: jnp.ndarray,
    lr,
    eps: float = 1e-8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rowwise Adagrad over deduplicated ids: scalar accumulator in XLA,
    [N, D] table RMW in the fused kernel.

    uids: [N] distinct real ids (sentinel >= vocab for padding slots);
    grads: [N, D] combined gradients. Returns (table, acc) updated.
    """
    g2 = jnp.mean(grads * grads, axis=-1)  # [N]
    acc_rows = jnp.take(acc, uids, axis=0, mode="clip") + g2
    new_acc = acc.at[uids].set(acc_rows, mode="drop")
    scale = lr / (jnp.sqrt(acc_rows) + eps)
    new_table = scaled_scatter_sub(table, uids, grads, scale)
    return new_table, new_acc
