"""Embedding-table primitives: specs, init, gather, duplicate-id combine.

This is the single-device core of the embedding subsystem (BASELINE.json
north_star R3/R4). The sharded multi-device lookup in
``tfrec_tpu/parallel/embedding.py`` and the Pallas fused gather in
``tfrec_tpu/kernels/gather.py`` both reduce to these semantics; equivalence
tests pin that.

Design notes (TPU-first):
- All shapes are static. Duplicate-id gradient combine is done with a
  sort + segment-sum of length N (the batch's id count), never a dynamic
  ``unique`` — XLA requires static shapes under jit.
- The sentinel row id ``vocab`` (one past the end) marks padding; scatters
  use ``mode='drop'`` so sentinel updates vanish without branching.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp


def run_first_index(x: jnp.ndarray) -> jnp.ndarray:
    """``jnp.searchsorted(x, x, side='left')`` for arrays whose EQUAL
    values are contiguous (e.g. sorted arrays): the first index of each
    element's run, as an O(n) cummax.

    Why not jnp.searchsorted: its default lowering on XLA:TPU is a
    vmapped binary-search ``while`` loop that measured ~816 us PER CALL
    at n=8192 — 26 of them accounted for ~21 ms of the row-sharded
    step's 29 ms overhead (round-4 device trace, docs/PERF.md "Round-4
    on-chip results"). The cummax lowers to a log-depth fused scan.

    Only per-value contiguity is required, not global sortedness — runs
    of a repeated value elsewhere (e.g. corrupt negative ids mapped to a
    sentinel at the front of an otherwise ascending array) index their
    OWN run, which is strictly more robust than binary search on such
    inputs.
    """
    n = x.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), x[1:] != x[:-1]]
    )
    return jax.lax.cummax(jnp.where(is_start, idx, 0))


def run_last_index_plus1(x: jnp.ndarray) -> jnp.ndarray:
    """``jnp.searchsorted(x, x, side='right')`` under the same
    contiguity contract as :func:`run_first_index`: one past the last
    index of each element's run (reversed cummin of run ends)."""
    n = x.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_end = jnp.concatenate([x[1:] != x[:-1], jnp.ones((1,), bool)])
    ends = jax.lax.cummin(jnp.where(is_end, idx, n - 1)[::-1])[::-1]
    return ends + 1


@dataclasses.dataclass(frozen=True)
class TableSpec:
    """One logical embedding table."""

    name: str
    vocab: int
    dim: int
    # Initializer: "normal" (std = init_scale or 1/sqrt(dim)) | "zeros".
    initializer: str = "normal"
    init_scale: float | None = None
    # Lane-packed tables (models/ctr_base.py enable_lane_packing): this
    # physical table holds `lane_groups` logical sub-tables side by side
    # along the lane dim (dim = G * d_logical). Rowwise sparse-optimizer
    # statistics are kept PER GROUP ([V, G] accumulators) so the math is
    # exactly the per-table update rule (ops/sparse_optim.py).
    lane_groups: int = 1

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.vocab, self.dim)


def init_table(rng: jax.Array, spec: TableSpec, dtype=jnp.float32) -> jnp.ndarray:
    if spec.initializer == "zeros":
        return jnp.zeros(spec.shape, dtype)
    scale = spec.init_scale if spec.init_scale is not None else 1.0 / (spec.dim**0.5)
    return (jax.random.normal(rng, spec.shape) * scale).astype(dtype)


def init_tables(
    rng: jax.Array, specs: Sequence[TableSpec], dtype=jnp.float32
) -> Dict[str, jnp.ndarray]:
    keys = jax.random.split(rng, len(specs))
    return {s.name: init_table(k, s, dtype) for s, k in zip(specs, keys)}


def gather(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Row gather ``table[ids]`` — the XLA reference path.

    mode='clip': sentinel (out-of-range) ids used for bag padding clamp to
    the last row instead of jnp.take's default NaN fill; callers mask those
    outputs, and a clamped value is maskable where NaN (0*NaN=NaN) is not.
    """
    return jnp.take(table, ids, axis=0, mode="clip")


def combine_duplicate_ids(
    ids: jnp.ndarray, grads: jnp.ndarray, sentinel: int, order=None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sum gradient rows that share an id (static-shape ``unique``).

    Args:
      ids: [N] int32 row ids (may repeat).
      grads: [N, D] float32 gradient rows aligned with ``ids``.
      sentinel: id used to pad unused output slots (normally ``vocab``).
      order: optional [N] int32 STABLE argsort of ``ids`` computed on the
        host (train.host_dedup): the ids are known when the batch is
        built, so the input pipeline can pre-sort them and the device
        skips its per-table argsort. (Measured verdict on this chip:
        neutral-to-negative in-situ — the argsort is NOT the binding
        sparse-path cost; docs/PERF.md "Host-precomputed dedup sorts".)
        A host-stable sort makes the result bit-identical to the device
        path (jnp.argsort is stable).

    Returns:
      (uids [N] int32, combined [N, D]): slot j < num_unique holds a distinct
      id and the sum of its gradient rows; remaining slots hold ``sentinel``
      and arbitrary values (callers scatter with mode='drop').

    ``uids`` is globally ASCENDING (unique ids sorted, then the sentinel —
    which is >= every real id — fills the tail) and every in-range id
    appears once, so downstream gathers/scatters may legitimately pass
    ``indices_are_sorted=True`` and ``unique_indices=True`` (duplicate
    sentinel slots are out of bounds and dropped before any write).
    """
    n = ids.shape[0]
    # Corrupt NEGATIVE ids normalize to the sentinel BEFORE the sort:
    # jax's .at[] wraps negative indices numpy-style, so a raw -3 in
    # ``uids`` would land the combined gradient on row V-3 of the table
    # despite mode='drop' (review finding, round 4 — verified on CPU).
    # The sentinel is a genuine positive out-of-bounds id, so downstream
    # drops really drop, and sorting the NORMALIZED ids keeps ``uids``
    # ascending (the indices_are_sorted promise downstream).
    ids = jnp.where(ids < 0, jnp.int32(sentinel), ids)
    if order is None:
        order = jnp.argsort(ids)
    sids = jnp.take(ids, order)
    sg = jnp.take(grads, order, axis=0)
    starts = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (sids[1:] != sids[:-1]).astype(jnp.int32)]
    )
    seg = jnp.cumsum(starts) - 1  # [N] segment index, contiguous from 0
    # seg is ascending by construction: the sorted-indices hint keeps XLA
    # off its serial general-scatter path (the measured step bottleneck —
    # docs/PERF.md "Scatter hints").
    combined = jax.ops.segment_sum(
        sg, seg, num_segments=n, indices_are_sorted=True
    )
    # All members of a segment share the same id, so duplicate scatter
    # writes are identical — deterministic despite unspecified order.
    uids = (
        jnp.full((n,), sentinel, dtype=ids.dtype)
        .at[seg]
        .set(sids, indices_are_sorted=True)
    )
    return uids, combined


def combine_duplicate_ids_grouped(
    ids: jnp.ndarray, grads: jnp.ndarray, sentinels
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched ``combine_duplicate_ids``: F independent problems in ONE
    sort / gather / segment-sum / scatter.

    On TPU the per-table sort+segsum machinery is latency-bound, not
    size-bound (26 sorts of 8k ids cost ~25x ONE sort of 208k ids —
    docs/PERF.md "Step breakdown"), so batching the dedup of all
    same-shaped tables into single ops removes a fixed per-op cost times
    the table count from every train step. Per-row results are
    bit-identical to the unbatched path (same comparator, same segment
    accumulation order); tests/test_sparse_optim.py pins that.

    Args:
      ids: [F, N] int32 row ids, row f addressing table f.
      grads: [F, N, D] float gradient rows aligned with ``ids``.
      sentinels: [F] per-table pad id (normally each table's vocab).

    Returns:
      (uids [F, N], combined [F, N, D]) — row f is exactly
      ``combine_duplicate_ids(ids[f], grads[f], sentinels[f])``.
    """
    f, n = ids.shape
    # Same negative-id normalization as combine_duplicate_ids: a raw
    # negative uid would WRAP at the downstream .at[] scatter.
    ids = jnp.where(
        ids < 0,
        jnp.broadcast_to(
            jnp.asarray(sentinels, ids.dtype)[:, None], ids.shape
        ),
        ids,
    )
    order = jnp.argsort(ids, axis=-1)
    sids = jnp.take_along_axis(ids, order, axis=-1)
    sg = jnp.take_along_axis(grads, order[..., None], axis=1)
    starts = jnp.concatenate(
        [
            jnp.ones((f, 1), jnp.int32),
            (sids[:, 1:] != sids[:, :-1]).astype(jnp.int32),
        ],
        axis=1,
    )
    seg = jnp.cumsum(starts, axis=-1) - 1  # [F, N], per-row contiguous from 0
    flat_seg = (seg + jnp.arange(f, dtype=seg.dtype)[:, None] * n).reshape(-1)
    # flat_seg ascends globally (per-row ascending + row-strided offsets).
    combined = jax.ops.segment_sum(
        sg.reshape(f * n, -1), flat_seg, num_segments=f * n,
        indices_are_sorted=True,
    ).reshape(f, n, -1)
    sent = jnp.broadcast_to(
        jnp.asarray(sentinels, ids.dtype)[:, None], (f, n)
    )
    uids = sent.at[jnp.arange(f)[:, None], seg].set(sids)
    return uids, combined


def combine_duplicate_ids_multi(
    ids_seq, grads_seq, sentinels
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """F same-shaped dedup problems in ONE flat keyed sort.

    Unlike ``combine_duplicate_ids_grouped`` (a batched argsort over
    [F, N], which XLA lowers as F sequential minor-dim sorts — measured
    as slow as F separate combines, docs/PERF.md), this concatenates all
    tables into ONE [F*N] array keyed by disjoint per-table offset
    ranges. Disjointness makes the sorted array per-table CONTIGUOUS at
    STATIC positions [f*N, (f+1)*N), so one sort + one gather + one
    segment-sum + one scatter-set replace F of each.

    Per-table outputs are bit-identical to ``combine_duplicate_ids``:
    the flat sort is stable, and keys of table f occupy a disjoint
    range, so block f's permutation equals the per-table stable argsort;
    segment members therefore accumulate in the same order.

    Args:
      ids_seq: sequence of F [N] int32 id vectors (same N).
      grads_seq: sequence of F [N, D] gradient blocks (same N, D).
      sentinels: per-table pad id (>= every id the table's vector holds).

    Returns:
      (uids [F, N], combined [F, N, D]) — row f is exactly
      ``combine_duplicate_ids(ids_seq[f], grads_seq[f], sentinels[f])``
      for in-range ids. Out-of-range ids (corrupt negatives, oversized)
      are normalized to the table's sentinel first — their slots differ
      from the per-table combine's (which keeps the raw value) but both
      are dropped by every caller's mode='drop' scatter; the applied
      table updates are identical.
    """
    import numpy as np

    f = len(ids_seq)
    n = ids_seq[0].shape[0]
    spans = [int(s) + 1 for s in sentinels]
    total = sum(spans)
    assert total < 2**31, (
        f"flat dedup key space {total} overflows int32; use per-table"
    )
    offs = np.concatenate([[0], np.cumsum(spans)[:-1]]).astype(np.int32)
    # Out-of-range ids (corrupt negatives, oversized) map to the table's
    # OWN sentinel before offsetting: a raw negative key would sort into
    # the PRECEDING table's block and shift every block boundary the
    # static rebasing below depends on — grads would silently land on a
    # neighbor table's rows (review finding, round 4). Per-table
    # semantics are preserved: sentinel uids are out of range and every
    # caller scatters with mode='drop', exactly like the raw negative a
    # per-table combine would have produced.
    keys = jnp.concatenate([
        jnp.where(
            (ids < 0) | (ids >= int(sentinels[i])),
            jnp.int32(sentinels[i]),
            ids.astype(jnp.int32),
        )
        + int(offs[i])
        for i, ids in enumerate(ids_seq)
    ])
    g = jnp.concatenate(list(grads_seq), axis=0)  # [F*N, D]
    order = jnp.argsort(keys, stable=True)
    sk = jnp.take(keys, order)
    sg = jnp.take(g, order, axis=0)
    starts = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (sk[1:] != sk[:-1]).astype(jnp.int32)]
    )
    seg_raw = jnp.cumsum(starts) - 1  # global ascending segments
    # Re-base each table's segments to start at f*N (slot alignment is
    # what lets callers slice outputs statically). Key ranges are
    # disjoint, so seg_raw always increments at a block boundary and the
    # re-based segments stay globally ascending.
    base = jnp.repeat(seg_raw[np.arange(f) * n], n)
    slot = jnp.repeat(jnp.arange(f, dtype=seg_raw.dtype) * n, n)
    seg = seg_raw - base + slot
    combined = jax.ops.segment_sum(
        sg, seg, num_segments=f * n, indices_are_sorted=True
    ).reshape(f, n, -1)
    sent_keys = jnp.repeat(
        jnp.asarray([int(s) + int(o) for s, o in zip(sentinels, offs)],
                    jnp.int32), n
    )
    uids = (
        sent_keys.at[seg].set(sk, indices_are_sorted=True)
        - jnp.repeat(jnp.asarray(offs), n)
    ).reshape(f, n)
    return uids, combined


def dedup_ids(ids: jnp.ndarray, sentinel: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-shape unique-with-inverse.

    Returns (uids [N], inv [N]) with ``ids[i] == uids[inv[i]]``; slot j <
    num_unique holds a distinct id, remaining slots hold ``sentinel``.
    Used to deduplicate ids before the all-to-all exchange (SURVEY.md §5
    design rule: ID exchange volume scales with unique ids, and per-
    destination capacity is counted in unique ids, not raw batch ids).
    """
    n = ids.shape[0]
    order = jnp.argsort(ids)
    sids = jnp.take(ids, order)
    starts = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (sids[1:] != sids[:-1]).astype(jnp.int32)]
    )
    seg = jnp.cumsum(starts) - 1
    uids = jnp.full((n,), sentinel, dtype=ids.dtype).at[seg].set(sids)
    inv = jnp.zeros((n,), jnp.int32).at[order].set(seg.astype(jnp.int32))
    return uids, inv


def merge_argsort_runs(keys: jnp.ndarray, num_runs: int) -> jnp.ndarray:
    """STABLE argsort of a [num_runs * c] int32 array whose ``num_runs``
    equal-length runs are each nondecreasing — as iterative pairwise
    BITONIC MERGES instead of a general sort.

    The receive side of the row-sharded gradient combine gets exactly this
    shape: the [N, C] buffer returned by the grad all-to-all holds one
    per-source block each already ascending (sources send dedup-sorted
    ids), yet ``sparse_opt.apply`` re-sorts the flattened array from
    scratch (VERDICT r4 item 3). XLA has no merge primitive, so this
    builds the classic bitonic merge network out of reshapes +
    compare-exchanges: merging two sorted runs of length L is
    ``concat(a, reverse(b))`` (a bitonic sequence) followed by log2(2L)
    vectorized compare-exchange stages — O(n log K log n) comparator work
    versus the sort's O(n log^2 n), and every stage is a fused
    elementwise pass, never a sequential loop.

    Ties break lexicographically on the original position (carried as a
    payload through every compare-exchange), so the returned permutation
    is EXACTLY ``jnp.argsort(keys)`` (stable) — downstream duplicate
    combines are bit-identical, pinned in tests/test_parallel.py.

    Degenerate ``num_runs == 1`` returns iota: a single sorted run needs
    no work at all (the 1-chip mesh benchmark case).
    """
    n = keys.shape[0]
    assert n % num_runs == 0, (n, num_runs)
    c = n // num_runs
    pos = jnp.arange(n, dtype=jnp.int32).reshape(num_runs, c)
    if num_runs == 1:
        return pos.reshape(-1)
    kmax = jnp.iinfo(jnp.int32).max
    run_pad = 1 << max(c - 1, 0).bit_length()   # pad each run to 2^p
    k_runs = 1 << (num_runs - 1).bit_length()   # pad run count to 2^q
    k = jnp.pad(
        keys.reshape(num_runs, c).astype(jnp.int32),
        ((0, k_runs - num_runs), (0, run_pad - c)), constant_values=kmax,
    )
    p = jnp.pad(pos, ((0, k_runs - num_runs), (0, run_pad - c)),
                constant_values=n)
    length = run_pad
    while k_runs > 1:
        half = k_runs // 2
        ka = k.reshape(half, 2, length)
        pa = p.reshape(half, 2, length)
        # concat(asc, reversed(asc)) -> bitonic sequence per pair
        k = jnp.concatenate([ka[:, 0, :], ka[:, 1, ::-1]], axis=1)
        p = jnp.concatenate([pa[:, 0, :], pa[:, 1, ::-1]], axis=1)
        length *= 2
        stride = length // 2
        while stride >= 1:
            kr = k.reshape(half, length // (2 * stride), 2, stride)
            pr = p.reshape(half, length // (2 * stride), 2, stride)
            a_k, b_k = kr[:, :, 0, :], kr[:, :, 1, :]
            a_p, b_p = pr[:, :, 0, :], pr[:, :, 1, :]
            # Strict total order on (key, pos): keys may repeat, (key,
            # pos) never does — the network output is therefore the
            # unique lexicographic order == the stable argsort.
            le = (a_k < b_k) | ((a_k == b_k) & (a_p <= b_p))
            k = jnp.stack(
                [jnp.where(le, a_k, b_k), jnp.where(le, b_k, a_k)], axis=2
            ).reshape(half, length)
            p = jnp.stack(
                [jnp.where(le, a_p, b_p), jnp.where(le, b_p, a_p)], axis=2
            ).reshape(half, length)
            stride //= 2
        k_runs = half
    # Pads carry (kmax, n): they sort strictly after every real entry
    # (real keys are < kmax and real pos < n), so the first n slots are
    # exactly the real permutation.
    return p.reshape(-1)[:n]


def scatter_add_dedup(
    table: jnp.ndarray, ids: jnp.ndarray, rows: jnp.ndarray
) -> jnp.ndarray:
    """``table[ids] += rows`` with duplicate ids accumulating; sentinel
    (out-of-range) ids dropped. Negative ids are mapped to the sentinel
    first — jax's .at[] wraps them numpy-style, so a raw -k would land
    on row V-k despite mode='drop' (review finding, round 4)."""
    ids = jnp.where(ids < 0, jnp.int32(table.shape[0]), ids)
    return table.at[ids].add(rows, mode="drop")
