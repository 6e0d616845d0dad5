"""Rowwise sparse optimizers for embedding tables (BASELINE.json R6).

A dense optimizer step on a sharded table would read+write all V rows of the
table *and* its optimizer state every step — pure wasted HBM bandwidth when a
batch touches only a few thousand rows. These optimizers touch exactly the
gathered rows: duplicate ids are combined by sort+segment-sum
(`ops.embedding.combine_duplicate_ids`), then state and weights are gathered,
updated, and scattered back, all inside the jitted train step. On a sharded
table each shard runs the same code on its local rows (tfrec_tpu/parallel).

Optimizers:
- ``sgd``: no state.
- ``rowwise_adagrad``: one accumulator scalar per row (the DLRM-standard
  memory-saving variant; state is V floats instead of V*D).
- ``rowwise_adam``: per-element first moment, per-row scalar second moment,
  per-row step counts for exact lazy bias correction.

Equivalence contracts (pinned in tests/test_sparse_optim.py):
- one step on ids covering every row == the dense update rule;
- duplicate ids in a batch == pre-summed gradients (one combined update,
  NOT two sequential updates — the TPU-embedding convention).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from tfrec_tpu.ops.embedding import combine_duplicate_ids

State = Dict[str, jnp.ndarray]


def _row_stat(g: jnp.ndarray, stat_axis: str | None, full_dim: int | None,
              lane_groups: int = 1):
    """Rowwise mean-square gradient. On a column-sharded table each shard
    holds only D/T features of a row, so the rowwise statistic must be
    psum'd over the feature-shard axis (``stat_axis``) and divided by the
    FULL row width — otherwise sharded Adagrad/Adam would diverge from the
    single-device update rule. Duplicate-id combination (argsort) is
    deterministic and identical on every feature shard, so segments align
    across the psum.

    ``lane_groups`` G > 1 (lane-packed tables): the row holds G logical
    sub-rows of d = D/G lanes each; returns PER-GROUP stats [n, G] so
    each packed sub-table follows exactly its own per-table update rule.
    """
    if lane_groups > 1:
        if stat_axis is not None:
            raise ValueError(
                "lane-packed tables do not support column sharding (the "
                "feature split would cut across lane groups)"
            )
        n, d_all = g.shape
        return jnp.mean(
            (g * g).reshape(n, lane_groups, d_all // lane_groups), axis=-1
        )
    s = jnp.sum(g * g, axis=-1)
    if stat_axis is not None:
        s = jax.lax.psum(s, stat_axis)
        return s / full_dim
    return s / g.shape[-1]


@dataclasses.dataclass(frozen=True)
class SparseOptimizer:
    """init(table) -> state; apply(table, state, ids, grads, lr) -> (table, state).

    ``apply_deduped`` is the post-combine half of ``apply``: it takes
    (uids, summed grads) as produced by ``combine_duplicate_ids`` and skips
    the sort. The grouped train-step path (train/step.py
    ``sparse_update_all``) dedups all same-shaped tables in one batched op
    and then calls ``apply_deduped`` per table; ``apply`` stays the
    single-table convenience (dedup + apply_deduped) used by the sharded
    planners and tests.
    """

    name: str
    init: Callable[[jnp.ndarray], State]
    apply: Callable[..., Tuple[jnp.ndarray, State]]
    apply_deduped: Callable[..., Tuple[jnp.ndarray, State]]
    # Exposed so fused-kernel paths (which bypass `apply`) use the SAME
    # epsilon as the closure baked into `apply`.
    eps: float = 1e-8


def _dedup(table: jnp.ndarray, ids: jnp.ndarray, grads: jnp.ndarray):
    vocab = table.shape[0]
    uids, g = combine_duplicate_ids(ids, grads, sentinel=vocab)
    return uids, g


def _sgd_init(table: jnp.ndarray, lane_groups: int = 1) -> State:
    return {}


# apply_deduped contracts: ``uids`` comes from combine_duplicate_ids, which
# returns a globally ascending array whose in-range ids are unique (sentinel
# tail is out of bounds — dropped before any write), so the sorted/unique
# scatter hints are sound. They matter BOTH ways (docs/PERF.md "Scatter
# hints"): an unhinted scatter lowers to a serial per-index row loop
# (~60% of the DCN step), while the hinted lowering's cost scales with the
# TABLE footprint (a sweep/merge) — it won the 26x100k DCN A/B by 1.5x and
# LOST the 1Mx64 MF bench by 1.5x. So hints apply only below a table-size
# crossover: sweep_cost ~ V*D*8B / ~800GB/s vs serial_cost ~ n_ids * ~70ns;
# at n=8k ids the break-even is ~5e7 elements (override:
# TFREC_SCATTER_HINT_MAX_ELEMS).
import os as _os

_HINT_MAX_ELEMS = int(_os.environ.get("TFREC_SCATTER_HINT_MAX_ELEMS", 32_000_000))


def _hints(table) -> Dict[str, Any]:
    if table.size <= _HINT_MAX_ELEMS:
        return dict(indices_are_sorted=True, unique_indices=True)
    return {}


# Default OFF on measured evidence: the packed lowering wins the isolated
# one-table A/B ~5x (60 vs 290 us marginal) but LOSES the real 26-table
# step by ~4 ms at d=32 AND d=64 (step_packed_ab 2026-08-17, interleaved
# same-session pairs: 19.1 vs 15.0 ms) — the 26 extra one-hot+segment-sum
# passes cost more than the full-width sweep saves once 26 update chains
# share one program. Kept selectable for hardware where they don't.
_PACKED_SCATTER = _os.environ.get("TFREC_PACKED_SCATTER", "0") == "1"


def _packed_groups(table) -> int:
    """Rows per 128-lane line when the packed scatter-add applies, else 0."""
    v, d = table.shape
    if _PACKED_SCATTER and d < 128 and 128 % d == 0 and v % (128 // d) == 0:
        return 128 // d
    return 0


def scatter_add_rows(table, uids, upd):
    """``table.at[uids].add(upd, mode='drop')`` for globally-ascending
    ``uids`` whose in-range entries are unique (the combine_duplicate_ids
    contract) — lowered by measured cost, not by one fixed scatter shape:

    - small tables, D < 128: XLA's hinted scatter sweeps the table
      footprint at D-lane rate, wasting 128-D of every lane line at the
      flagship d=32 (measured 292 us/table vs 64 us full-width). Since
      [V, D] -> [V/G, 128] is the SAME row-major memory (free reshape),
      each update row is packed into its lane quarter, rows sharing a
      packed line are pre-summed (EXACT: unique uids => disjoint lanes,
      additions against zeros), and ONE full-width hinted scatter runs
      the sweep at full lane rate. Sentinel/out-of-range uids map to
      packed id >= V/G and drop, as before. On-chip A/B:
      docs/PERF.md "Packed-reshape scatter".
    - small tables, D >= 128: plain hinted scatter (already full-width).
    - huge tables (> TFREC_SCATTER_HINT_MAX_ELEMS): unhinted serial
      per-index loop — the sweep would cost more than n_ids * loop cost.
    """
    if table.size > _HINT_MAX_ELEMS:
        return table.at[uids].add(upd, mode="drop")
    grp = _packed_groups(table)
    if grp == 0:
        return table.at[uids].add(
            upd, mode="drop", indices_are_sorted=True, unique_indices=True
        )
    n, d = upd.shape
    pid = uids // grp  # nondecreasing (uids ascending)
    quarter = jax.nn.one_hot(uids % grp, grp, dtype=upd.dtype)
    upd128 = (quarter[:, :, None] * upd[:, None, :]).reshape(n, grp * d)
    starts = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (pid[1:] != pid[:-1]).astype(jnp.int32)]
    )
    seg = jnp.cumsum(starts) - 1
    upd128 = jax.ops.segment_sum(
        upd128, seg, num_segments=n, indices_are_sorted=True
    )
    vp = table.shape[0] // grp
    pidc = jnp.full((n,), vp, pid.dtype).at[seg].set(pid)
    packed = table.reshape(vp, grp * d).at[pidc].add(
        upd128, mode="drop", indices_are_sorted=True, unique_indices=True
    )
    return packed.reshape(table.shape)


def _sgd_apply_deduped(table, state, uids, g, lr, *, stat_axis=None,
                       full_dim=None):
    return scatter_add_rows(table, uids, -lr * g), state


def _sgd_apply(table, state, ids, grads, lr, *, stat_axis=None,
               full_dim=None, slots=None):
    uids, g = _dedup(table, ids, grads)
    return _sgd_apply_deduped(table, state, uids, g, lr)


def _adagrad_init_fn(initial_accumulator: float):
    def init(table: jnp.ndarray, lane_groups: int = 1) -> State:
        # Lane-packed tables keep one accumulator PER GROUP [V, G]; the
        # apply path infers G from this shape (no parameter threading
        # through the sharded planners).
        shape = (
            (table.shape[0],) if lane_groups <= 1
            else (table.shape[0], lane_groups)
        )
        return {"acc": jnp.full(shape, initial_accumulator, jnp.float32)}

    return init


def _adagrad_apply_fn(eps: float):
    def apply_deduped(table, state, uids, g, lr, *, stat_axis=None, full_dim=None):
        acc = state["acc"]
        groups = acc.shape[1] if acc.ndim == 2 else 1
        g2 = _row_stat(g, stat_axis, full_dim, groups)  # [n] or [n, G]
        acc_rows = jnp.take(acc, uids, axis=0, indices_are_sorted=True) + g2
        scale = lr / (jnp.sqrt(acc_rows) + eps)
        if groups > 1:
            # Per-group scale broadcast over that group's d lanes. Groups
            # the row's batch never touched have g == 0 there, so their
            # table delta is exactly 0 and their acc gains exactly 0 —
            # bit-for-bit the per-table rule (tests/test_lane_pack.py).
            n, d_all = g.shape
            scale = jnp.broadcast_to(
                scale[:, :, None], (n, groups, d_all // groups)
            ).reshape(n, d_all)
            new_table = scatter_add_rows(table, uids, -scale * g)
        else:
            new_table = scatter_add_rows(table, uids, -scale[:, None] * g)
        # The acc is V (or V*G) scalars — always under the crossover.
        new_acc = acc.at[uids].set(
            acc_rows, mode="drop", indices_are_sorted=True, unique_indices=True
        )
        return new_table, {"acc": new_acc}

    def apply(table, state, ids, grads, lr, *, stat_axis=None, full_dim=None,
              slots=None):
        uids, g = _dedup(table, ids, grads)
        return apply_deduped(
            table, state, uids, g, lr, stat_axis=stat_axis, full_dim=full_dim
        )

    return apply, apply_deduped


def _adam_init(table: jnp.ndarray, lane_groups: int = 1) -> State:
    v, d = table.shape
    if lane_groups > 1:
        # Lane-packed tables: Adam's EMA decays a row's moments on EVERY
        # update, so exactness under packing needs PER-GROUP second
        # moments and step counts ([V, G]) plus a per-id slot signal
        # telling apply which groups a batch actually touched (a zero
        # gradient in a touched group must still decay; an untouched
        # pack-mate group must not). The apply path derives "touched"
        # from the slots argument, never from grad == 0.
        return {
            "m": jnp.zeros((v, d), jnp.float32),
            "v": jnp.zeros((v, lane_groups), jnp.float32),
            "t": jnp.zeros((v, lane_groups), jnp.int32),
        }
    return {
        "m": jnp.zeros((v, d), jnp.float32),
        "v": jnp.zeros((v,), jnp.float32),
        "t": jnp.zeros((v,), jnp.int32),
    }


def _adam_apply_fn(b1: float, b2: float, eps: float):
    def apply_deduped(table, state, uids, g, lr, *, stat_axis=None, full_dim=None):
        h = _hints(table)  # m is [V, D]: scatter-SET cannot pack (it would
        # zero the other lane quarters of a written line), so it keeps the
        # plain size-gated hints; the table ADD uses scatter_add_rows.
        h1 = dict(indices_are_sorted=True, unique_indices=True)  # [V] states
        srt = dict(indices_are_sorted=True)
        t_rows = jnp.take(state["t"], uids, **srt) + 1
        m_rows = b1 * jnp.take(state["m"], uids, axis=0, **srt) + (1.0 - b1) * g
        v_rows = b2 * jnp.take(state["v"], uids, **srt) + (1.0 - b2) * _row_stat(
            g, stat_axis, full_dim
        )
        tf = t_rows.astype(jnp.float32)
        m_hat = m_rows / (1.0 - b1**tf)[:, None]
        v_hat = v_rows / (1.0 - b2**tf)
        update = -lr * m_hat / (jnp.sqrt(v_hat) + eps)[:, None]
        return (
            scatter_add_rows(table, uids, update),
            {
                "m": state["m"].at[uids].set(m_rows, mode="drop", **h),
                "v": state["v"].at[uids].set(v_rows, mode="drop", **h1),
                "t": state["t"].at[uids].set(t_rows, mode="drop", **h1),
            },
        )

    def apply_grouped_deduped(table, state, uids, g, touched, lr):
        """Lane-packed variant: ``touched`` [n, G] marks which lane groups
        of each combined row were actually addressed by the batch (derived
        from per-id slots — NOT from grad == 0, so a structurally-zero
        gradient in a touched group still decays, bit-for-bit the
        per-table rule). Untouched groups keep their m/v/t unchanged and
        receive exactly zero table delta."""
        n, d_all = g.shape
        groups = state["v"].shape[1]
        d = d_all // groups
        mask_l = jnp.repeat(touched, d, axis=1)  # [n, G*d] group-major
        srt = dict(indices_are_sorted=True)
        h1 = dict(indices_are_sorted=True, unique_indices=True)
        t_rows = jnp.take(state["t"], uids, axis=0, **srt) + touched.astype(
            jnp.int32
        )
        m_prev = jnp.take(state["m"], uids, axis=0, **srt)
        m_rows = jnp.where(mask_l, b1 * m_prev + (1.0 - b1) * g, m_prev)
        v_prev = jnp.take(state["v"], uids, axis=0, **srt)
        v_rows = jnp.where(
            touched,
            b2 * v_prev + (1.0 - b2) * _row_stat(g, None, None, groups),
            v_prev,
        )
        # max(t, 1): untouched groups may still have t == 0; their update
        # is masked out below, but 1 - b^0 = 0 must not produce inf/NaN
        # lanes that survive a where().
        tf = jnp.maximum(t_rows.astype(jnp.float32), 1.0)
        m_hat = m_rows / jnp.repeat(1.0 - b1**tf, d, axis=1)
        v_hat = v_rows / (1.0 - b2**tf)
        denom = jnp.repeat(jnp.sqrt(v_hat) + eps, d, axis=1)
        update = jnp.where(mask_l, -lr * m_hat / denom, 0.0)
        return (
            scatter_add_rows(table, uids, update),
            {
                "m": state["m"].at[uids].set(m_rows, mode="drop", **_hints(table)),
                "v": state["v"].at[uids].set(v_rows, mode="drop", **h1),
                "t": state["t"].at[uids].set(t_rows, mode="drop", **h1),
            },
        )

    def apply(table, state, ids, grads, lr, *, stat_axis=None, full_dim=None,
              slots=None):
        if state["v"].ndim == 2:
            groups = state["v"].shape[1]
            if slots is None:
                raise ValueError(
                    "lane-packed rowwise_adam needs the per-id slot array "
                    "(which lane group each id addresses) — the step "
                    "builders thread it from model.lane_slot_widths"
                )
            if stat_axis is not None:
                raise ValueError(
                    "lane-packed tables do not support column sharding"
                )
            # Carry a one-hot touch signal through the duplicate combine:
            # segment-summed counts > 0 == "this group of this row was
            # addressed by at least one batch position".
            touch = jax.nn.one_hot(slots, groups, dtype=grads.dtype)
            uids, cg = combine_duplicate_ids(
                ids, jnp.concatenate([grads, touch], axis=1),
                sentinel=table.shape[0],
            )
            return apply_grouped_deduped(
                table, state, uids, cg[:, :-groups], cg[:, -groups:] > 0, lr
            )
        uids, g = _dedup(table, ids, grads)
        return apply_deduped(
            table, state, uids, g, lr, stat_axis=stat_axis, full_dim=full_dim
        )

    return apply, apply_deduped


def fused_adagrad_gate(vocab: int, dim: int, *, kernels: str,
                       opt_name: str, lane_grouped: bool) -> bool:
    """ONE shared eligibility gate for the fused Pallas rowwise-Adagrad
    RMW (kernels/scatter_pallas.fused_rowwise_adagrad). Used by both the
    single-device builder (train/step._fused_scatter_ok) and the
    row-sharded plan (parallel/embedding.RowShardedTable.local_update) —
    a review finding: the two sites had drifted-prone duplicate logic.
    Lane-packed tables ([V, G] per-group stats) are excluded: the fused
    kernel keeps one rowwise scalar."""
    if kernels != "pallas" or opt_name != "rowwise_adagrad" or lane_grouped:
        return False
    from tfrec_tpu.kernels.scatter_pallas import fused_scatter_supported

    return fused_scatter_supported(vocab, dim)


def make_sparse_optimizer(
    name: str,
    *,
    adagrad_init: float = 0.0,
    adam_b1: float = 0.9,
    adam_b2: float = 0.999,
    eps: float = 1e-8,
    **_: Any,
) -> SparseOptimizer:
    if name == "sgd":
        return SparseOptimizer("sgd", _sgd_init, _sgd_apply, _sgd_apply_deduped, eps)
    if name == "rowwise_adagrad":
        apply, apply_deduped = _adagrad_apply_fn(eps)
        return SparseOptimizer(
            "rowwise_adagrad", _adagrad_init_fn(adagrad_init),
            apply, apply_deduped, eps,
        )
    if name == "rowwise_adam":
        apply, apply_deduped = _adam_apply_fn(adam_b1, adam_b2, eps)
        return SparseOptimizer(
            "rowwise_adam", _adam_init, apply, apply_deduped, eps
        )
    raise ValueError(f"unknown sparse optimizer {name!r}")
