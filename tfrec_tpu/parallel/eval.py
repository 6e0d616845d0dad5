"""Mesh-native retrieval evaluation on live sharded tables.

The single-device ``eval/retrieval.RetrievalEvaluator`` scores the catalog
from replicated params; at Criteo/production scale that would copy every
table to every device. This evaluator keeps tables in their TRAINING layout
(row blocks, ``P('data', None)``) and runs the reference family's
full-catalog protocol as one pjit program per user batch:

  user-row gather (masked local take + psum)
    -> query transform (model's DotRetrieval, e.g. GMF's h-weighting)
    -> sharded scoring + per-shard top-k + all_gather merge
       (parallel/topk.sharded_topk_dot)
    -> ranking metrics (eval/metrics) on the replicated [B, k] ids.

Peak per-device memory stays ~ the table SHARD size: the only cross-device
tensors are [B, D] query vectors and [B, n_shards * k] merge candidates.
(SURVEY.md §3c; BASELINE.json R7/config 5 "DCN+retrieval".)
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tfrec_tpu.eval.metrics import ranking_metrics_from_topk
from tfrec_tpu.eval.retrieval import padded_positives
from tfrec_tpu.parallel.topk import sharded_topk_dot


def sharded_row_gather(
    mesh: Mesh, table: jnp.ndarray, ids: jnp.ndarray, axis: str = "data"
) -> jnp.ndarray:
    """Gather [B] rows from a row-sharded [V_pad, D] table into a replicated
    [B, D] array: each shard takes its local hits (others contribute zeros)
    and a psum merges — B*D wire bytes, never the table."""
    n_sh = mesh.shape[axis]
    rps = table.shape[0] // n_sh

    def local(tbl, lids):
        base = jax.lax.axis_index(axis) * rps
        lidx = lids - base
        ok = (lidx >= 0) & (lidx < rps)
        rows = jnp.take(tbl, jnp.clip(lidx, 0, rps - 1), axis=0)
        rows = jnp.where(ok[:, None], rows, 0.0)
        return jax.lax.psum(rows, axis)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=P(),
        check_vma=False,
    )(table, ids)


class ShardedRetrievalEvaluator:
    """Compile-once full-catalog ranking eval over a training-state pytree
    with row-sharded tables. Drop-in metric-compatible with
    ``eval/retrieval.RetrievalEvaluator`` (same protocol, same metrics)."""

    def __init__(
        self,
        builder,  # parallel.step.ShardedTrainStepBuilder
        model,
        dataset,
        ks: Sequence[int],
        user_batch: int = 256,
    ):
        spec = model.dot_decomposition()
        if spec is None:
            raise ValueError(
                f"{type(model).__name__} has no dot decomposition; sharded "
                "retrieval eval needs a dot-product scorer"
            )
        self.builder = builder
        self.mesh = builder.mesh
        self.spec = spec
        self.num_items = dataset.num_items
        self.ks = tuple(ks)
        self.user_batch = user_batch
        self.train_padded, self.train_counts = padded_positives(dataset.train_csr)
        self.test_padded, self.test_counts = padded_positives(dataset.test_csr)
        self.users_with_test = np.flatnonzero(self.test_counts > 0).astype(np.int32)
        self._jit = None

    def _build(self, state):
        mesh, spec, num_items = self.mesh, self.spec, self.num_items
        max_k, ks = max(self.ks), self.ks

        def eval_batch(st, users, trn_p, trn_c, tst_p, tst_c):
            tables = st["tables"]
            with jax.named_scope("sharded_user_gather"):
                u_rows = sharded_row_gather(mesh, tables[spec.user_table], users)
                q = spec.user_vecs(st["dense"], u_rows)
            bias = (
                tables[spec.bias_table][:, 0]
                if spec.bias_table is not None
                else None
            )
            with jax.named_scope("sharded_topk"):
                _, topk_ids = sharded_topk_dot(
                    mesh, q, tables[spec.item_table], max_k, num_items,
                    item_bias=bias,
                    exclude_padded=trn_p, exclude_counts=trn_c,
                )
            with jax.named_scope("ranking_metrics"):
                m = ranking_metrics_from_topk(topk_ids, tst_p, tst_c, ks)
            n_users = jnp.sum((tst_c > 0).astype(jnp.float32))
            return {k: v * n_users for k, v in m.items()}, n_users

        rep = NamedSharding(self.mesh, P())
        return jax.jit(
            eval_batch,
            in_shardings=(self.builder.state_shardings(state),) + (rep,) * 5,
            out_shardings=(None, None),
        )

    def __call__(self, state) -> Dict[str, float]:
        if self._jit is None:
            self._jit = self._build(state)
        sums: Dict[str, float] = {}
        total_users = 0.0
        ub = self.user_batch
        for start in range(0, len(self.users_with_test), ub):
            batch_users = self.users_with_test[start : start + ub]
            if len(batch_users) < ub:  # pad final batch to static shape;
                pad = np.zeros(ub - len(batch_users), np.int32)  # padded
                mask = np.concatenate(  # users have tst_c forced to 0
                    [np.ones(len(batch_users), bool), np.zeros(len(pad), bool)]
                )
                batch_users = np.concatenate([batch_users, pad])
            else:
                mask = np.ones(ub, bool)
            tst_c = np.where(mask, self.test_counts[batch_users], 0).astype(np.int32)
            metrics, n_users = self._jit(
                state,
                jnp.asarray(batch_users),
                jnp.asarray(self.train_padded[batch_users]),
                jnp.asarray(self.train_counts[batch_users]),
                jnp.asarray(self.test_padded[batch_users]),
                jnp.asarray(tst_c),
            )
            total_users += float(n_users)
            for key, val in metrics.items():
                sums[key] = sums.get(key, 0.0) + float(val)
        return {k: v / max(total_users, 1.0) for k, v in sums.items()}
