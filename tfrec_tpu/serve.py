"""Inference surface: the TPU-native counterpart of the reference family's
``AbstractRecommender.predict(user_ids, item_ids)`` plus batch top-k
recommendation (SURVEY.md §1a "Public interface").

``Recommender`` wraps a trained Trainer (or raw params + model) and exposes:
- ``predict(user_ids, item_ids)``  -> pointwise scores [N]
- ``score_catalog(user_ids)``      -> [B, num_items] full-catalog scores
- ``recommend(user_ids, k, exclude_train=True)`` -> (ids [B,k], scores [B,k])

All paths are jit-compiled once per shape. With sharded params the
scoring runs under GSPMD (the collectives come from the input shardings);
the explicit sharded top-k pipeline (parallel/topk.py) is available
directly for dot-product serving at pod scale.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tfrec_tpu.eval.retrieval import padded_positives, topk_scores


class Recommender:
    def __init__(self, model, params, dataset=None, mesh=None, quantize=False,
                 state=None, topk_method: str = "approx",
                 recall_target: float = 0.99):
        """``quantize=True`` stores the MF item table as rowwise-scaled
        int8 (top-k order exact up to rounding). MF only — other scorers
        (GMF's h-weighting, MLP towers) are not plain dot products, so a
        quantized matmul would silently change their scores. The int8
        table is passed to the jitted scorer as an ARGUMENT (closure
        constants get baked into the compile payload); the 4x memory win
        applies when the caller drops the f32 params after export.

        ``topk_method``: "approx" (default — ``lax.approx_max_k``, the
        TPU-native candidate op, per-user recall >= ``recall_target``;
        exact on CPU where it lowers to a sort) or "exact" (full-sort
        ``lax.top_k`` — measured ~250x off the scoring ceiling at 1M-item
        catalogs on v5e, docs/PERF.md). Metric parity evaluation
        (eval/retrieval.RetrievalEvaluator) always uses exact.
        """
        self.topk_method = topk_method
        self.recall_target = recall_target
        self.model = model
        self.params = params
        self.dataset = dataset
        self.mesh = mesh
        # Live sharded training state (padded row-sharded tables): when set
        # together with a mesh and a dot-product scorer, recommend() runs
        # the distributed top-k (parallel/topk.py) on the shards directly —
        # tables are never replicated for serving (BASELINE.json R7).
        self._state = state
        self._sharded_jit = {}
        self._train_padded = None
        self._quant = None
        if quantize:
            from tfrec_tpu.models.mf import MF as _MF

            if not type(model) is _MF:
                raise ValueError(
                    "quantize=True supports the MF dot-product scorer only; "
                    f"got {type(model).__name__}"
                )
            from tfrec_tpu.ops.quantize import quantize_table

            self._quant = quantize_table(params["tables"]["item_emb"])
        self._predict_jit = jax.jit(self._predict_impl)
        if self._quant is not None:
            from tfrec_tpu.ops.quantize import quantized_scores

            def scorer(params, qt, user_ids):
                u = jnp.take(params["tables"]["user_emb"], user_ids, axis=0)
                t = params["tables"]
                bias = t["item_bias"][:, 0] if "item_bias" in t else None
                return quantized_scores(u, qt, bias)

            quant_jit = jax.jit(scorer)
            self._score_jit = lambda p, u: quant_jit(p, self._quant, u)
        else:
            self._score_jit = jax.jit(
                lambda p, u: self.model.score_all(p, u)
            )
        self._predict_ctr_jit = None

    @classmethod
    def from_checkpoint(cls, config, checkpoint_dir: str | None = None) -> "Recommender":
        """Cold-start serving from disk: rebuild the model (and its
        dataset-derived attachments — histories, graphs, sequences)
        from the config, restore the LATEST checkpoint, and serve. No
        training step runs; this is the deploy path when the training
        job is gone. Raises if no checkpoint exists — silently serving
        fresh random tables would be a production incident."""
        import dataclasses

        from tfrec_tpu.train.trainer import Trainer

        ckpt = checkpoint_dir or config.train.checkpoint_dir
        if not ckpt:
            raise ValueError("from_checkpoint needs a checkpoint_dir")
        cfg = dataclasses.replace(
            config,
            train=dataclasses.replace(
                config.train, resume=True, checkpoint_dir=ckpt
            ),
        )
        trainer = Trainer(cfg, quiet=True, log_metrics=False)
        if trainer.start_epoch == 0:
            raise ValueError(f"no checkpoint found under {ckpt!r}")
        return cls.from_trainer(trainer)

    @classmethod
    def from_trainer(cls, trainer) -> "Recommender":
        if trainer.mesh is not None:
            # Serve from the live sharded state: params view keeps the
            # PADDED tables (real ids never touch pad rows; catalog scores
            # are sliced to num_items) so nothing is re-replicated.
            tables = {"tables": trainer.state["tables"],
                      "dense": trainer.state["dense"]}
            if trainer._row_permute_active():
                # mesh.row_permute stores tables in a PHYSICAL row order;
                # the serve gathers below use LOGICAL ids, so hand them
                # the logical views (one-time de-permuting gather; the
                # sharded top-k `state` path is unreachable here — permute
                # is refused for retrieval models at builder construction).
                tables = {
                    "tables": trainer.builder.unpadded_tables(trainer.state),
                    "dense": trainer.state["dense"],
                }
            return cls(
                trainer.model, tables,
                dataset=trainer.dataset, mesh=trainer.mesh, state=trainer.state,
            )
        return cls(trainer.model, trainer.params, dataset=trainer.dataset)

    # ---- pointwise scoring ----

    def _predict_impl(self, params, user_ids, item_ids, extras):
        batch = {
            "user": user_ids,
            "item": item_ids,
            "label": jnp.zeros(user_ids.shape[0], jnp.float32),
            **extras,
        }
        ids = self.model.lookup_ids(batch)
        gathered = {
            k: jnp.take(params["tables"][k], v, axis=0, mode="clip")
            for k, v in ids.items()
        }
        return self.model.forward(params["dense"], gathered, batch)

    def predict(self, user_ids, item_ids) -> np.ndarray:
        """Scores for (user, item) pairs — the reference predict() surface."""
        u = jnp.asarray(np.asarray(user_ids, np.int32))
        i = jnp.asarray(np.asarray(item_ids, np.int32))
        # History-carrying models (the sequential family) provide their
        # per-user rows as jit ARGUMENTS — a closure over the [U, L]
        # matrix would be baked into the executable as a constant (the
        # same rule the quantized table follows above) and would go stale
        # if history were re-attached.
        extras = getattr(self.model, "pointwise_batch_extras", lambda _u: {})(u)
        return np.asarray(self._predict_jit(self.params, u, i, extras))

    def predict_ctr(self, dense, cat) -> np.ndarray:
        """CTR logits for feature-interaction models: dense [N, Dd] f32
        (may have 0 columns), cat [N, sum(widths)] int32."""
        if self._predict_ctr_jit is None:

            def impl(params, dense_f, cat_f):
                batch = {
                    "dense": dense_f,
                    "cat": cat_f,
                    "label": jnp.zeros(cat_f.shape[0], jnp.float32),
                }
                ids = self.model.lookup_ids(batch)
                gathered = {
                    k: jnp.take(params["tables"][k], v, axis=0, mode="clip")
                    for k, v in ids.items()
                }
                return self.model.forward(params["dense"], gathered, batch)

            self._predict_ctr_jit = jax.jit(impl)
        return np.asarray(
            self._predict_ctr_jit(
                self.params,
                jnp.asarray(np.asarray(dense, np.float32)),
                jnp.asarray(np.asarray(cat, np.int32)),
            )
        )

    # ---- catalog scoring / top-k ----

    def _num_items(self) -> int:
        if self.dataset is not None:
            return self.dataset.num_items
        return self.model.data_spec.num_items

    def score_catalog(self, user_ids) -> np.ndarray:
        u = jnp.asarray(np.asarray(user_ids, np.int32))
        # Slice off vocab-padding columns (sharded tables pad V up to the
        # mesh size; pad rows are zero-init and must never surface).
        return np.asarray(self._score_jit(self.params, u))[:, : self._num_items()]

    def _train_exclusions(self, user_ids):
        if self.dataset is None:
            return None, None
        if self._train_padded is None:
            self._train_padded = padded_positives(self.dataset.train_csr)
        padded, counts = self._train_padded
        return padded[user_ids], counts[user_ids]

    def recommend(
        self, user_ids, k: int, exclude_train: bool = True
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k item ids + scores per user, optionally excluding each
        user's train items (requires a dataset). On a mesh with a
        dot-product scorer this runs the distributed per-shard-topk +
        all_gather merge on the live shards."""
        u_np = np.asarray(user_ids, np.int32)
        exc_p = exc_c = None
        if exclude_train:
            exc_p, exc_c = self._train_exclusions(u_np)
        if (
            self._state is not None
            and self.mesh is not None
            and self._quant is None
            and self.model.dot_decomposition() is not None
        ):
            return self._recommend_sharded(u_np, k, exc_p, exc_c)
        scores = self._score_jit(self.params, jnp.asarray(u_np))
        scores = scores[:, : self._num_items()]
        vals, ids = topk_scores(
            scores, k,
            None if exc_p is None else jnp.asarray(exc_p),
            None if exc_c is None else jnp.asarray(exc_c),
            method=self.topk_method, recall_target=self.recall_target,
        )
        return np.asarray(ids), np.asarray(vals)

    def _recommend_sharded(self, u_np, k: int, exc_p, exc_c):
        from tfrec_tpu.parallel.eval import sharded_row_gather
        from tfrec_tpu.parallel.topk import sharded_topk_dot

        spec = self.model.dot_decomposition()
        num_items = self._num_items()
        mesh = self.mesh
        if k not in self._sharded_jit:

            def fn(state, users, ep, ec):
                tables = state["tables"]
                u = sharded_row_gather(mesh, tables[spec.user_table], users)
                q = spec.user_vecs(state["dense"], u)
                bias = (
                    tables[spec.bias_table][:, 0]
                    if spec.bias_table is not None else None
                )
                return sharded_topk_dot(
                    mesh, q, tables[spec.item_table], k, num_items,
                    item_bias=bias, exclude_padded=ep, exclude_counts=ec,
                    method=self.topk_method,
                    recall_target=self.recall_target,
                )

            self._sharded_jit[k] = jax.jit(fn, static_argnums=())
        no_exc = exc_p is None
        if no_exc:  # sentinel row: exclude nothing
            exc_p = np.full((len(u_np), 1), num_items, np.int32)
            exc_c = np.zeros((len(u_np),), np.int32)
        vals, ids = self._sharded_jit[k](
            self._state, jnp.asarray(u_np),
            jnp.asarray(exc_p), jnp.asarray(np.asarray(exc_c, np.int32)),
        )
        return np.asarray(ids), np.asarray(vals)
