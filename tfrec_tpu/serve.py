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
    def __init__(self, model, params, dataset=None, mesh=None, quantize=False):
        """``quantize=True`` stores the MF item table as rowwise-scaled
        int8 (top-k order exact up to rounding). MF only — other scorers
        (GMF's h-weighting, MLP towers) are not plain dot products, so a
        quantized matmul would silently change their scores. The int8
        table is passed to the jitted scorer as an ARGUMENT (closure
        constants get baked into the compile payload); the 4x memory win
        applies when the caller drops the f32 params after export.
        """
        self.model = model
        self.params = params
        self.dataset = dataset
        self.mesh = mesh
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
    def from_trainer(cls, trainer) -> "Recommender":
        return cls(
            trainer.model, trainer.params, dataset=trainer.dataset,
            mesh=trainer.mesh,
        )

    # ---- pointwise scoring ----

    def _predict_impl(self, params, user_ids, item_ids):
        batch = {
            "user": user_ids,
            "item": item_ids,
            "label": jnp.zeros(user_ids.shape[0], jnp.float32),
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
        return np.asarray(self._predict_jit(self.params, u, i))

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

    def score_catalog(self, user_ids) -> np.ndarray:
        u = jnp.asarray(np.asarray(user_ids, np.int32))
        return np.asarray(self._score_jit(self.params, u))

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
        user's train items (requires a dataset)."""
        u_np = np.asarray(user_ids, np.int32)
        scores = self._score_jit(self.params, jnp.asarray(u_np))
        exc_p = exc_c = None
        if exclude_train:
            exc_p, exc_c = self._train_exclusions(u_np)
        vals, ids = topk_scores(
            scores, k,
            None if exc_p is None else jnp.asarray(exc_p),
            None if exc_c is None else jnp.asarray(exc_c),
        )
        return np.asarray(ids), np.asarray(vals)
