"""WRMF — weighted regularized matrix factorization for implicit
feedback (Hu/Koren/Volinsky 2008), the reference family's classic
non-neural, non-SGD recommender (SURVEY.md §2a family long tail).

Scoring is plain MF (dot product, no biases — the closed-form solve has
no bias term). Training is NOT the generic SGD step: ``trains_by_als``
routes the Trainer to the batched closed-form solver in
``train/als.py`` (one [D,D] Gram matmul + [B,D,D] ridge solves per
sweep — the TPU-native form of the reference family's per-user ALS
loops). ``forward`` therefore only serves eval/serving paths.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tfrec_tpu.models.base import DataSpec, DotRetrieval, RecModel
from tfrec_tpu.ops.embedding import TableSpec

class WRMF(RecModel):
    # Closed-form training hook (train/trainer.py): no SGD step exists
    # for this model; the Trainer calls make_solver and drives epochs
    # through it. solver_loss_name is the coerced train.loss label.
    solver_loss_name = "wrmf"

    def __init__(self, data_spec: DataSpec, embed_dim: int,
                 alpha: float = 10.0, reg: float = 0.05):
        assert data_spec.kind == "interaction"
        self.data_spec = data_spec
        self.embed_dim = embed_dim
        self.alpha = alpha
        self.reg = reg

    def make_solver(self, dataset, *, batch: int, seed: int, mesh=None):
        from tfrec_tpu.train.als import ALSTrainer

        return ALSTrainer(dataset, self.embed_dim, alpha=self.alpha,
                          reg=self.reg, batch=batch, seed=seed, mesh=mesh)

    def table_specs(self) -> Tuple[TableSpec, ...]:
        u, v, d = self.data_spec.num_users, self.data_spec.num_items, self.embed_dim
        return (TableSpec("user_emb", u, d), TableSpec("item_emb", v, d))

    def init_dense(self, rng: jax.Array):
        return {}

    def lookup_ids(self, batch) -> Dict[str, jnp.ndarray]:
        items = self.pair_item_ids(batch) if self.is_pairwise(batch) else batch["item"]
        return {"user_emb": batch["user"], "item_emb": items}

    def forward(self, dense, gathered, batch, *, rng=None) -> jnp.ndarray:
        u, i = gathered["user_emb"], gathered["item_emb"]
        if self.is_pairwise(batch) and "neg" in batch:
            bsz = u.shape[0]
            return jnp.sum(u * i[:bsz], -1) - jnp.sum(u * i[bsz:], -1)
        return jnp.sum(u * i, axis=-1)

    def dot_decomposition(self) -> DotRetrieval:
        return DotRetrieval("user_emb", "item_emb", None)

    def score_all(self, params, user_ids: jnp.ndarray) -> jnp.ndarray:
        t = params["tables"]
        u = jnp.take(t["user_emb"], user_ids, axis=0)
        return jnp.dot(u, t["item_emb"].T, preferred_element_type=jnp.float32)
